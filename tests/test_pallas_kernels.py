"""Pallas fused bond kernel vs the einsum reference (interpret mode on CPU;
the compiled path is exercised on real TPU by the bench)."""

import numpy as np
import jax.numpy as jnp

from optimalcontrolmps_tpu.ops.pallas_kernels import (
    fused_bond_theta, fused_bond_theta_reference)


def test_fused_bond_theta_interpret():
    rng = np.random.default_rng(0)
    B, chi, p = 4, 16, 5
    mk = lambda *s: jnp.asarray(
        (rng.standard_normal(s) + 1j * rng.standard_normal(s))
        .astype(np.complex64))
    Ai, Aj = mk(B, chi, p, chi), mk(B, chi, p, chi)
    G = mk(p * p, p * p)
    out = fused_bond_theta(Ai, Aj, G, interpret=True)
    ref = fused_bond_theta_reference(Ai, Aj, G)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) / scale < 1e-5
