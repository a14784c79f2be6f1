"""Pallas TPU kernels for the TEBD hot path.

The bond update is a chain of small matmuls (two-site contraction -> gate
application -> density matrix) on (chi*p, chi*p)-sized intermediates that
all fit comfortably in VMEM. XLA already fuses much of this; the Pallas
versions exist to (a) keep the whole chain resident in VMEM across a batch
grid with zero HBM round-trips for intermediates, and (b) control the MXU
shapes directly. They are opt-in (tebd stepper flag / direct call) and are
validated against the einsum path in interpret mode; complex arithmetic is
expanded to real/imaginary pairs because Mosaic has no complex dtypes.

Layout per grid step (one batch element):
    Ai (chi, p, chi), Aj (chi, p, chi) complex -> 4 real refs
    theta[l, P, Q, r] = sum_pq G[PQ, pq] (sum_m Ai[l,p,m] Aj[m,q,r])
returned as a (chi*p, p*chi) complex matrix ready for truncation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_bond_theta", "fused_bond_theta_reference"]


def _kernel(air, aii, ajr, aji, gr, gi, outr, outi):
    chi, p, _ = air.shape[1], air.shape[2], air.shape[3]
    b = 0  # block is one batch element

    m1r = air[b].reshape(chi * p, chi)
    m1i = aii[b].reshape(chi * p, chi)
    m2r = ajr[b].reshape(chi, p * chi)
    m2i = aji[b].reshape(chi, p * chi)

    # T = M1 @ M2 (complex via 4 real matmuls)
    tr = (jnp.dot(m1r, m2r, preferred_element_type=jnp.float32)
          - jnp.dot(m1i, m2i, preferred_element_type=jnp.float32))
    ti = (jnp.dot(m1r, m2i, preferred_element_type=jnp.float32)
          + jnp.dot(m1i, m2r, preferred_element_type=jnp.float32))

    # regroup (l p, q r) -> (p q, l r) to apply the gate on the middle axes
    tr4 = tr.reshape(chi, p, p, chi).transpose(1, 2, 0, 3).reshape(
        p * p, chi * chi)
    ti4 = ti.reshape(chi, p, p, chi).transpose(1, 2, 0, 3).reshape(
        p * p, chi * chi)

    sr = (jnp.dot(gr[0], tr4, preferred_element_type=jnp.float32)
          - jnp.dot(gi[0], ti4, preferred_element_type=jnp.float32))
    si = (jnp.dot(gr[0], ti4, preferred_element_type=jnp.float32)
          + jnp.dot(gi[0], tr4, preferred_element_type=jnp.float32))

    # back to (l P, Q r)
    outr[b] = sr.reshape(p, p, chi, chi).transpose(2, 0, 1, 3).reshape(
        chi * p, p * chi)
    outi[b] = si.reshape(p, p, chi, chi).transpose(2, 0, 1, 3).reshape(
        chi * p, p * chi)


def fused_bond_theta(Ai, Aj, gate, interpret: bool = False):
    """Batched fused theta: Ai, Aj (B, chi, p, chi) complex, gate (p^2, p^2)
    complex -> (B, chi*p, p*chi) complex."""
    B, chi, p, _ = Ai.shape
    real = jnp.float32 if Ai.dtype == jnp.complex64 else jnp.float64

    args = [Ai.real.astype(real), Ai.imag.astype(real),
            Aj.real.astype(real), Aj.imag.astype(real),
            gate.real.astype(real)[None], gate.imag.astype(real)[None]]

    mspace = pl.ANY if interpret else pltpu.VMEM

    def bspec(shape):
        # per-batch block
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                            memory_space=mspace)

    def cspec(shape):
        # broadcast (gate) block — same for every grid step
        return pl.BlockSpec((1,) + shape, lambda b: (0,) * (1 + len(shape)),
                            memory_space=mspace)

    out_shape = (chi * p, p * chi)
    res_r, res_i = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[bspec((chi, p, chi)), bspec((chi, p, chi)),
                  bspec((chi, p, chi)), bspec((chi, p, chi)),
                  cspec((p * p, p * p)), cspec((p * p, p * p))],
        out_specs=(bspec(out_shape), bspec(out_shape)),
        out_shape=(jax.ShapeDtypeStruct((B,) + out_shape, real),
                   jax.ShapeDtypeStruct((B,) + out_shape, real)),
        interpret=interpret,
    )(*args)
    return (res_r + 1j * res_i).astype(Ai.dtype)


def fused_bond_theta_reference(Ai, Aj, gate):
    """einsum reference for validation."""
    theta = jnp.einsum('bapc,bcqd->bapqd', Ai, Aj)
    B, chi, p, q, _ = theta.shape
    theta = jnp.einsum('PQ,baQc->baPc', gate,
                       theta.reshape(B, chi, p * q, chi))
    return theta.reshape(B, chi * p, q * chi)
