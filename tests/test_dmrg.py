"""JAX DMRG (at-scale InitializeState rebuild) vs exact sector
diagonalization."""

import numpy as np
import jax.numpy as jnp

from optimalcontrolmps_tpu import dmrg, groundstate, mps
from optimalcontrolmps_tpu.sites import op


def test_dmrg_matches_exact_small():
    L, d, npart = 5, 4, 5
    E0 = np.linalg.eigvalsh(
        groundstate.sector_hamiltonian(L, d, npart, 1.0, 2.5))[0]
    A, e = dmrg.dmrg_ground_state(L, d, npart, 1.0, 2.5, chi=25, n_sweeps=5)
    assert abs(float(e) - E0) < 1e-9
    vec = groundstate.ground_statevector(L, d, npart, 1.0, 2.5)
    ov = abs(np.vdot(np.asarray(mps.to_statevector(A)), vec))
    assert abs(ov - 1.0) < 1e-8


def test_dmrg_conserves_particle_number():
    """Without the (N-npart)^2 penalty the dense (non-QN) DMRG can drift to
    a neighboring sector; with it the particle number must hold exactly."""
    L, d, npart = 6, 3, 6
    A, e = dmrg.dmrg_ground_state(L, d, npart, 1.0, 3.0, chi=20, n_sweeps=5)
    ntot = float(jnp.sum(mps.expectation_values(A, op("N", d))).real)
    assert abs(ntot - npart) < 1e-6
    assert abs(float(mps.norm(A)) - 1.0) < 1e-9
    # chi=20 truncates (exact middle-bond rank is 64), so the variational
    # energy sits a few 1e-8 above exact — assert from above only
    E0 = np.linalg.eigvalsh(
        groundstate.sector_hamiltonian(L, d, npart, 1.0, 3.0))[0]
    assert E0 - 1e-10 <= float(e) < E0 + 1e-6
