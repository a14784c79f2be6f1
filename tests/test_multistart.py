"""Multistart batch-solve tests (parallel/multistart.py).

The scale-out claim worth testing (VERDICT r2 #5): a bigger multistart
batch can only improve best-of-batch quality when its seed set contains
the smaller batch's seeds — and the batched solver must actually realize
that on nested seed sets (prefix property), including across the engine
dispatch (sector vs MPS).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optimalcontrolmps_tpu import control, sector, seeds
from optimalcontrolmps_tpu.parallel.multistart import multistart_lbfgs


@pytest.fixture(scope="module")
def flagship_small():
    T, dt, M, L, d, npart = 0.5, 0.01, 8, 5, 4, 5
    N = int(round(T / dt)) + 1
    st = sector.make_sector_stepper(L, d, npart, 1.0, dt)
    psi_i = sector.sector_ground_state(L, d, npart, 1.0, 2.5)
    psi_f = sector.sector_ground_state(L, d, npart, 1.0, 50.0)
    rng = np.random.default_rng(123456789)
    u0 = seeds.linsigmoid_seed(2.5, 50.0, N, rng=rng)
    basis = control.chopped_sine_basis(u0, dt, T, M)
    return st, psi_i, psi_f, basis


def _seed_batch(B, M, scale=0.3):
    rng = np.random.default_rng(7)
    return rng.uniform(-scale, scale, size=(B, M))


def test_best_of_batch_monotone_on_nested_seeds(flagship_small):
    """best-of-64 <= best-of-8 when the 8 seeds are a prefix of the 64
    (the single-chip version of the 4096-vs-8 BASELINE property)."""
    st, psi_i, psi_f, basis = flagship_small
    cs = _seed_batch(64, basis.M)
    r_small = multistart_lbfgs(st, psi_i, psi_f, basis, cs[:8],
                               gamma=1e-6, max_iter=40, tol=1e-6,
                               exact=True)
    r_big = multistart_lbfgs(st, psi_i, psi_f, basis, cs,
                             gamma=1e-6, max_iter=40, tol=1e-6,
                             exact=True)
    assert float(r_big.best_cost) <= float(r_small.best_cost) + 1e-12
    # per-seed results must match between the two runs on the shared
    # prefix (lockstep batching must not couple seeds)
    np.testing.assert_allclose(np.asarray(r_big.all_costs[:8]),
                               np.asarray(r_small.all_costs), rtol=1e-6)


def test_multistart_improves_over_zero_seed(flagship_small):
    st, psi_i, psi_f, basis = flagship_small
    res = multistart_lbfgs(st, psi_i, psi_f, basis,
                           _seed_batch(8, basis.M), gamma=1e-6,
                           max_iter=40, tol=1e-6, exact=True)
    J0 = float(sector.cost(st, psi_i, psi_f,
                           basis.convert_control(jnp.zeros(basis.M)), 1e-6))
    assert float(res.best_cost) < J0
    assert np.isfinite(np.asarray(res.all_costs)).all()
