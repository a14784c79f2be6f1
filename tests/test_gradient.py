"""Analytic-gradient tests, ported from the reference's GradientTests
(/root/reference/tests/GradientTests.cpp): numeric central difference vs the
adjoint gradient for all 4 modes {GRAPE, GROUP} x {exact, BFGS(lowmem)}, on
randomized controls, endpoints excluded (loops 1..size-2 in the reference).
Reference tolerance: 0.1-0.2% relative on the fidelity part
(GradientTests.cpp:143,208); we hold the same.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from optimalcontrolmps_tpu import groundstate, tebd
from optimalcontrolmps_tpu import control as controllib
from optimalcontrolmps_tpu import seeds
from optimalcontrolmps_tpu.problem import OptimalControlProblem

L, NPART, D = 5, 5, 5
J, CSTART, CEND = 1.0, 2.0, 50.0
T, TSTEP = 0.1, 1e-2
N = int(T / TSTEP + 1)
M = 5
CHI = 40
EPS = 1e-5


@pytest.fixture(scope="module")
def pieces():
    st = tebd.make_stepper(L, D, J, TSTEP, CHI)
    psi_i = groundstate.initialize_state(L, D, NPART, J, CSTART, CHI)
    psi_f = groundstate.initialize_state(L, D, NPART, J, CEND, CHI)
    u0 = seeds.linspace(CSTART, CEND, N)
    basis = controllib.chopped_sine_basis(u0, TSTEP, T, M)
    return st, psi_i, psi_f, basis


def central_diff(f, x, eps=EPS):
    g = np.zeros(len(x))
    for k in range(len(x)):
        xp = x.at[k].add(eps)
        xm = x.at[k].add(-eps)
        g[k] = (float(f(xp)) - float(f(xm))) / (2 * eps)
    return g


def check_interior(analytic, numeric, rtol):
    a = np.asarray(analytic)[1:-1]
    nn = np.asarray(numeric)[1:-1]
    denom = np.maximum(np.abs(nn), 1e-10)
    assert (np.abs(a - nn) / denom).max() < rtol, (a, nn)


@pytest.mark.parametrize("bfgs", [False, True])
def test_grape_gradient(pieces, bfgs):
    """GradientTests.cpp:131-180 (GRAPE, both BFGS settings)."""
    st, psi_i, psi_f, _ = pieces
    rng = np.random.default_rng(7)
    u = jnp.asarray(seeds.linspace(CSTART, CEND, N)
                    + rng.uniform(-0.5, 0.5, N))
    oc = OptimalControlProblem(psi_f, psi_i, st, n_steps=N, gamma=0.0,
                               bfgs=bfgs)
    g = oc.get_analytic_gradient(u)
    gn = central_diff(oc.get_cost, u)
    check_interior(g, gn, 2e-3)


@pytest.mark.parametrize("bfgs", [False, True])
def test_group_gradient(pieces, bfgs):
    """GradientTests.cpp:183-258 (GROUP, both BFGS settings)."""
    st, psi_i, psi_f, basis = pieces
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.uniform(-1.0, 1.0, M))
    oc = OptimalControlProblem(psi_f, psi_i, st, basis=basis, gamma=0.0,
                               bfgs=bfgs)
    g = oc.get_analytic_gradient(c)
    gn = central_diff(oc.get_cost, c)
    # all M coefficients are interior (endpoints only exist in u-space)
    denom = np.maximum(np.abs(gn), 1e-10)
    assert (np.abs(np.asarray(g) - gn) / denom).max() < 2e-3


def test_gradient_with_regularization(pieces):
    """Regularization gradient isolated at tight tolerance
    (GradientTests.cpp:131-180 with gamma=1, tol 1e-5)."""
    st, psi_i, psi_f, _ = pieces
    rng = np.random.default_rng(11)
    u = jnp.asarray(seeds.linspace(CSTART, CEND, N)
                    + rng.uniform(-0.5, 0.5, N))
    oc0 = OptimalControlProblem(psi_f, psi_i, st, n_steps=N, gamma=0.0)
    oc1 = OptimalControlProblem(psi_f, psi_i, st, n_steps=N, gamma=1.0)
    greg = np.asarray(oc1.get_analytic_gradient(u)) \
        - np.asarray(oc0.get_analytic_gradient(u))
    gnum = central_diff(oc1.get_cost, u) - central_diff(oc0.get_cost, u)
    np.testing.assert_allclose(greg[1:-1], gnum[1:-1], rtol=1e-4, atol=1e-5)


def test_bfgs_matches_exact(pieces):
    """Both gradient paths must agree to near machine precision (the
    reference's seq-vs-parallel determinism check at 1e-11,
    GradientTests.cpp:261-285, recast for the two sweep structures)."""
    st, psi_i, psi_f, basis = pieces
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.uniform(-1.0, 1.0, M))
    oc_e = OptimalControlProblem(psi_f, psi_i, st, basis=basis, bfgs=False)
    oc_b = OptimalControlProblem(psi_f, psi_i, st, basis=basis, bfgs=True)
    ge = np.asarray(oc_e.get_analytic_gradient(c))
    gb = np.asarray(oc_b.get_analytic_gradient(c))
    np.testing.assert_allclose(ge, gb, atol=1e-11)


def test_batched_matches_single(pieces):
    """vmap over a batch of controls == one-at-a-time (determinism across
    the batching dimension — the TPU analogue of thread-count invariance)."""
    st, psi_i, psi_f, _ = pieces
    from optimalcontrolmps_tpu import engine
    rng = np.random.default_rng(9)
    us = jnp.asarray(rng.uniform(2.0, 50.0, (4, N)))
    batched = jax.vmap(lambda u: engine.cost_and_gradient(
        st, psi_i, psi_f, u, 0.0))
    Jb, gb = batched(us)
    for k in range(4):
        Jk, gk = engine.cost_and_gradient(st, psi_i, psi_f, us[k], 0.0)
        np.testing.assert_allclose(float(Jk), float(Jb[k]), atol=1e-11)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gb)[k],
                                   atol=1e-11)
