"""Exact-Hessian tests, ported from the reference's HessianTests
(/root/reference/tests/HessianTests.cpp): numeric differentiation of the
analytic gradient vs the analytic Hessian, GRAPE and GROUP. The reference
checks the interior GRAPE block at 5e-3 relative (HessianTests.cpp:178-184)
and isolates the regularization Hessian by subtraction (197-205).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from optimalcontrolmps_tpu import groundstate, tebd, engine
from optimalcontrolmps_tpu import control as controllib
from optimalcontrolmps_tpu import seeds
from optimalcontrolmps_tpu.problem import OptimalControlProblem

L, NPART, D = 5, 5, 5
J, CSTART, CEND = 1.0, 2.0, 50.0
T, TSTEP = 0.1, 1e-2
N = int(T / TSTEP + 1)
M = 5
CHI = 40


@pytest.fixture(scope="module")
def pieces():
    # trunc_method="svd": the default eigh/denmat truncation squares the
    # condition of tiny Schmidt values (error ~sqrt(eps) ~ 1e-8 absolute),
    # which is invisible in cost/gradient but shows against an FD check of
    # the *second* derivative at these near-converged magnitudes (~4e-6).
    # ITensor's denmatDecomp has the same property — the reference masks it
    # with a noisier eps=1e-3 forward-difference-of-cost check and a
    # documented "~4 entries may fail" caveat (README.md:21).
    st = tebd.make_stepper(L, D, J, TSTEP, CHI, trunc_method="svd")
    psi_i = groundstate.initialize_state(L, D, NPART, J, CSTART, CHI)
    psi_f = groundstate.initialize_state(L, D, NPART, J, CEND, CHI)
    u0 = seeds.linspace(CSTART, CEND, N)
    basis = controllib.chopped_sine_basis(u0, TSTEP, T, M)
    return st, psi_i, psi_f, basis


def test_eigh_and_svd_truncation_agree(pieces):
    """The fast eigh/denmat path must agree with the SVD path to the
    sqrt(eps) level that its squared conditioning implies."""
    _, psi_i, psi_f, _ = pieces
    st_e = tebd.make_stepper(L, D, J, TSTEP, CHI, trunc_method="eigh")
    u = jnp.asarray(seeds.linspace(CSTART, CEND, N))
    oc = OptimalControlProblem(psi_f, psi_i, st_e, n_steps=N, gamma=0.0)
    st_s = tebd.make_stepper(L, D, J, TSTEP, CHI, trunc_method="svd")
    oc_s = OptimalControlProblem(psi_f, psi_i, st_s, n_steps=N, gamma=0.0)
    np.testing.assert_allclose(float(oc.get_cost(u)), float(oc_s.get_cost(u)),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(oc.get_hessian(u)),
                               np.asarray(oc_s.get_hessian(u)), atol=1e-6)


def numeric_hessian_from_grad(grad_fn, x, eps=1e-5):
    """Central difference of the analytic gradient (more accurate than the
    reference's forward difference of the cost at eps=1e-3)."""
    n = len(x)
    H = np.zeros((n, n))
    for k in range(n):
        gp = np.asarray(grad_fn(x.at[k].add(eps)))
        gm = np.asarray(grad_fn(x.at[k].add(-eps)))
        H[:, k] = (gp - gm) / (2 * eps)
    return H


def test_grape_hessian(pieces):
    """HessianTests.cpp:165-205 (GRAPE interior block)."""
    st, psi_i, psi_f, _ = pieces
    rng = np.random.default_rng(2)
    u = jnp.asarray(seeds.linspace(CSTART, CEND, N)
                    + rng.uniform(-0.5, 0.5, N))
    oc = OptimalControlProblem(psi_f, psi_i, st, n_steps=N, gamma=0.0)
    H = np.asarray(oc.get_hessian(u))
    Hn = numeric_hessian_from_grad(oc.get_analytic_gradient, u)
    # symmetric
    np.testing.assert_allclose(H, H.T, atol=1e-12)
    # interior block (reference excludes the fixed-endpoint edges)
    a, b = H[1:-1, 1:-1], Hn[1:-1, 1:-1]
    scale = np.abs(b).max()
    assert np.abs(a - b).max() / scale < 5e-3, np.abs(a - b).max() / scale
    # edges must be exactly zero for gamma=0 (OptimalControl.cpp:267,341)
    assert np.abs(H[0, :]).max() == 0.0 and np.abs(H[-1, :]).max() == 0.0


def test_group_hessian(pieces):
    """HessianTests.cpp:208-250 (GROUP congruence H_c = B^T H_u B)."""
    st, psi_i, psi_f, basis = pieces
    rng = np.random.default_rng(4)
    c = jnp.asarray(rng.uniform(-0.5, 0.5, M))
    oc = OptimalControlProblem(psi_f, psi_i, st, basis=basis, gamma=0.0)
    H = np.asarray(oc.get_hessian(c))
    Hn = numeric_hessian_from_grad(oc.get_analytic_gradient, c)
    np.testing.assert_allclose(H, H.T, atol=1e-12)
    scale = np.abs(Hn).max()
    assert np.abs(H - Hn).max() / scale < 5e-3, np.abs(H - Hn).max() / scale


def test_regularization_hessian(pieces):
    """Isolated by subtraction at 1e-5 (HessianTests.cpp:197-205)."""
    st, psi_i, psi_f, _ = pieces
    u = jnp.asarray(seeds.linspace(CSTART, CEND, N))
    oc0 = OptimalControlProblem(psi_f, psi_i, st, n_steps=N, gamma=0.0)
    oc1 = OptimalControlProblem(psi_f, psi_i, st, n_steps=N, gamma=1.0)
    Hreg = np.asarray(oc1.get_hessian(u)) - np.asarray(oc0.get_hessian(u))
    want = np.asarray(engine.regularization_hessian(N, 1.0, TSTEP))
    np.testing.assert_allclose(Hreg, want, atol=1e-5)


def test_hessian_reuses_gradient_aux(pieces):
    """hessian(aux=...) from a gradient call must equal a cold hessian —
    the reference's memoization protocol (SequencingTest) as an identity."""
    st, psi_i, psi_f, _ = pieces
    u = jnp.asarray(seeds.linspace(CSTART, CEND, N))
    _, aux = engine.gradient(st, psi_i, psi_f, u, 0.0)
    H1 = np.asarray(engine.hessian(st, psi_i, psi_f, u, 0.0, aux=aux))
    H2 = np.asarray(engine.hessian(st, psi_i, psi_f, u, 0.0))
    np.testing.assert_allclose(H1, H2, atol=1e-12)
