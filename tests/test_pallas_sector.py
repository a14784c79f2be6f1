"""Tests for the fused Pallas sector chain (ops/pallas_sector.py).

Three layers of validation, all on the CPU backend:
  1. the scan reference implementation reproduces sector.rollout_final
     exactly (same merged-phase algebra);
  2. the custom-vjp gradient (reversible backward) matches jax.grad
     through sector.cost — the exact gradient the solve relies on;
  3. the Pallas kernels themselves (forced via OCMPS_PALLAS=1, interpret
     mode on CPU) match the scan implementation for fwd and bwd.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optimalcontrolmps_tpu import control, sector, seeds
from optimalcontrolmps_tpu.engine import regularization
from optimalcontrolmps_tpu.ops import pallas_sector as ps

T, DT, M, L, D, NPART, GAMMA = 0.5, 0.01, 8, 5, 4, 5, 1e-6


@pytest.fixture(scope="module")
def prob():
    N = int(round(T / DT)) + 1
    st = sector.make_sector_stepper(L, D, NPART, 1.0, DT,
                                    dtype=jnp.complex64)
    psi_i = sector.sector_ground_state(L, D, NPART, 1.0, 2.5,
                                       dtype=np.complex64)
    psi_f = sector.sector_ground_state(L, D, NPART, 1.0, 50.0,
                                       dtype=np.complex64)
    rng = np.random.default_rng(5)
    u_bt = np.asarray(
        [seeds.adiabatic_seed(2.5, 50.0, N) + rng.normal(0, 0.3, N)
         for _ in range(4)], dtype=np.float32)
    return st, psi_i, psi_f, u_bt


def test_chain_matches_sector_rollout(prob):
    st, psi_i, psi_f, u_bt = prob
    os.environ["OCMPS_PALLAS"] = "0"
    try:
        psiT = np.asarray(ps.chain_final(st, u_bt, psi_i))
    finally:
        del os.environ["OCMPS_PALLAS"]
    for b in range(u_bt.shape[0]):
        ref = np.asarray(sector.rollout_final(st, psi_i, u_bt[b]))
        np.testing.assert_allclose(psiT[b], ref, atol=2e-5)


def test_chain_gradient_matches_autodiff(prob):
    st, psi_i, psi_f, u_bt = prob
    os.environ["OCMPS_PALLAS"] = "0"

    def batched_cost(u_bt):
        psiT = ps.chain_final(st, u_bt, psi_i)
        ov = psiT @ jnp.asarray(np.conj(psi_f))
        fid = (ov * ov.conj()).real
        reg = jax.vmap(lambda u: regularization(u, GAMMA, st.dt))(u_bt)
        return jnp.sum(0.5 * (1.0 - fid) + reg)

    try:
        g = np.asarray(jax.grad(batched_cost)(jnp.asarray(u_bt)))
    finally:
        del os.environ["OCMPS_PALLAS"]

    for b in range(2):
        g_ref = np.asarray(jax.grad(
            lambda u: sector.cost(st, psi_i, psi_f, u, GAMMA))(
                jnp.asarray(u_bt[b])))
        scale = np.max(np.abs(g_ref))
        np.testing.assert_allclose(g[b], g_ref, atol=3e-5 * max(scale, 1.0))


@pytest.mark.slow
def test_pallas_kernels_match_scan_interpret(prob):
    st, psi_i, psi_f, u_bt = prob
    os.environ["OCMPS_PALLAS"] = "0"
    try:
        ref = np.asarray(ps.chain_final(st, u_bt, psi_i))
    finally:
        del os.environ["OCMPS_PALLAS"]
    os.environ["OCMPS_PALLAS"] = "1"  # interpret mode on CPU
    try:
        out = np.asarray(ps.chain_final(st, u_bt, psi_i))
    finally:
        del os.environ["OCMPS_PALLAS"]
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_pallas_bwd_matches_scan_interpret(prob):
    st, psi_i, psi_f, u_bt = prob

    def batched_cost(u_bt):
        psiT = ps.chain_final(st, u_bt, psi_i)
        ov = psiT @ jnp.asarray(np.conj(psi_f))
        return jnp.sum(0.5 * (1.0 - (ov * ov.conj()).real))

    os.environ["OCMPS_PALLAS"] = "0"
    try:
        g_ref = np.asarray(jax.grad(batched_cost)(jnp.asarray(u_bt)))
    finally:
        del os.environ["OCMPS_PALLAS"]
    os.environ["OCMPS_PALLAS"] = "1"
    try:
        g = np.asarray(jax.grad(batched_cost)(jnp.asarray(u_bt)))
    finally:
        del os.environ["OCMPS_PALLAS"]
    scale = np.max(np.abs(g_ref))
    np.testing.assert_allclose(g, g_ref, atol=3e-5 * max(scale, 1.0))


def test_batched_lbfgs_matches_vmapped(prob):
    """minimize_lbfgs_batch must reproduce vmap(minimize_lbfgs) on the
    same (non-Pallas) objective — lockstep semantics by hand."""
    from optimalcontrolmps_tpu.optimize.lbfgs import (minimize_lbfgs,
                                                      minimize_lbfgs_batch)
    st, psi_i, psi_f, _ = prob
    N = int(round(T / DT)) + 1
    rng = np.random.default_rng(11)
    u0 = seeds.linsigmoid_seed(2.5, 50.0, N, rng=np.random.default_rng(1))
    basis = control.chopped_sine_basis(u0, DT, T, M, dtype=np.float32)
    cs = rng.uniform(-0.3, 0.3, size=(6, M)).astype(np.float32)

    def fg(c):
        return jax.value_and_grad(
            lambda c: sector.cost(st, psi_i, psi_f,
                                  basis.convert_control(c), GAMMA))(c)

    def fg_batch(C):
        f, g = jax.vmap(fg)(C)
        return f, g

    r_v = jax.jit(jax.vmap(lambda c: minimize_lbfgs(
        fg, c, max_iter=25, tol=1e-6)))(jnp.asarray(cs))
    r_b = jax.jit(lambda C: minimize_lbfgs_batch(
        fg_batch, C, max_iter=25, tol=1e-6))(jnp.asarray(cs))
    np.testing.assert_allclose(np.asarray(r_b.f), np.asarray(r_v.f),
                               rtol=2e-4, atol=2e-6)
    # both must actually have optimized
    J0, _ = fg_batch(jnp.asarray(cs))
    assert float(jnp.max(r_b.f - J0)) < 0
