"""Fused Pallas kernel for the sector-engine Trotter chain.

The multistart solve's hot loop is the merged-phase GEMM chain
(sector.py rollout_final: h <- phase(u_i)^2 . (WJ h) per step, one
(ns_p, ns_p) complex GEMM + one elementwise phase pass). Under XLA each
step round-trips the (B, ns_p) state through HBM twice (GEMM out,
phase out) and the measured step time is ~2.3x the bare-GEMM floor
(BENCH_NOTES round 2, tools/probe_pure_compute.py).

This module runs the ENTIRE chain in ONE Pallas kernel:

* the state lives in VMEM for all N_t steps (grid over batch tiles,
  each tile runs its full time loop);
* complex arithmetic is explicit real pairs (the restricted TPU backend
  aborts on complex transfers — ops/complex_io.py — and MXU wants real
  f32 matmuls anyway): one chain step = 4 (B_t, 128) x (128, 128) MXU
  matmuls + a fused cos/sin phase rotation on the VPU;
* every batch lane carries ITS OWN control trajectory (multistart), so
  the phase angle is the outer product u_i[b] x nn1, computed in-kernel
  (transcendentals are VPU-cheap once HBM traffic is gone);
* the backward pass needs no stored trajectory: the chain is unitary,
  so h_{i-1} = WJ^H (conj(p_i) . h_i) reconstructs states on the fly
  (reversible integration) while the cotangent propagates — 4+4 MXU
  matmuls + phases per backward step, zero HBM traffic beyond kernel
  I/O.

`chain_final(st, u_bt, psi0)` is the public entry: a custom-vjp
function returning the normalized final sector state psi_T for a
(B, N_t) control batch. On non-TPU backends (and under OCMPS_PALLAS=0)
it runs an algebraically identical jax.lax.scan implementation — the
Pallas kernels' correctness reference (tests/test_pallas_sector.py
validates fwd+grad against it, and in interpret mode on CPU).

Reference parity: the chain implements BH_tDMRG::step's split-step
Trotter product (/root/reference/src/BH_tDMRG.cpp:111-124) projected on
the fixed-N sector, exactly as sector.rollout_final does.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chain_final", "use_pallas_chain"]


def use_pallas_chain() -> bool:
    """Policy: run the fused Pallas chain? Default: only on TPU backends
    (CPU/GPU get the identical scan implementation). OCMPS_PALLAS=0
    forces the scan path, =1 forces Pallas (interpret on CPU, for
    tests)."""
    mode = os.environ.get("OCMPS_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() not in ("cpu", "gpu")


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# JAX reference implementation (identical algebra, any backend)
# ---------------------------------------------------------------------------

def _chain_final_scan(dt, Wr, Wi, nn1, u_bt, h0r, h0i):
    """(B, N_t) controls -> (B, n) final half-phased state, real pairs.

    h_0 = D(u_0) psi_0 (quarter phase), then
    h_i = D(u_i)^2 (W h_{i-1}) (half phase) for i = 1..N_t-1 —
    exactly sector.rollout_final's merged-phase chain. Row-vector form:
    h_row <- h_row W^T."""
    ph0 = (-0.25 * dt) * jnp.outer(u_bt[:, 0], nn1)       # (B, n)
    c0, s0 = jnp.cos(ph0), jnp.sin(ph0)
    hr = c0 * h0r[None, :] - s0 * h0i[None, :]
    hi = c0 * h0i[None, :] + s0 * h0r[None, :]
    WrT, WiT = Wr.T, Wi.T

    def body(carry, u_i):
        hr, hi = carry
        ar = hr @ WrT - hi @ WiT                          # (B, n)
        ai = hr @ WiT + hi @ WrT
        ph = (-0.5 * dt) * jnp.outer(u_i, nn1)
        c, s = jnp.cos(ph), jnp.sin(ph)
        return (c * ar - s * ai, c * ai + s * ar), None

    (hr, hi), _ = jax.lax.scan(body, (hr, hi), u_bt[:, 1:].T)
    return hr, hi


def _scan_bwd(dt, Wr, Wi, nn1, u_bt, hTr, hTi, gTr, gTi):
    """Reference backward (same reversible algebra as _bwd_kernel).

    Cotangent convention: L real, g = (dL/d hr, dL/d hi) as a real pair.
    A phase rotation h = R(ph) a has vjp g_a = R(-ph) g_h and
    dL/dph = sum_n (g_hi h_r - g_hr h_i); the chain rule over the
    angle ph_i = coeff * u_i * nn1 gives du_i."""
    def body(carry, u_i):
        hr, hi, gr, gi = carry
        du_i = (-0.5 * dt) * jnp.sum(nn1[None, :] * (gi * hr - gr * hi),
                                     axis=1)
        ph = (-0.5 * dt) * jnp.outer(u_i, nn1)
        c, s = jnp.cos(ph), jnp.sin(ph)
        ar = c * hr + s * hi                              # R(-ph) h
        ai = c * hi - s * hr
        br = c * gr + s * gi                              # R(-ph) g
        bi = c * gi - s * gr
        # x_row W^H  (re = xr Wr + xi Wi, im = xi Wr - xr Wi)
        hr2 = ar @ Wr + ai @ Wi
        hi2 = ai @ Wr - ar @ Wi
        gr2 = br @ Wr + bi @ Wi
        gi2 = bi @ Wr - br @ Wi
        return (hr2, hi2, gr2, gi2), du_i

    (hr, hi, gr, gi), dus = jax.lax.scan(
        body, (hTr, hTi, gTr, gTi), u_bt[:, 1:].T[::-1])
    du0 = (-0.25 * dt) * jnp.sum(nn1[None, :] * (gi * hr - gr * hi), axis=1)
    return jnp.concatenate([du0[:, None], dus[::-1].T], axis=1)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(dt, n_t, WrT_ref, WiT_ref, nn1_ref, u_ref, h0r_ref,
                h0i_ref, hr_out, hi_out):
    nn1 = nn1_ref[:]                                      # (1, n)
    u0 = u_ref[0, :][:, None]                             # (B_t, 1)
    ph0 = (-0.25 * dt) * (u0 * nn1)                       # (B_t, n)
    c0, s0 = jnp.cos(ph0), jnp.sin(ph0)
    hr_out[:] = c0 * h0r_ref[:] - s0 * h0i_ref[:]
    hi_out[:] = c0 * h0i_ref[:] + s0 * h0r_ref[:]

    def body(i, _):
        hr, hi = hr_out[:], hi_out[:]
        WrT, WiT = WrT_ref[:], WiT_ref[:]
        ar = (jnp.dot(hr, WrT, preferred_element_type=jnp.float32)
              - jnp.dot(hi, WiT, preferred_element_type=jnp.float32))
        ai = (jnp.dot(hr, WiT, preferred_element_type=jnp.float32)
              + jnp.dot(hi, WrT, preferred_element_type=jnp.float32))
        u_i = u_ref[i, :][:, None]
        ph = (-0.5 * dt) * (u_i * nn1)
        c, s = jnp.cos(ph), jnp.sin(ph)
        hr_out[:] = c * ar - s * ai
        hi_out[:] = c * ai + s * ar
        return 0

    jax.lax.fori_loop(1, n_t, body, 0)


def _bwd_kernel(dt, n_t, Wr_ref, Wi_ref, nn1_ref, u_ref, hTr_ref, hTi_ref,
                gTr_ref, gTi_ref, du_out, gr_s, gi_s, hr_s, hi_s):
    """Reverse sweep: reconstruct h_{i-1} by inverse (unitary) propagation
    while the cotangent propagates through W^H; emit du[i, :] rows."""
    nn1 = nn1_ref[:]                                      # (1, n)
    gr_s[:] = gTr_ref[:]
    gi_s[:] = gTi_ref[:]
    hr_s[:] = hTr_ref[:]
    hi_s[:] = hTi_ref[:]

    def body(k, _):
        i = n_t - 1 - k                                   # N_t-1 .. 1
        hr, hi = hr_s[:], hi_s[:]
        gr, gi = gr_s[:], gi_s[:]
        Wr, Wi = Wr_ref[:], Wi_ref[:]
        du_out[i, :] = (-0.5 * dt) * jnp.sum(
            nn1 * (gi * hr - gr * hi), axis=1)
        u_i = u_ref[i, :][:, None]
        ph = (-0.5 * dt) * (u_i * nn1)
        c, s = jnp.cos(ph), jnp.sin(ph)
        ar = c * hr + s * hi
        ai = c * hi - s * hr
        br = c * gr + s * gi
        bi = c * gi - s * gr
        hr_s[:] = (jnp.dot(ar, Wr, preferred_element_type=jnp.float32)
                   + jnp.dot(ai, Wi, preferred_element_type=jnp.float32))
        hi_s[:] = (jnp.dot(ai, Wr, preferred_element_type=jnp.float32)
                   - jnp.dot(ar, Wi, preferred_element_type=jnp.float32))
        gr_s[:] = (jnp.dot(br, Wr, preferred_element_type=jnp.float32)
                   + jnp.dot(bi, Wi, preferred_element_type=jnp.float32))
        gi_s[:] = (jnp.dot(bi, Wr, preferred_element_type=jnp.float32)
                   - jnp.dot(br, Wi, preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, n_t - 1, body, 0)
    gr, gi = gr_s[:], gi_s[:]
    hr, hi = hr_s[:], hi_s[:]
    du_out[0, :] = (-0.25 * dt) * jnp.sum(
        nn1 * (gi * hr - gr * hi), axis=1)


def _block_b(B: int, n: int, n_t: int) -> int:
    """Batch tile: fit live state + temporaries + u/du in ~9 MB VMEM."""
    for bt in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        vmem = (14 * n * bt + 2 * n_t * bt + 2 * n * n) * 4
        if bt <= B and vmem < 9 * 1024 * 1024 and B % bt == 0:
            return bt
    return min(B, 8)


def _pallas_fwd(dt, Wr, Wi, nn1, u_bt, h0r, h0i):
    B, n_t = u_bt.shape
    n = Wr.shape[0]
    bt = _block_b(B, n, n_t)
    nn1_2d = nn1.reshape(1, n)
    u_t = u_bt.T                                          # (N_t, B)
    h0r_2d = jnp.broadcast_to(h0r.reshape(1, n), (bt, n))
    h0i_2d = jnp.broadcast_to(h0i.reshape(1, n), (bt, n))
    const_spec = pl.BlockSpec((n, n), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((bt, n), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    fixed_spec = pl.BlockSpec((bt, n), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_kernel, float(dt), int(n_t)),
        grid=(B // bt,),
        in_specs=[
            const_spec,                                   # WrT
            const_spec,                                   # WiT
            pl.BlockSpec((1, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),        # nn1
            pl.BlockSpec((n_t, bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),        # u (T, B)
            fixed_spec,                                   # h0r
            fixed_spec,                                   # h0i
        ],
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2,
        interpret=_interpret(),
    )(Wr.T, Wi.T, nn1_2d, u_t, h0r_2d, h0i_2d)


def _pallas_bwd(dt, Wr, Wi, nn1, u_bt, hTr, hTi, gTr, gTi):
    B, n_t = u_bt.shape
    n = Wr.shape[0]
    bt = _block_b(B, n, n_t)
    nn1_2d = nn1.reshape(1, n)
    u_t = u_bt.T
    const_spec = pl.BlockSpec((n, n), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((bt, n), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    du_t = pl.pallas_call(
        partial(_bwd_kernel, float(dt), int(n_t)),
        grid=(B // bt,),
        in_specs=[
            const_spec,                                   # Wr
            const_spec,                                   # Wi
            pl.BlockSpec((1, n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),        # nn1
            pl.BlockSpec((n_t, bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),        # u
            row_spec, row_spec,                           # hT
            row_spec, row_spec,                           # gT
        ],
        out_specs=pl.BlockSpec((n_t, bt), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_t, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, n), jnp.float32)] * 4,
        interpret=_interpret(),
    )(Wr, Wi, nn1_2d, u_t, hTr, hTi, gTr, gTi)
    return du_t.T


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _chain(dt, Wr, Wi, nn1, u_bt, h0r, h0i):
    if use_pallas_chain():
        return _pallas_fwd(dt, Wr, Wi, nn1, u_bt, h0r, h0i)
    return _chain_final_scan(dt, Wr, Wi, nn1, u_bt, h0r, h0i)


def _chain_fwd_rule(dt, Wr, Wi, nn1, u_bt, h0r, h0i):
    out = _chain(dt, Wr, Wi, nn1, u_bt, h0r, h0i)
    return out, (Wr, Wi, nn1, u_bt, out[0], out[1])


def _chain_bwd_rule(dt, res, g):
    Wr, Wi, nn1, u_bt, hTr, hTi = res
    gTr, gTi = g
    if use_pallas_chain():
        du = _pallas_bwd(dt, Wr, Wi, nn1, u_bt, hTr, hTi, gTr, gTi)
    else:
        du = _scan_bwd(dt, Wr, Wi, nn1, u_bt, hTr, hTi, gTr, gTi)
    # W/nn1/h0 are problem constants — zero cotangents keep the vjp total
    return (jnp.zeros_like(Wr), jnp.zeros_like(Wi), jnp.zeros_like(nn1),
            du, jnp.zeros_like(hTr[0]), jnp.zeros_like(hTi[0]))


_chain.defvjp(_chain_fwd_rule, _chain_bwd_rule)


def chain_final(st, u_bt, psi0):
    """Batched merged-phase chain: (B, N_t) controls -> (B, ns) final
    SECTOR state psi_T (normalized, trailing phase stripped), complex.

    st: SectorStepper. psi0: (ns,) complex host vector (embedded as a
    constant — never transferred as complex). The heavy chain runs in
    real pairs (Pallas on TPU); only the final fix-up is complex.
    Differentiable in u_bt (custom VJP, reversible backward)."""
    n = st.ns_p
    Wr = jnp.asarray(np.real(np.asarray(st.WJ_fwd_p)), jnp.float32)
    Wi = jnp.asarray(np.imag(np.asarray(st.WJ_fwd_p)), jnp.float32)
    nn1 = jnp.asarray(np.asarray(st.nn1_p), jnp.float32)
    p0 = np.zeros(n, np.complex64)
    p0[:st.ns] = np.asarray(psi0).astype(np.complex64)
    h0r = jnp.asarray(p0.real, jnp.float32)
    h0i = jnp.asarray(p0.imag, jnp.float32)
    u_bt = jnp.asarray(u_bt, jnp.float32)
    hTr, hTi = _chain(float(st.dt), Wr, Wi, nn1, u_bt, h0r, h0i)
    hT = jax.lax.complex(hTr, hTi)[:, :st.ns]
    # strip the doubled trailing phase (power -1) and renormalize once
    ph = jnp.exp((0.25j * st.dt) * u_bt[:, -1:] * st.nn1[None, :]
                 ).astype(hT.dtype)
    psiT = hT * ph
    nrm = jnp.linalg.norm(psiT, axis=1, keepdims=True)
    return psiT / jnp.where(nrm > 1e-16, nrm, 1.0).astype(psiT.dtype)
