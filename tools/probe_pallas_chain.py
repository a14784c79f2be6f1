"""A/B: fused Pallas sector chain vs the XLA scan path, on hardware.

Measures batched flagship cost+exact-gradient throughput (the multistart
solve's inner evaluation) for:
  scan    — jax.vmap over sector.cost + autodiff (the round-2 path)
  pallas  — ops/pallas_sector.chain_final + autodiff around it
and cross-checks their gradients.

Usage: python tools/probe_pallas_chain.py [batch] [variants]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, DT, M, L, D, NPART, GAMMA = 2.0, 0.01, 10, 5, 4, 5, 1e-6


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["scan", "pallas"])

    import jax
    import jax.numpy as jnp
    from optimalcontrolmps_tpu import control, sector, seeds
    from optimalcontrolmps_tpu.engine import regularization
    from optimalcontrolmps_tpu.ops import pallas_sector as ps
    from optimalcontrolmps_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    N = int(round(T / DT)) + 1
    st = sector.make_sector_stepper(L, D, NPART, 1.0, DT,
                                    dtype=jnp.complex64)
    psi_i = sector.sector_ground_state(L, D, NPART, 1.0, 2.5,
                                       dtype=np.complex64)
    psi_f = sector.sector_ground_state(L, D, NPART, 1.0, 50.0,
                                       dtype=np.complex64)
    rng = np.random.default_rng(123456789)
    u0 = seeds.linsigmoid_seed(2.5, 50.0, N, rng=rng)
    basis = control.chopped_sine_basis(u0, DT, T, M, dtype=np.float32)
    cs = rng.uniform(-0.05, 0.05, size=(B, M)).astype(np.float32)
    print(f"backend={jax.devices()[0].platform} B={B} N_t={N}", flush=True)

    psi_f_conj = jnp.asarray(np.conj(psi_f))

    def pallas_fg(C):
        def tot(C):
            U = jax.vmap(basis.convert_control)(C)
            psiT = ps.chain_final(st, U, psi_i)
            ov = psiT @ psi_f_conj
            fid = (ov * ov.conj()).real
            reg = jax.vmap(lambda u: regularization(u, GAMMA, st.dt))(U)
            J = 0.5 * (1.0 - fid) + reg
            return jnp.sum(J), J
        (s, J), G = jax.value_and_grad(tot, has_aux=True)(C)
        return J, G

    def scan_fg(C):
        def one(c):
            return jax.value_and_grad(
                lambda c: sector.cost(st, psi_i, psi_f,
                                      basis.convert_control(c), GAMMA))(c)
        return jax.vmap(one)(C)

    fns = {"scan": scan_fg, "pallas": pallas_fg}
    outs = {}
    for name in variants:
        fn = jax.jit(fns[name])
        t0 = time.time()
        J, G = fn(cs)
        J.block_until_ready()
        compile_s = time.time() - t0
        reps = 5
        t0 = time.time()
        for k in range(reps):
            J, G = fn(cs + np.float32(1e-6 * k))
            J.block_until_ready()
        per = (time.time() - t0) / reps
        outs[name] = (np.asarray(J), np.asarray(G))
        print(f"{name:7s} B={B} evals/s={B/per:10.1f} time/batch={per:.3f}s "
              f"compile={compile_s:.0f}s J[0]={float(J[0]):.8f}", flush=True)

    if len(outs) == 2 and all(k in outs for k in ("scan", "pallas")):
        Js, Gs = outs["scan"]
        Jp, Gp = outs["pallas"]
        print(f"max|dJ|={np.max(np.abs(Js - Jp)):.2e} "
              f"max|dG|={np.max(np.abs(Gs - Gp)):.2e} "
              f"(|G|max={np.max(np.abs(Gs)):.2e})", flush=True)


if __name__ == "__main__":
    main()
