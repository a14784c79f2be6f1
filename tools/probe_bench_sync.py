"""Validate bench timing methodology on axon: does downloading only J
under-measure (async pipelining of the gradient), and how does the shipped
sector gradient compare to a bare GEMM chain in the same session?

Variants:
  ship-J     — shipped gradient_lowmem, download J only (bench.py method)
  ship-Jg    — shipped gradient_lowmem, download J AND g
  ship-Jg10  — same with reps=10 (steady-state check)
  gemm       — bare 400-step GEMM chain, download result

Usage: python tools/probe_bench_sync.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge

    fn, _ = ge.entry()
    batched = jax.jit(jax.vmap(fn))
    rng = np.random.default_rng(0)
    cs = rng.uniform(-0.05, 0.05, size=(B, 10)).astype(np.float32)

    out = batched(cs)
    np.asarray(out[0]), np.asarray(out[1])  # compile + settle

    def measure(name, reps, download_g):
        t0 = time.time()
        for k in range(reps):
            out = batched(cs + np.float32(0.001 * (k + 1)))
            J = np.asarray(out[0])
            if download_g:
                g = np.asarray(out[1])
        dt = (time.time() - t0) / reps
        print(f"{name:10s} B={B} time/batch={dt * 1e3:8.1f}ms "
              f"evals/s={B / dt:10.1f}", flush=True)

    measure("ship-J", 3, False)
    measure("ship-Jg", 3, True)
    measure("ship-Jg10", 10, True)

    # bare GEMM chain in the same session
    from optimalcontrolmps_tpu import sector
    st = sector.make_sector_stepper(5, 4, 5, 1.0, 0.01, dtype=jnp.complex64)
    WT = np.asarray(st.WJ_fwd).T.copy()

    def gemm_chain(p2):
        p = (p2[:, 0] + 1j * p2[:, 1]).astype(np.complex64)

        def body(q, _):
            with jax.default_matmul_precision("highest"):
                return q @ WT, None

        q, _ = jax.lax.scan(body, p, None, length=400)
        return jnp.abs(q[:, 0])

    g = jax.jit(gemm_chain)
    psi0 = rng.normal(size=(B, 2, st.ns)).astype(np.float32)
    np.asarray(g(psi0))
    t0 = time.time()
    for k in range(5):
        out = np.asarray(g(psi0 + np.float32(1e-6 * k)))
    dt = (time.time() - t0) / 5
    print(f"{'gemm400':10s} B={B} time/batch={dt * 1e3:8.1f}ms "
          f"us/step={dt / 400 * 1e6:6.1f}", flush=True)


if __name__ == "__main__":
    main()
