"""Pure device-compute timing on axon: scalar in, scalar out.

The axon tunnel moves host<->device data at ~15 MB/s, so any benchmark that
uploads per-rep arrays measures the tunnel, not the chip. Here every
variant takes ONE f32 scalar (a perturbation seed), derives the batch
inside the program from inlined constants, and returns ONE scalar.

Variants:
  ship   — flagship sector gradient_lowmem (the bench.py workload)
  gemm   — bare 400-step GEMM chain
  g+ph   — GEMM + both diagonal phase multiplies (exp over all ns)
  g+gph  — GEMM + phases via 6 distinct-value exp + gather
  full   — g+ph + per-step norm (the shipped sector_step)

Usage: python tools/probe_pure_compute.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 400


def timeit(name, fn, reps=5):
    import jax

    t0 = time.time()
    out = float(np.asarray(fn(np.float32(0.0))))
    compile_s = time.time() - t0
    t0 = time.time()
    for k in range(reps):
        out = float(np.asarray(fn(np.float32(1e-4 * (k + 1)))))
    dt = (time.time() - t0) / reps
    print(f"{name:8s} time/batch={dt * 1e3:8.1f}ms us/step={dt / STEPS * 1e6:7.1f} "
          f"compile={compile_s:.0f}s out={out:.4f}", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from optimalcontrolmps_tpu import sector

    print(f"backend={jax.devices()[0].platform} B={B}", flush=True)

    # --- ship: flagship gradient via graft entry, batch derived on device
    fn, _ = ge.entry()
    rng = np.random.default_rng(0)
    cs0 = rng.uniform(-0.05, 0.05, size=(B, 10)).astype(np.float32)

    @jax.jit
    def ship(eps):
        cs = cs0 + eps
        J, g = jax.vmap(fn)(cs)
        return jnp.sum(J) + jnp.sum(g)

    timeit("ship", ship)

    st = sector.make_sector_stepper(5, 4, 5, 1.0, 0.01, dtype=jnp.complex64)
    WT = np.asarray(st.WJ_fwd).T.copy()
    nn1 = np.asarray(st.nn1)
    vals, inv = np.unique(nn1, return_inverse=True)
    ns = st.ns
    psi0 = rng.normal(size=(B, 2, ns)).astype(np.float32)
    us0 = rng.uniform(2.0, 50.0, size=(STEPS, B)).astype(np.float32)
    dt = 0.01

    def make(kind):
        @jax.jit
        def run(eps):
            p = (psi0[:, 0] + eps + 1j * psi0[:, 1]).astype(np.complex64)

            def body(q, u):
                with jax.default_matmul_precision("highest"):
                    if kind == "gemm":
                        return q @ WT, None
                    if kind == "g+gph":
                        small = jnp.exp(-0.25j * dt * u[:, None]
                                        * vals[None, :])
                        ph = small[:, inv]
                    else:
                        ph = jnp.exp(-0.25j * dt * u[:, None]
                                     * nn1[None, :])
                    q = q * ph.astype(q.dtype)
                    q = q @ WT
                    q = q * ph.astype(q.dtype)
                    if kind == "full":
                        nr = jnp.linalg.norm(q, axis=1, keepdims=True)
                        q = q / nr.astype(q.dtype)
                    return q, None

            q, _ = jax.lax.scan(body, p, us0 + eps)
            return jnp.sum(jnp.abs(q[:, 0]))

        return run

    for kind in ("gemm", "g+ph", "g+gph", "full"):
        timeit(kind, make(kind))


if __name__ == "__main__":
    main()
