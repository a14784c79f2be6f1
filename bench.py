"""Benchmark: flagship multistart gradient-evaluation throughput.

Workload (the hot path of the whole framework): cost + adjoint gradient of
the flagship control problem from the reference README (N=5 sites, Npart=5,
d=4, T=2.0, dt=0.01 -> 201 time steps, GROUP M=10, chi=32 >= the exact rank
25 that ITensor's adaptive truncation reaches on this problem), evaluated
for a BATCH of ramps in one jitted program — multistart optimization is the
production mode (the reference runs one ramp per process; BASELINE.md's
target is thousands of concurrent ramps).

One eval = 2 full TEBD rollouts (forward psi + backward xi, 201 steps each,
4 bond ops/step) + 201 sandwich overlaps + basis pullback.

Baseline: the reference publishes NO numbers (BASELINE.md). vs_baseline is
measured against this framework's own single-stream CPU rate on the dev
host (0.118 evals/s, recorded in BENCH_NOTES.md) — a stand-in for the
single-threaded BLAS-bound C++ reference until it can be built and timed.

Prints ONE JSON line. Env overrides: BENCH_BATCH (default 128),
BENCH_BACKEND=cpu to force the CPU backend.
"""

import json
import os
import sys
import time

import numpy as np

CPU_SINGLE_STREAM_BASELINE = 0.118  # evals/s, see BENCH_NOTES.md


def main():
    import jax

    if os.environ.get("BENCH_BACKEND") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from optimalcontrolmps_tpu.profiling import enable_compile_cache
    enable_compile_cache()  # amortize the ~9-min cold remote compile

    import jax.numpy as jnp
    import __graft_entry__ as ge
    from optimalcontrolmps_tpu import engine  # noqa: F401 (import check)

    # default batch: the sector GEMM engine saturates the chip around 16k
    # concurrent ramps; the MPS path around 32 (see BENCH_NOTES.md)
    eng = os.environ.get("OCMPS_ENGINE", "sector")
    B = int(os.environ.get("BENCH_BATCH", "16384" if eng == "sector"
                           else "32"))
    fn, _ = ge.entry()
    batched = jax.jit(jax.vmap(fn))

    rng = np.random.default_rng(0)
    cs = rng.uniform(-0.05, 0.05, size=(B, 10)).astype(np.float32)

    # compile + warm up. NOTE: on the axon TPU backend block_until_ready
    # returns immediately; downloading the (B,) cost vector is the only
    # reliable synchronization, so all timings force a download.
    t0 = time.time()
    out = batched(cs)
    J0 = np.asarray(out[0])
    compile_s = time.time() - t0

    reps = 3
    t0 = time.time()
    for k in range(reps):
        out = batched(cs + np.float32(0.001 * (k + 1)))
        J = np.asarray(out[0])
    dt = (time.time() - t0) / reps

    if not np.isfinite(J).all():
        print('{"metric": "flagship_grad_evals_per_s", "value": 0, '
              '"unit": "evals/s", "vs_baseline": 0}')
        print(f"# NON-FINITE COSTS on {jax.devices()[0].platform}: {J[:4]}",
              file=sys.stderr)
        return

    evals_per_s = B / dt
    # Engine/settings metadata: sector (dense fixed-N GEMM) and mps (TEBD)
    # are different algorithms for the same channel — never compare their
    # numbers silently (ADVICE.md round 1).
    from optimalcontrolmps_tpu.ops.precision import get_policy
    meta = {"engine": eng, "batch": B,
            "backend": jax.devices()[0].platform,
            "matmul_precision": get_policy()}
    if eng != "sector":
        meta.update({
            "sweep": os.environ.get("OCMPS_SWEEP", "brick"),
            "trunc": os.environ.get("OCMPS_TRUNC", ""),
            "gauge": os.environ.get("OCMPS_GAUGE", "cholesky")})
    result = {
        "metric": "flagship_grad_evals_per_s",
        "value": round(evals_per_s, 3),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_s / CPU_SINGLE_STREAM_BASELINE, 2),
        "meta": meta,
    }
    print(json.dumps(result))
    print(f"# batch={B} time/batch={dt:.3f}s compile={compile_s:.1f}s "
          f"backend={jax.devices()[0].platform} engine={eng}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
