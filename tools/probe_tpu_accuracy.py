"""TPU-vs-CPU accuracy probe for the flagship cost+gradient.

Runs the graft entry at a fixed control on the current backend and prints
J and |g| — compare with the c128 golden from tools/probe_trunc.py
(J=0.1292463977, |g|=1.369035e-01 at the same control, seed 3).

Env: OCMPS_TRUNC / OCMPS_GAUGE select the hot-path variant;
JAX_DEFAULT_MATMUL_PRECISION=highest forces 3-pass f32 MXU matmuls.
"""

import os
import sys
import time

import numpy as np

# repo root importable without PYTHONPATH (setting PYTHONPATH breaks the
# axon TPU plugin discovery in this image)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("MATMUL") == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")

    import __graft_entry__ as ge

    fn, _ = ge.entry()
    f = jax.jit(fn)

    rng = np.random.default_rng(3)
    c = rng.uniform(-0.5, 0.5, size=10).astype(np.float32)

    t0 = time.time()
    J, g = f(c)
    J = float(np.asarray(J))
    g = np.asarray(g, dtype=np.float64)
    print(f"J={J:.10f} |g|={np.linalg.norm(g):.6e} "
          f"dJ_vs_golden={abs(J-0.1292463977):.3e} "
          f"backend={jax.devices()[0].platform} "
          f"trunc={os.environ.get('OCMPS_TRUNC','rsvd1')} "
          f"gauge={os.environ.get('OCMPS_GAUGE','cholesky')} "
          f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
