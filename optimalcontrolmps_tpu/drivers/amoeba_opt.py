"""Derivative-free CLI: Nelder-Mead (Amoeba) with bound penalty.

Rebuild of main/AmoebaOpt.cpp: optimizes GROUP coefficients from zero with
the simplex method + quadratic bound penalty on the converted control
(OCWrapper, AmoebaOpt.cpp:13-52), defaults uMin=2, uMax=100,
gammaBound=100. Writes BHrampInitialFinal.txt and ProgressCache.txt.

    python -m optimalcontrolmps_tpu.drivers.amoeba_opt InputFile [seed]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from .. import engine, io
from ..config import parse_input_file
from ..optimize import minimize_nelder_mead, make_penalized_cost
from .common import build_problem, print_banner, time_axis


def run(cfg_path: str, seed: int = 1, out_prefix: str = "") -> dict:
    import jax
    import jax.numpy as jnp

    cfg = parse_input_file(cfg_path)
    p = build_problem(cfg, seed=seed)
    gamma_bound = cfg.get_real("gammaBound", 100.0)
    max_iter = cfg.get_int("maxIter", 5000)
    cache = cfg.get_yesno("cacheProgress", False)

    print_banner(p, {"gammaBound (penalty)": gamma_bound,
                     "MaxIter (Amoeba)": max_iter})

    st, psi_i, psi_f, basis = p.stepper, p.psi_i, p.psi_f, p.basis
    cost = lambda c: engine.cost(st, psi_i, psi_f,
                                 basis.convert_control(c), p.gamma)
    f = make_penalized_cost(cost, convert_control=basis.convert_control,
                            gamma_bound=gamma_bound)

    real = np.float64 if np.dtype(p.dtype) == np.complex128 else np.float32
    c0 = jnp.asarray(np.zeros(p.M, dtype=real))
    t0 = time.time()
    res = jax.jit(lambda c: minimize_nelder_mead(f, c,
                                                 max_iter=max_iter))(c0)
    wall = time.time() - t0
    c_opt = np.asarray(res.x)
    print(f"Amoeba finished: f = {float(res.f):.6e}, "
          f"{int(res.iterations)} iterations, {int(res.n_evals)} evals "
          f"({wall:.1f}s)")

    if cache:
        io.append_progress(out_prefix + "ProgressCache.txt",
                           int(res.iterations), float(res.f), p.T,
                           int(res.n_evals) * p.n_steps)

    times = time_axis(p)
    fids = lambda c: np.asarray(engine.fidelities(
        st, psi_i, psi_f, basis.convert_control(jnp.asarray(c))))
    u_init = np.asarray(basis.convert_control(c0))
    u_final = np.asarray(basis.convert_control(jnp.asarray(c_opt)))
    io.write_ramp_file(out_prefix + "BHrampInitialFinal.txt", times,
                       u_init, fids(np.zeros(p.M)), u_final, fids(c_opt))
    return {"c_opt": c_opt, "f": float(res.f),
            "n_evals": int(res.n_evals)}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 1:
        print(f"Usage: {sys.argv[0]} InputFile_BHcontrol [seed]")
        return 0
    run(argv[0], seed=int(argv[1]) if len(argv) > 1 else 1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
