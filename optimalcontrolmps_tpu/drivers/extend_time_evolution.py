"""Extend an optimized ramp by 100 constant-control steps and recompute
fidelities — rebuild of main/ExtendTimeEvolution.cpp.

    python -m ...drivers.extend_time_evolution InputFile BHrampInitialFinal.txt
"""

from __future__ import annotations

import sys

import numpy as np

from .. import engine, io
from ..config import parse_input_file
from ..mps import expectation_values
from ..sites import op
from .common import build_problem, setup_precision


def run(cfg_path: str, ramp_path: str, out_prefix: str = "") -> dict:
    import jax

    cfg = parse_input_file(cfg_path)
    setup_precision(cfg)
    ramp = io.read_ramp_file(ramp_path)
    tstep = cfg.get_real("tstep", 1e-2)
    T = cfg.get_real("T")

    times = ramp["times"].tolist()
    u_init = ramp["u_init"].tolist()
    u_final = ramp["u_final"].tolist()
    # pad 100 extra steps of constant control (ExtendTimeEvolution.cpp:64-68)
    for i in range(1, 101):
        times.append(T + i * tstep)
        u_init.append(u_init[-1])
        u_final.append(u_final[-1])
    times = np.asarray(times)

    cfg.values["T"] = str((len(u_init) - 1) * tstep)
    p = build_problem(cfg, u0=np.asarray(u_init))
    st, psi_i, psi_f = p.stepper, p.psi_i, p.psi_f
    real = np.float64 if np.dtype(p.dtype) == np.complex128 else np.float32

    from ..backends import engine_for
    eng = engine_for(st)
    fid_i = np.asarray(eng.fidelities_streaming(
        st, psi_i, psi_f, np.asarray(u_init, dtype=real)))
    print("Calculated initial control")
    fid_f = np.asarray(eng.fidelities_streaming(
        st, psi_i, psi_f, np.asarray(u_final, dtype=real)))
    print("Calculated final control")

    tag = f"{T:.1f}"
    io.write_ramp_file(out_prefix + f"BHrampInitialFinal_extendedT{tag}.txt",
                       times, u_init, fid_i, u_final, fid_f)
    print("Saved ramp data")

    # stream the populations (one state in flight; see streaming.py)
    from ..streaming import rollout_measure
    n_op = op("N", p.d)
    if p.kind == "sector":
        from ..sector import expectation_n, sector_step
        expn = jax.jit(lambda uu: rollout_measure(
            lambda s, a, b: sector_step(st, s, a, b, True), psi_i, uu,
            lambda s: expectation_n(st, s)))(
                np.asarray(u_final, dtype=real))
    else:
        from ..tebd import tebd_step as _tstep
        unwrap = (lambda s: s.B) if p.kind == "vidal" else (lambda s: s)
        if p.kind == "vidal":
            from .. import vidal as _vidal
            step = lambda s, a, b: _vidal.vidal_step(st, s, a, b, True)
        else:
            step = lambda s, a, b: _tstep(st, s, a, b, forward=True)
        expn = jax.jit(lambda uu: rollout_measure(
            step, psi_i, uu,
            lambda s: expectation_values(unwrap(s), n_op)))(
                np.asarray(u_final, dtype=real))
    io.write_expectation_file(out_prefix + f"ExpectationN_extendedT{tag}.txt",
                              times, np.asarray(expn))
    print("Saved population data")
    return {"times": times, "fid_final": fid_f}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(f"Usage: {sys.argv[0]} InputFile BHrampInitialFinal.txt")
        return 0
    run(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
