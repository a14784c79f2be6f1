"""Bond-dimension convergence study — rebuild of main/AnalyzeBondDim.cpp.

Propagates a fixed ramp (a loaded optimized ramp, or the exponential ramp
expRamp at AnalyzeBondDim.cpp:15-26) at several static bond dimensions and
records per-t fidelity, gradient and wall time for each.

    python -m ...drivers.analyze_bond_dim [InputFile [BHrampInitialFinal.txt]]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from .. import engine, io, tebd, groundstate
from ..config import parse_input_file, InputGroup
from .common import (J_HOP, U_INITIAL, U_FINAL, effective_chi, exp_ramp,
                     setup_precision)


# AnalyzeBondDim.cpp:31 (1000 capped to the exact max rank by effective_chi)
DEFAULT_BOND_DIMS = (20, 30, 40, 50, 1000)


def run(cfg_path=None, ramp_path=None, bond_dims=DEFAULT_BOND_DIMS,
        dtype=None) -> dict:
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.complex128 if jax.devices()[0].platform == "cpu" \
            else jnp.complex64

    # defaults mirror AnalyzeBondDim.cpp:38-44
    if cfg_path is not None:
        cfg = parse_input_file(cfg_path)
        setup_precision(cfg)
        tstep = cfg.get_real("tstep", 1e-2)
        T = cfg.get_real("T", 6)
        L = cfg.get_int("N", 8)
        npart = cfg.get_int("Npart", 8)
        d = cfg.get_int("d", 8)
    else:
        tstep, T, L, npart, d = 5e-3, 5.0, 20, 20, 7

    if ramp_path is not None:
        control = io.read_ramp_file(ramp_path)["u_final"]
    else:
        n_steps = int(T / tstep + 1)
        control = exp_ramp(U_INITIAL, U_FINAL, n_steps)
    times = np.arange(len(control)) * tstep

    real = np.float64 if np.dtype(dtype) == np.complex128 else np.float32
    u = np.asarray(control, dtype=real)

    results = {}
    for maxm in bond_dims:
        chi = effective_chi(maxm, L, d + 1)
        st = tebd.make_stepper(L, d, J_HOP, tstep, chi, dtype=dtype)
        psi_i = groundstate.initialize_state(L, d, npart, J_HOP,
                                             float(u[0]), chi, dtype=dtype)
        psi_f = groundstate.initialize_state(L, d, npart, J_HOP,
                                             float(u[-1]), chi, dtype=dtype)
        t0 = time.time()
        fids = np.asarray(jax.jit(
            lambda uu: engine.fidelities(st, psi_i, psi_f, uu))(u))
        fids = np.asarray(fids)
        t_fid = time.time() - t0
        t0 = time.time()
        g, _ = jax.jit(lambda uu: engine.gradient(st, psi_i, psi_f, uu,
                                                  0.0))(u)
        g = np.asarray(g)
        t_grad = time.time() - t0
        results[maxm] = {"chi": chi, "fids": fids, "grad": g,
                        "t_fidelity": t_fid, "t_gradient": t_grad}
        print(f"maxBondDim {maxm} (chi={chi}): final fidelity "
              f"{fids[-1]:.8f}, |g| {np.abs(g).max():.3e}, "
              f"fid {t_fid:.1f}s grad {t_grad:.1f}s")

    # convergence table per t for the studied bond dims
    print("\nt\t" + "\t".join(f"F(chi={results[m]['chi']})"
                              for m in bond_dims))
    for i in range(0, len(times), max(1, len(times) // 20)):
        row = "\t".join(f"{results[m]['fids'][i]:.8f}" for m in bond_dims)
        print(f"{times[i]:g}\t{row}")
    return results


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("No input detected ... using standard parameters")
    run(argv[0] if len(argv) >= 1 else None,
        argv[1] if len(argv) >= 2 else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
