"""Quench-physics analysis — rebuild of main/AnalyzeQuench.cpp.

Propagates a quench / exponential / optimized ramp recording per-step
entanglement entropies and single-particle / density-density correlations
from sites 7..13 (0-based 7..13 inclusive endpoints as the reference's
1-based startpoint=7, endpoint=13 => 0-based 6..12), writing four files in
the saveRowmat format (AnalyzeQuench.cpp:52-68,186-193).

    python -m ...drivers.analyze_quench [InputFile] [--ramp quench|exp|FILE]
"""

from __future__ import annotations

import sys

import numpy as np

from .. import engine, io, tebd, groundstate, observables
from ..config import parse_input_file
from ..sites import op
from .common import (J_HOP, U_INITIAL, U_FINAL, effective_chi, exp_ramp,
                     setup_precision,
                     quench_ramp)


def run(cfg_path=None, ramp: str = "exp", out_prefix: str = "",
        dtype=None, startpoint: int = 6, endpoint: int = 12) -> dict:
    """startpoint/endpoint are 0-based sites (reference 1-based 7..13,
    AnalyzeQuench.cpp:129-131)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.complex128 if jax.devices()[0].platform == "cpu" \
            else jnp.complex64

    if cfg_path is not None:
        cfg = parse_input_file(cfg_path)
        setup_precision(cfg)
        tstep = cfg.get_real("tstep", 1e-2)
        T = cfg.get_real("T", 6)
        L = cfg.get_int("N", 8)
        npart = cfg.get_int("Npart", 8)
        d = cfg.get_int("d", 8)
        maxm = cfg.get_int("maxBondDim", 1000)
    else:
        tstep, T, L, npart, d, maxm = 5e-3, 3.0, 20, 20, 7, 1000

    n_steps = int(T / tstep + 1)
    if ramp == "exp":
        control = exp_ramp(U_INITIAL, U_FINAL, n_steps)
        tag = "Exp"
    elif ramp == "quench":
        control = quench_ramp(U_INITIAL, U_FINAL, n_steps)
        tag = "Quench"
    else:
        control = io.read_ramp_file(ramp)["u_final"]
        tag = "Opt"

    chi = effective_chi(maxm, L, d + 1)
    st = tebd.make_stepper(L, d, J_HOP, tstep, chi, dtype=dtype)
    psi_i = groundstate.initialize_state(L, d, npart, J_HOP, U_INITIAL, chi,
                                         dtype=dtype)

    real = np.float64 if np.dtype(dtype) == np.complex128 else np.float32
    u = np.asarray(control, dtype=real)
    sp_end = min(endpoint, L - 1)

    a_op, adag_op, n_op = op("A", d), op("Adag", d), op("N", d)

    def measure(psi):
        S = observables.entanglement_entropies(psi)
        sp, dd, rdd = [], [], []
        exp0 = observables.correlation_function(
            psi, n_op, startpoint, np.eye(d + 1), startpoint).real
        for j in range(startpoint + 1, sp_end + 1):
            spc = observables.correlation_function(psi, adag_op, startpoint,
                                                   a_op, j).real
            ddc = observables.correlation_function(psi, n_op, startpoint,
                                                   n_op, j).real
            expj = observables.correlation_function(
                psi, n_op, j, np.eye(d + 1), j).real
            sp.append(spc)
            dd.append(ddc)
            rdd.append(ddc - exp0 * expj)
        return S, jnp.stack(sp), jnp.stack(dd), jnp.stack(rdd)

    psi_t = engine.rollout(st, psi_i, u)
    S_all, sp_all, dd_all, rdd_all = jax.jit(jax.vmap(measure))(psi_t)

    io.write_rowmat(out_prefix + f"EntanglementEntropies_{tag}.txt",
                    np.asarray(S_all))
    io.write_rowmat(out_prefix + f"SingleParticleCorr_{tag}.txt",
                    np.asarray(sp_all))
    io.write_rowmat(out_prefix + f"DensityDensityCorr_{tag}.txt",
                    np.asarray(dd_all))
    io.write_rowmat(out_prefix + f"RescaledDensityDensityCorr_{tag}.txt",
                    np.asarray(rdd_all))
    print(f"Wrote 4 files for ramp {tag} ({len(u)} steps)")
    return {"entropies": np.asarray(S_all), "sp": np.asarray(sp_all),
            "dd": np.asarray(dd_all), "rdd": np.asarray(rdd_all)}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cfg = None
    ramp = "exp"
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--ramp":
            ramp = argv[i + 1]
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    if rest:
        cfg = rest[0]
    else:
        print("No input detected ... using standard parameters")
    run(cfg, ramp=ramp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
