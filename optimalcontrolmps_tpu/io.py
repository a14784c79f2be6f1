"""Result-file dataflow in the reference's column formats.

The reference has no binary checkpointing — its text files ARE the
checkpoint format (SURVEY.md §5): `BHrampInitialFinal.txt` is written by
the optimizers (src/BH_nlp.cpp:242-254) and re-read as input by
AnalyzeBondDim.cpp:64-77, CalculateDefects.cpp:49-62 and
ExtendTimeEvolution.cpp:50-60. These functions reproduce the formats
byte-compatibly (tab-separated columns) so reference tooling round-trips.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = [
    "write_ramp_file", "read_ramp_file", "append_progress",
    "write_expectation_file", "write_matrix", "read_matrix",
    "write_rowmat", "save_checkpoint", "load_checkpoint",
]


def write_ramp_file(path, times, u_init, fid_init, u_final, fid_final):
    """BHrampInitialFinal.txt: t, u_init, F_init, u_final, F_final per row
    (src/BH_nlp.cpp:242-254)."""
    with open(path, "w") as f:
        for row in zip(times, u_init, fid_init, u_final, fid_final):
            f.write("\t".join(_fmt(v) for v in row) + "\n")


def read_ramp_file(path):
    """Read back the 5-column ramp file. Returns dict of numpy arrays.

    Matches the column usage of AnalyzeBondDim.cpp:64-77 (reads the final
    control from column 3)."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    return {
        "times": data[:, 0], "u_init": data[:, 1], "fid_init": data[:, 2],
        "u_final": data[:, 3], "fid_final": data[:, 4],
    }


def append_progress(path, iteration, objective, T, nprop):
    """ProgressCache.txt: iter, obj, T, Nprop appended per iteration
    (src/BH_nlp.cpp:302-323)."""
    with open(path, "a") as f:
        f.write(f"{iteration}\t{_fmt(objective)}\t{_fmt(T)}\t{nprop}\n")


def nprop_per_iteration(n_steps, ls_trials=0, exact_hessian=True):
    """The reference's propagation-count accounting
    (src/BH_nlp.cpp:311-317): Nprop = N(2+ls_trials) [+ N(N-1)/2]."""
    n = n_steps * (2 + ls_trials)
    if exact_hessian:
        n += n_steps * (n_steps - 1) // 2
    return n


def write_expectation_file(path, times, expvals):
    """ExpectationN.txt: t then per-site <N> per row
    (main/OptimizeRamp.cpp:146-161)."""
    with open(path, "w") as f:
        for t, row in zip(times, expvals):
            f.write(_fmt(t) + "\t" + "\t".join(_fmt(v) for v in
                                               np.real(row)) + "\t\n")


def write_matrix(path, M):
    """GROUPHessian.txt / GRAPEHessian.txt: tab-separated rows
    (src/BH_nlp.cpp:257-288)."""
    M = np.asarray(M)
    with open(path, "w") as f:
        for row in M:
            f.write("\t".join(_fmt(v) for v in row) + "\t\n")


def read_matrix(path):
    return np.loadtxt(path)


def write_rowmat(path, rows):
    """saveRowmat format (main/AnalyzeQuench.cpp:52-68): one row per line."""
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(_fmt(v) for v in np.asarray(row)) + "\n")


def _fmt(v):
    return f"{float(v):.10g}"


# ---------------------------------------------------------------------------
# binary checkpoint/resume (beyond the reference: per-iteration optimizer
# state, the SURVEY.md §5 recommended equivalent of max_cpu_time bounds)
# ---------------------------------------------------------------------------

def save_checkpoint(path, control, extra=None):
    """Atomic JSON checkpoint of the control vector + optimizer metadata."""
    tmp = path + ".tmp"
    payload = {"control": np.asarray(control).tolist(),
               "extra": extra or {}}
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path) as f:
        payload = json.load(f)
    return np.asarray(payload["control"]), payload.get("extra", {})


# ---------------------------------------------------------------------------
# quantum-state serialization (the reference round-trips site sets and MPS
# via ITensor streams + the custom BH_sites::read that infers d,
# /root/reference/include/BH_sites.h:39-53; here: one npz per state pair,
# covering all three engine state layouts)
# ---------------------------------------------------------------------------

def save_states(path, psi_i, psi_f, meta: dict):
    """Atomic npz of the boundary states + a JSON metadata fingerprint.

    Accepts plain MPS arrays (L, chi, p, chi), sector vectors (ns,), or
    VidalState pytrees (saved as B/lam pairs). `meta` is the problem
    fingerprint (L, d, npart, chi, engine, u endpoints, dtype) checked by
    load_states — a stale cache must never silently feed wrong physics.
    """
    arrays = {}
    for name, s in (("psi_i", psi_i), ("psi_f", psi_f)):
        if hasattr(s, "B") and hasattr(s, "lam"):  # VidalState
            arrays[name + "_B"] = np.asarray(s.B)
            arrays[name + "_lam"] = np.asarray(s.lam)
        else:
            arrays[name] = np.asarray(s)
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=json.dumps(meta, sort_keys=True), **arrays)
    os.replace(tmp, path)


def load_states(path, meta: dict):
    """Load a save_states npz; returns (psi_i, psi_f) or None when the
    file is absent or its fingerprint doesn't match `meta`."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if json.loads(str(z["__meta__"])) != json.loads(
                json.dumps(meta, sort_keys=True)):
            return None
        out = []
        for name in ("psi_i", "psi_f"):
            if name in z.files:
                out.append(z[name])
            else:
                from .vidal import VidalState
                out.append(VidalState(B=z[name + "_B"],
                                      lam=z[name + "_lam"]))
    return tuple(out)
