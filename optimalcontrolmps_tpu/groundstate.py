"""Ground-state preparation for the Bose-Hubbard chain.

Rebuild of InitializeState (/root/reference/include/InitializeState.hpp:
18-117), which runs ITensor DMRG in the fixed particle-number sector. For the
problem sizes where optimal control is actually run (L <= ~12) the symmetric
sector is tiny (L=5, Npart=5, d=4 => 126 states), so we diagonalize the
sector Hamiltonian *exactly* — this reproduces the DMRG target to machine
precision instead of 1e-9 sweeps — then convert to a padded MPS.

For long chains a JAX DMRG lives in dmrg.py (two-site sweeps with Lanczos).

Hamiltonian (InitializeState.hpp:42-50):
    H = -J sum_i (a_i adag_{i+1} + adag_i a_{i+1}) + U/2 sum_i n_i(n_i-1)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import mps as mpslib
from .sites import op


@lru_cache(maxsize=64)
def sector_basis(L: int, d: int, npart: int) -> tuple:
    """All occupation tuples with sum = npart, each n_i <= d, in
    lexicographic order (site 0 most significant).

    Returns (states, flat) where states is an int array (nstates, L) and
    flat holds each state's full-space basis index. Host-side combinatorics
    (the data-loading step feeding exact diag); delegates to the native C++
    kernels (native/ocmps_native.cpp) when built, with this pure-Python
    fallback.
    """
    try:
        from . import native
        out = native.sector_basis(L, d, npart)
    except Exception:
        out = None
    if out is not None:
        states_n, flat_n = out
        return states_n.astype(np.int64), flat_n

    states = []

    def rec(prefix, remaining, sites_left):
        if sites_left == 0:
            if remaining == 0:
                states.append(tuple(prefix))
            return
        lo = max(0, remaining - d * (sites_left - 1))
        hi = min(d, remaining)
        for n in range(lo, hi + 1):
            rec(prefix + [n], remaining - n, sites_left - 1)

    rec([], npart, L)
    arr = np.array(states, dtype=np.int64)
    p = d + 1
    # full-space flat index of each sector state (row-major, site 0 slowest)
    weights = p ** np.arange(L - 1, -1, -1)
    flat = arr @ weights
    return arr, flat


def sector_hamiltonian(L: int, d: int, npart: int, J: float, U: float) -> np.ndarray:
    """Dense Hamiltonian restricted to the fixed-N sector. Uses the native
    C++ COO assembly when available (18 s for a 1.2M-state sector vs
    unusable in Python); pure-Python fallback below."""
    try:
        from . import native
        coo = native.sector_hamiltonian_coo(L, d, npart, J, U)
    except Exception:
        coo = None
    if coo is not None:
        r, c, v, n = coo
        H = np.zeros((n, n), dtype=np.float64)
        np.add.at(H, (r, c), v)
        return H

    states, _ = sector_basis(L, d, npart)
    ns = len(states)
    lookup = {tuple(s): k for k, s in enumerate(states)}
    H = np.zeros((ns, ns), dtype=np.float64)
    n = np.arange(d + 1, dtype=np.float64)
    for k, s in enumerate(states):
        # interaction
        H[k, k] += 0.5 * U * float(np.sum(s * (s - 1.0)))
        # hopping: -J (a_i adag_{i+1} + h.c.)
        for i in range(L - 1):
            ni, nj = s[i], s[i + 1]
            # a_i adag_{i+1}: |ni-1, nj+1>
            if ni >= 1 and nj + 1 <= d:
                t = list(s)
                t[i] -= 1
                t[i + 1] += 1
                kk = lookup[tuple(t)]
                H[kk, k] += -J * np.sqrt(ni) * np.sqrt(nj + 1)
            # adag_i a_{i+1}
            if nj >= 1 and ni + 1 <= d:
                t = list(s)
                t[i] += 1
                t[i + 1] -= 1
                kk = lookup[tuple(t)]
                H[kk, k] += -J * np.sqrt(nj) * np.sqrt(ni + 1)
    return H


def ground_statevector(L: int, d: int, npart: int, J: float, U: float) -> np.ndarray:
    """Exact sector ground state embedded in the full p**L space."""
    states, flat = sector_basis(L, d, npart)
    H = sector_hamiltonian(L, d, npart, J, U)
    w, v = np.linalg.eigh(H)
    g = v[:, 0]
    # fix global phase: make the largest-magnitude amplitude real positive
    k = int(np.argmax(np.abs(g)))
    g = g * np.sign(g[k])
    p = d + 1
    full = np.zeros(p ** L, dtype=np.complex128)
    full[flat] = g
    return full


def sector_dim(L: int, d: int, npart: int) -> int:
    """Number of occupation configurations with sum npart, each <= d
    (dynamic programming — no enumeration)."""
    counts = np.zeros(npart + 1, dtype=np.int64)
    counts[0] = 1
    for _ in range(L):
        new = np.zeros_like(counts)
        for n in range(npart + 1):
            new[n] = counts[max(0, n - d):n + 1].sum()
        counts = new
    return int(counts[npart])


# exact diagonalization is used below this sector dimension; above it the
# JAX DMRG (dmrg.py) takes over — the same dispatch a user of the reference
# gets implicitly (ITensor DMRG handles every size; our exact path is a
# strict accuracy upgrade where affordable)
EXACT_DIAG_MAX_DIM = 20_000


def initialize_state(L: int, d: int, npart: int, J: float, U: float,
                     chi: int, dtype=None, method: str = "auto",
                     n_sweeps: int = 8):
    """Ground-state MPS — the rebuild of InitializeState(sites,Npart,J,U)
    (InitializeState.hpp:18-117). Returns a padded (L, chi, p, chi) MPS.

    method: "auto" (exact diag if the symmetric sector fits, else DMRG),
    "exact", or "dmrg".
    """
    import jax.numpy as jnp
    if dtype is None:
        dtype = jnp.complex128
    if method == "auto":
        method = ("exact" if sector_dim(L, d, npart) <= EXACT_DIAG_MAX_DIM
                  else "dmrg")
    if method == "exact":
        vec = ground_statevector(L, d, npart, J, U)
        return mpslib.from_statevector(vec, L, d + 1, chi, dtype=dtype)
    from . import dmrg as dmrglib
    A, _ = dmrglib.dmrg_ground_state(L, d, npart, J, U, chi,
                                     n_sweeps=n_sweeps, dtype=dtype)
    return A
