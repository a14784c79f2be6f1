"""Trotter gate construction for the Bose-Hubbard propagator.

Replaces the reference's ITensor BondGate machinery
(/root/reference/src/BH_tDMRG.cpp:18-108) with dense matrices:

  * J-gates exp(-i dt h_bond) built once via eigendecomposition of the real
    symmetric two-site hopping Hamiltonian (constant during optimization,
    mirroring initJGates at src/BH_tDMRG.cpp:18).
  * U-gates are diagonal single-site phase vectors
    exp(-0.25 * u * dt * i * n(n-1)), recomputed per step from the control
    (mirroring initUGates at src/BH_tDMRG.cpp:74-108).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..sites import hop_two_site, nn1_diag

__all__ = ["j_gate", "u_phases"]


def j_gate(J: float, d: int, dt: float, dtype=np.complex128) -> np.ndarray:
    """Two-site gate exp(-i * dt * h) for h = -J (A Adag + Adag A).

    Returns a (p^2, p^2) unitary, p = d+1. Computed on host with numpy once
    per stepper; the backward gate is the elementwise conjugate since h is
    real symmetric.
    """
    h = hop_two_site(J, d)
    w, v = np.linalg.eigh(h)
    g = (v * np.exp(-1j * dt * w)) @ v.T
    return g.astype(dtype)


def u_phases(u, dt, nn1: jnp.ndarray) -> jnp.ndarray:
    """Diagonal half-step interaction phases exp(-0.25 * u * dt * i * n(n-1)).

    `nn1` is the n(n-1) diagonal (sites.nn1_diag). Matches the exponent at
    src/BH_tDMRG.cpp:85-86. Traced in `u` so it stays inside jit.
    """
    return jnp.exp(-0.25j * u * dt * nn1)


def nn1_array(d: int) -> np.ndarray:
    """Convenience re-export of the n(n-1) diagonal."""
    return nn1_diag(d)
