"""Engine dispatch: pick the derivative engine matching a stepper.

The framework has two interchangeable compute backends for the same
physics (identical Trotter channel, identical OptimalControl.cpp formulas):

* `engine`  — fixed-rank MPS TEBD (tebd.TEBDStepper states); scales to
  long chains, the rebuild of the reference's only path.
* `sector`  — dense fixed-N GEMM propagation (sector.SectorStepper
  states); orders of magnitude faster whenever the U(1) sector fits on
  chip (the reference's own flagship config is 126-dim — see sector.py).
* `vidal`   — canonical-form (Vidal) MPS with batched brick bond updates
  (TEBDStepper with sweep="vidal", VidalState states); the truncation-
  capable parallel path for long chains (see vidal.py).

All modules export the same function surface (rollout, rollout_final,
costate_rollout, cost, fidelities, gradient, gradient_lowmem, hessian), so
callers write `eng = engine_for(stepper)` once and stay backend-agnostic.
"""

from __future__ import annotations

from .sector import SectorStepper, SECTOR_MAX_DIM


def engine_for(stepper):
    """Return the engine module (`engine`, `sector`, or `vidal`)."""
    from . import engine, sector, vidal
    if isinstance(stepper, SectorStepper):
        return sector
    if getattr(stepper, "sweep", None) == "vidal":
        return vidal
    return engine


def sector_fits(L: int, d: int, npart: int) -> bool:
    """True when the fixed-N sector is small enough for the GEMM engine."""
    from .groundstate import sector_dim
    return sector_dim(L, d, npart) <= SECTOR_MAX_DIM
