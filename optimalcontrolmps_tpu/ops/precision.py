"""Matmul-precision policy for the hot contraction paths.

TPU MXU matmuls default to bfloat16 passes. For this physics that is not a
speed/accuracy knob — it is wrong: the flagship cost evaluates ~1600 chained
bond contractions + truncations per rollout, and bf16 passes accumulate to
~1e-2 relative error in the cost (measured on hardware: J off by 9.9e-3
with eigh/qr, NaN with CholeskyQR gauge whose Gram matrix goes indefinite
in bf16 — see tools/probe_tpu_accuracy.py). With float32 3-pass matmuls
("highest") every production variant lands within 6e-6 of the complex128
golden. The reference runs f64 LAPACK throughout (ITensor denmatDecomp),
so f32-highest is the minimum honest precision for parity.

Every public propagator/derivative entry point is wrapped with
`enforce_matmul_precision` so correctness never depends on a global flag
the caller forgot to set. Opt out (for A/B experiments only) with
OCMPS_MATMUL_PRECISION=default.
"""

from __future__ import annotations

import functools
import os

import jax

__all__ = ["enforce_matmul_precision"]

_POLICY = os.environ.get("OCMPS_MATMUL_PRECISION", "highest")


def enforce_matmul_precision(fn):
    """Trace `fn`'s body under the package matmul-precision policy."""
    if _POLICY == "default":
        return fn

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(_POLICY):
            return fn(*args, **kwargs)

    return wrapped
