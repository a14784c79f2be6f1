"""Initial-ramp seed generators.

Rebuild of SeedGenerator (/root/reference/include/SeedGenerator.hpp:11-125).
Two layers:

  * numpy host functions that reproduce the reference's formulas exactly
    (including its accumulating-`a += step` linspace quirk so lengths and
    grids match bit-for-bit behavior);
  * batched JAX variants using a counter-based PRNG (jax.random) so
    thousands of multistart seeds generate on-device — the reference's
    libc rand() (SeedGenerator.hpp:60-64) is replaced, not emulated: only
    the coefficient *distributions* are behavior, not the RNG stream.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "linspace", "generate_range", "sigmoid", "linsigmoid_seed",
    "adiabatic_seed", "random_coeff_seed", "linsigmoid_seed_batch",
    "random_coeff_seed_batch",
]


def linspace(a: float, b: float, n: int) -> np.ndarray:
    """Reference linspace (SeedGenerator.hpp:26-37): accumulates `a += step`
    while a <= b + 1e-7. For well-behaved inputs this yields n points."""
    step = (b - a) / (n - 1)
    out = []
    x = a
    while x <= b + 1e-7:
        out.append(x)
        x += step
    return np.asarray(out, dtype=np.float64)


def generate_range(a: float, b: float, c: float) -> np.ndarray:
    """MATLAB-style a:b:c (SeedGenerator.hpp:39-48)."""
    out = []
    x = a
    while x <= c + 1e-7:
        out.append(x)
        x += b
    return np.asarray(out, dtype=np.float64)


def sigmoid(x, k: float, offset: float) -> np.ndarray:
    """1 / (1 + exp(-k (x - offset))) (SeedGenerator.hpp:50-58)."""
    x = np.asarray(x, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-k * (x - offset)))


def _linsigmoid_from_coeffs(x, a, c, d_, u_start, u_end):
    """Shared formula of linsigmoidSeed (SeedGenerator.hpp:66-95)."""
    xp = np if isinstance(x, np.ndarray) else jnp
    b = u_end - u_start - a * x[-1]
    s1 = 1.0 / (1.0 + xp.exp(-0.7 * (x - 5.0)))
    s2 = 1.0 / (1.0 + xp.exp(0.9 * (x - 93.0)))
    n = x.shape[0]
    if isinstance(x, np.ndarray):
        S = s1.copy()
        S[n // 2:] = s2[n // 2:]
        S[0] = 0.0
        S[-1] = 0.0
    else:
        idx = jnp.arange(n)
        S = jnp.where(idx >= n // 2, s2, s1)
        S = S.at[0].set(0.0).at[-1].set(0.0)
    ramp = a * x + b / (1.0 + xp.exp(-c * (x - d_))) + u_start
    base = (u_end - u_start) / (1.0 + xp.exp(-0.2 * (x - 40.0))) + u_start
    return S * ramp + (1.0 - S) * base


def linsigmoid_seed(u_start: float, u_end: float, length: int,
                    rng: np.random.Generator | None = None) -> np.ndarray:
    """Randomized linear+sigmoid seed (SeedGenerator.hpp:66-95):
    a ~ U(0.01, 0.15), c ~ U(0.06, 0.18), d ~ U(60, 80)."""
    if rng is None:
        rng = np.random.default_rng()
    x = linspace(0.0, 100.0, length)
    a = rng.uniform(0.01, 0.15)
    c = rng.uniform(0.06, 0.18)
    d_ = rng.uniform(60.0, 80.0)
    return _linsigmoid_from_coeffs(x, a, c, d_, u_start, u_end)


def linsigmoid_seed_batch(key, u_start: float, u_end: float, length: int,
                          batch: int) -> jnp.ndarray:
    """(batch, length) array of linsigmoid seeds, generated on device with a
    counter-based PRNG — the multistart data loader."""
    ka, kc, kd = jax.random.split(key, 3)
    a = jax.random.uniform(ka, (batch,), minval=0.01, maxval=0.15)
    c = jax.random.uniform(kc, (batch,), minval=0.06, maxval=0.18)
    d_ = jax.random.uniform(kd, (batch,), minval=60.0, maxval=80.0)
    x = jnp.asarray(linspace(0.0, 100.0, length))
    return jax.vmap(
        lambda ai, ci, di: _linsigmoid_from_coeffs(x, ai, ci, di,
                                                   u_start, u_end))(a, c, d_)


def adiabatic_seed(u_start: float, u_end: float, length: int) -> np.ndarray:
    """Deterministic piecewise sigmoid->exponential ramp
    (SeedGenerator.hpp:97-116)."""
    x = linspace(0.0, 100.0, length)
    p, k, xs, a = 3.5, 1.0 / 3.0, 40.0, 0.01
    low = (p - u_start - a * xs) / (1.0 + np.exp(-k * (x - xs / 2.0))) \
        + u_start + a * x
    high = np.exp(np.log(u_end - p + 1.0) / (100.0 - xs) * (x - xs)) + p - 1.0
    return np.where(x < xs, low, high)


def random_coeff_seed(lo: float, hi: float, n: int,
                      rng: np.random.Generator | None = None) -> np.ndarray:
    """Uniform random vector (SeedGenerator.hpp:118-125)."""
    if rng is None:
        rng = np.random.default_rng()
    return rng.uniform(lo, hi, size=n)


def random_coeff_seed_batch(key, lo: float, hi: float, n: int,
                            batch: int) -> jnp.ndarray:
    return jax.random.uniform(key, (batch, n), minval=lo, maxval=hi)
