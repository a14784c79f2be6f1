"""Quadratic bound-penalty wrapper for derivative-free optimization.

Rebuild of OCWrapper (/root/reference/main/AmoebaOpt.cpp:13-52): wraps the
control cost with a quadratic penalty on path-constraint violations of the
*converted* control,

    P(c) = gammaBound * sum_i [ (u_i - uMax)_+^2 + (uMin - u_i)_+^2 ],

with the reference defaults uMin=2, uMax=100, gammaBound=100
(AmoebaOpt.cpp:41,117).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bound_penalty", "make_penalized_cost"]


def bound_penalty(u, u_min: float = 2.0, u_max: float = 100.0,
                  gamma_bound: float = 100.0):
    over = jnp.maximum(u - u_max, 0.0)
    under = jnp.maximum(u_min - u, 0.0)
    return gamma_bound * (jnp.sum(over * over) + jnp.sum(under * under))


def make_penalized_cost(cost_fn, convert_control=None, u_min: float = 2.0,
                        u_max: float = 100.0, gamma_bound: float = 100.0):
    """cost_fn(x) -> scalar; convert_control(x) -> u (identity if None).
    Returns f(x) = cost_fn(x) + penalty(u(x)) (AmoebaOpt.cpp:44-51)."""
    def f(x):
        u = convert_control(x) if convert_control is not None else x
        return cost_fn(x) + bound_penalty(u, u_min, u_max, gamma_bound)
    return f
