"""Damped-Newton polish with the exact Hessian.

The final-digits stage of the flagship solve: multistart L-BFGS finds the
basin (strong-Wolfe searches stall near machine-scale gradients), then a
few Newton steps with the engine's exact Hessian (sector.hessian /
engine.hessian — the object the reference feeds IPOPT at eval_h,
src/BH_nlp.cpp:159-205) drive ||g||_inf below optTol=1e-8 quadratically.
Valid when the optimum is interior to the path bounds (u in [2, 100] —
true for every reference config's optimum); bound-active problems use
optimize/interior_point.py instead.

Jittable and vmappable (one lax.while_loop of dense (M, M) solves).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["NewtonResult", "minimize_newton"]


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    grad_norm: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def minimize_newton(fun_grad_hess: Callable, x0, tol: float = 1e-8,
                    max_iter: int = 30, max_ls: int = 25,
                    fun: Callable = None):
    """Minimize f via damped Newton. fun_grad_hess(x) -> (f, g, H).

    Levenberg-regularizes H to PD (same inertia correction as the
    interior-point KKT solve), backtracks on f (Armijo), and stops when
    ||g||_inf < tol or a backtracking search finds no decrease.
    `fun(x) -> f` is an optional cheap objective for the backtracking
    search (one Hessian is O(N_t^2) propagations; a cost is two rollouts).
    """
    from ..ops.matfree import min_eig, solve_spd

    if fun is None:
        fun = lambda xx: fun_grad_hess(xx)[0]

    n = x0.shape[0]
    dtype = x0.dtype
    eye = jnp.eye(n, dtype=dtype)

    f0, g0, _ = fun_grad_hess(x0)
    state = {
        "x": x0, "f": f0, "g": g0,
        "it": jnp.zeros((), jnp.int32),
        "done": jnp.zeros((), jnp.bool_),
        "converged": jnp.max(jnp.abs(g0)) < tol,
    }

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iter)

    def body(s):
        x = s["x"]
        f, g, H = fun_grad_hess(x)
        H = 0.5 * (H + H.T)
        wmin = min_eig(H)
        lam = jnp.maximum(0.0, 1e-12 - wmin) + 1e-14
        dx = solve_spd(H + lam * eye, -g)
        # fall back to steepest descent if the solve went non-descent
        descent = jnp.dot(dx, g) < 0
        dx = jnp.where(descent, dx, -g)
        dphi = jnp.dot(g, dx)

        def ls_body(j, carry):
            a, best_a, found = carry
            fa = fun(x + a * dx)
            ok = fa <= f + 1e-4 * a * dphi
            best_a = jnp.where(ok & (~found), a, best_a)
            return a * 0.5, best_a, found | ok

        _, a, found = jax.lax.fori_loop(
            0, max_ls, ls_body,
            (jnp.ones((), dtype), jnp.zeros((), dtype),
             jnp.zeros((), jnp.bool_)))

        x_n = x + a * dx
        f_n, g_n, _ = fun_grad_hess(x_n)
        gnorm = jnp.max(jnp.abs(g_n))
        converged = gnorm < tol
        return {
            "x": jnp.where(found, x_n, x),
            "f": jnp.where(found, f_n, f),
            "g": jnp.where(found, g_n, g),
            "it": s["it"] + 1,
            "done": converged | (~found),
            "converged": converged & found,
        }

    s = jax.lax.while_loop(cond, body, state)
    return NewtonResult(x=s["x"], f=s["f"],
                        grad_norm=jnp.max(jnp.abs(s["g"])),
                        iterations=s["it"],
                        converged=jnp.max(jnp.abs(s["g"])) < tol)
