"""Primal-dual interior-point solver for the control NLP.

Rebuild of the reference's IPOPT pathway (include/BH_nlp.hpp,
src/BH_nlp.cpp, main/OptimizeRamp.cpp:100-126): minimize J(x) subject to

    box bounds      x in [x_lb, x_ub]^M          (BH_nlp.cpp:47-52, +-20)
    path constraint u(x) = u0 + B x in [g_lb, g_ub]^N  (BH_nlp.cpp:54-60,
                    Umin=2, Umax=100; B = control Jacobian, constant —
                    the reference sets jac_d_constant=yes,
                    main/OptimizeRamp.cpp:107)

Like IPOPT this is *primal-dual*: bound multipliers (z, w) are independent
variables, so dual feasibility is not limited by the mu/s cancellation that
kills pure primal barrier methods at active bounds. Newton steps solve the
reduced KKT system

    [H + Z_lo/S_lo + Z_hi/S_hi + B^T (W_lo/T_lo + W_hi/T_hi) B] dx = rhs

with the engine's exact Hessian H (Levenberg-regularized to PD), a
fraction-to-boundary rule on primal slacks and duals, Armijo backtracking on
the barrier merit, and a monotone Fiacco-McCormick mu schedule with
superlinear decrease (IPOPT's "monotone" mode; the reference selects
"adaptive", which only changes the schedule, not the fixed points).

Everything is one `lax.while_loop` of dense (M x M) solves: jit-compiles
whole, and `vmap` runs thousands of multistart NLPs in lockstep — the
TPU replacement for one IPOPT process per ramp.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["IPResult", "minimize_interior_point"]


class IPResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    kkt_error: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    mu: jnp.ndarray = jnp.nan   # final barrier parameter (warm restarts)


def minimize_interior_point(
        fun_grad_hess: Callable, x0,
        x_lb: float = -20.0, x_ub: float = 20.0,
        B=None, u0=None, g_lb: float = 2.0, g_ub: float = 100.0,
        mu0: float = 0.1, tol: float = 1e-8,
        max_iter: int = 300, frac_to_boundary: float = 0.995,
        kappa_mu: float = 0.2, theta_mu: float = 1.5, fun: Callable = None,
        callback: Callable = None, trust_radius: float = 5.0,
        trust_min: float = 1e-3, trust_max: float = 100.0,
        mu_strategy: str = "monotone"):
    """Minimize f(x) with box + linear path constraints.

    fun_grad_hess(x) -> (f, g, H). B (N, M), u0 (N,): path u = u0 + B x
    (None disables). `fun(x) -> f` is an optional cheap objective used only
    by the merit line search (pass it when the Hessian is expensive — for
    the control problem one Hessian is O(N_t^2) propagations while the cost
    is two rollouts). Jittable; vmap over x0 for batched multistart.

    `callback(it, f, kkt_err0, ls_trials)`: optional per-iteration host
    callback (ordered io_callback), the analogue of IPOPT's
    intermediate_callback that the reference uses to append ProgressCache
    lines every iteration (src/BH_nlp.cpp:291-326). Not supported under
    vmap; leave None for multistart batches.

    mu_strategy: "monotone" (Fiacco-McCormick schedule, the default) or
    "adaptive" — the reference selects IPOPT's `mu_strategy adaptive`
    (main/OptimizeRamp.cpp:106). The adaptive mode sets the barrier from
    the CURRENT average complementarity with a Mehrotra-style centering
    exponent, mu = sigma * compl_avg with sigma = (compl_min /
    compl_avg)^3 clipped to [1e-3, 0.8] — far-from-centered iterates keep
    a large barrier, well-centered ones drop it aggressively —
    safeguarded below by the monotone schedule's floor (tol/11). Both
    modes share the same KKT fixed points; only the path differs.
    """
    if fun is None:
        fun = lambda xx: fun_grad_hess(xx)[0]
    n = x0.shape[0]
    dtype = x0.dtype
    have_path = B is not None
    if have_path:
        B = jnp.asarray(B, dtype)
        u0 = jnp.asarray(u0, dtype)
        npath = B.shape[0]
    else:
        B = jnp.zeros((1, n), dtype)
        u0 = jnp.full((1,), 0.5 * (g_lb + g_ub), dtype)
        npath = 1

    eye = jnp.eye(n, dtype=dtype)

    def slacks(x):
        u = u0 + B @ x
        return x - x_lb, x_ub - x, u - g_lb, g_ub - u

    # strictly interior start (IPOPT's push, BH_nlp starts at 0 which is
    # interior for the reference's bounds)
    margin = 1e-2 * (x_ub - x_lb)
    x_init = jnp.clip(x0, x_lb + margin, x_ub - margin)

    f0, g0, _ = fun_grad_hess(x_init)
    s0 = slacks(x_init)
    mu_init = jnp.asarray(mu0, dtype)
    state = {
        "x": x_init,
        "z_lo": mu_init / s0[0], "z_hi": mu_init / s0[1],
        "w_lo": mu_init / s0[2], "w_hi": mu_init / s0[3],
        "mu": mu_init,
        "f": f0,
        "it": jnp.zeros((), jnp.int32),
        "err0": jnp.asarray(jnp.inf, dtype),
        "done": jnp.zeros((), jnp.bool_),
        "tr": jnp.asarray(trust_radius, dtype),
    }

    def kkt_error(x, z_lo, z_hi, w_lo, w_hi, g, mu):
        s_lo, s_hi, t_lo, t_hi = slacks(x)
        r_d = g - z_lo + z_hi - B.T @ w_lo + B.T @ w_hi
        # IPOPT-style scaling keeps the test meaningful when duals are large
        zsum = (jnp.sum(jnp.abs(z_lo)) + jnp.sum(jnp.abs(z_hi))
                + jnp.sum(jnp.abs(w_lo)) + jnp.sum(jnp.abs(w_hi)))
        nd = 2 * n + 2 * npath
        sd = jnp.maximum(100.0, zsum / nd) / 100.0
        e_d = jnp.max(jnp.abs(r_d)) / sd
        e_c = jnp.maximum(jnp.max(jnp.abs(s_lo * z_lo - mu)),
                          jnp.max(jnp.abs(s_hi * z_hi - mu)))
        e_c = jnp.maximum(e_c, jnp.max(jnp.abs(t_lo * w_lo - mu)))
        e_c = jnp.maximum(e_c, jnp.max(jnp.abs(t_hi * w_hi - mu)))
        return jnp.maximum(e_d, e_c / sd)

    def cond(s):
        return (~s["done"]) & (s["it"] < max_iter)

    def body(s):
        x, mu = s["x"], s["mu"]
        z_lo, z_hi, w_lo, w_hi = s["z_lo"], s["z_hi"], s["w_lo"], s["w_hi"]
        f, g, H = fun_grad_hess(x)
        s_lo, s_hi, t_lo, t_hi = slacks(x)

        # global convergence test at mu = 0 (IPOPT E_0 <= tol)
        err0 = kkt_error(x, z_lo, z_hi, w_lo, w_hi, g, 0.0)
        converged = err0 <= tol

        # barrier update
        if mu_strategy == "adaptive":
            # centering from the current complementarity distribution
            compl = jnp.concatenate([s_lo * z_lo, s_hi * z_hi,
                                     t_lo * w_lo, t_hi * w_hi])
            c_avg = jnp.mean(compl)
            c_min = jnp.min(compl)
            sigma = jnp.clip((c_min / jnp.maximum(c_avg, 1e-30)) ** 3,
                             1e-3, 0.8)
            mu_next = jnp.clip(sigma * c_avg, tol / 11.0, mu0)
        else:
            # monotone Fiacco-McCormick: tighten mu once the barrier
            # subproblem is solved to ~10*mu
            err_mu = kkt_error(x, z_lo, z_hi, w_lo, w_hi, g, mu)
            mu_next = jnp.where(
                err_mu <= 10.0 * mu,
                jnp.maximum(tol / 11.0,
                            jnp.minimum(kappa_mu * mu, mu ** theta_mu)),
                mu)

        # reduced KKT system
        r_d = g - z_lo + z_hi - B.T @ w_lo + B.T @ w_hi
        Sigma_x = z_lo / s_lo + z_hi / s_hi
        Sigma_u = w_lo / t_lo + w_hi / t_hi
        M = H + jnp.diag(Sigma_x) + (B.T * Sigma_u[None, :]) @ B
        # Levenberg regularization to PD (inertia correction); min_eig and
        # solve_spd route through LAPACK on CPU/GPU and through the
        # matmul-only kernels on restricted TPU backends (ops/matfree.py)
        from ..ops.matfree import min_eig, solve_spd
        wmin = min_eig(M)
        lam = jnp.maximum(0.0, 1e-10 - wmin) + 1e-12
        rhs = (-r_d + (mu_next / s_lo - z_lo) - (mu_next / s_hi - z_hi)
               + B.T @ (mu_next / t_lo - w_lo) - B.T @ (mu_next / t_hi - w_hi))
        dx = solve_spd(M + lam * eye, rhs)

        # Levenberg TRUST REGION: nearly singular Hessians (the 201-dim
        # GRAPE NLP: H has a large near-null space) otherwise produce
        # ~1e4-long Newton steps whose merit search collapses to
        # 1e-3 * a_p — stiff-direction progress then crawls with the
        # flat directions (measured: GRAPE T=0.5 stalls at kkt 1e-3
        # without this, converges to 1e-8 in ~200 its with it). Three
        # damping levels: the (inertia-corrected) Newton step; the
        # guaranteed-in-radius lam3 = ||rhs||/tr (since ||dx(lam)|| <=
        # ||rhs||/lam); and their geometric mean. Pick the least-damped
        # step inside the radius — at most 2 extra SPD solves.
        tr = s["tr"]
        ndx1 = jnp.linalg.norm(dx)
        lam3 = jnp.maximum(lam, jnp.linalg.norm(rhs) / tr)
        lam2 = jnp.sqrt(jnp.maximum(lam, 1e-12) * lam3)
        dx2 = solve_spd(M + lam2 * eye, rhs)
        dx3 = solve_spd(M + lam3 * eye, rhs)
        use2 = jnp.linalg.norm(dx2) <= tr
        dx = jnp.where(ndx1 <= tr, dx,
                       jnp.where(use2, dx2, dx3))
        ndx = jnp.linalg.norm(dx)

        dz_lo = mu_next / s_lo - z_lo - (z_lo / s_lo) * dx
        dz_hi = mu_next / s_hi - z_hi + (z_hi / s_hi) * dx
        Bdx = B @ dx
        dw_lo = mu_next / t_lo - w_lo - (w_lo / t_lo) * Bdx
        dw_hi = mu_next / t_hi - w_hi + (w_hi / t_hi) * Bdx

        # fraction-to-boundary: primal on slacks, dual on multipliers
        tau = jnp.maximum(frac_to_boundary, 1.0 - mu_next)

        def max_step(v, dv):
            r = jnp.where(dv < 0, -tau * v / dv, jnp.inf)
            return jnp.minimum(1.0, jnp.min(r))

        a_p = jnp.minimum(jnp.minimum(max_step(s_lo, dx),
                                      max_step(s_hi, -dx)),
                          jnp.minimum(max_step(t_lo, Bdx),
                                      max_step(t_hi, -Bdx)))
        a_d = jnp.minimum(jnp.minimum(max_step(z_lo, dz_lo),
                                      max_step(z_hi, dz_hi)),
                          jnp.minimum(max_step(w_lo, dw_lo),
                                      max_step(w_hi, dw_hi)))

        # Armijo backtracking on the barrier merit along dx
        def phi(xx):
            ff = fun(xx)
            sl, sh, tl, th = slacks(xx)
            bar = (jnp.sum(jnp.log(sl)) + jnp.sum(jnp.log(sh))
                   + jnp.sum(jnp.log(tl)) + jnp.sum(jnp.log(th)))
            return ff - mu_next * bar

        phi0 = phi(x)
        dphi = (g - mu_next / s_lo + mu_next / s_hi
                - B.T @ (mu_next / t_lo) + B.T @ (mu_next / t_hi)) @ dx

        def ls_body(j, carry):
            a, best, found, trials = carry
            ok = phi(x + a * dx) <= phi0 + 1e-4 * a * dphi
            best = jnp.where(ok & (~found), a, best)
            trials = trials + jnp.where(found, 0, 1)
            return a * 0.5, best, found | ok, trials

        # 20 halvings reach a ~ 1e-6 * a_p: long damped directions far
        # from the quadratic region still find an acceptable step
        _, a_good, found, ls_trials = jax.lax.fori_loop(
            0, 20, ls_body,
            (a_p, jnp.zeros((), dtype), jnp.zeros((), jnp.bool_),
             jnp.zeros((), jnp.int32)))
        # if the line search fails (merit non-descent due to dual-driven
        # rhs), fall back to a small safeguarded step
        a_use = jnp.where(found, a_good, 1e-3 * a_p)

        # boundary-aware radius policy: grow only when a (near-)full
        # step ran against the radius; shrink toward what the line
        # search actually accepted; collapse hard on failure
        tr_next = jnp.where(
            ~found, jnp.maximum(0.25 * tr, trust_min),
            jnp.where((a_use >= 0.5) & (ndx >= 0.9 * tr),
                      jnp.minimum(2.0 * tr, trust_max),
                      jnp.where(a_use < 0.5,
                                jnp.clip(jnp.maximum(2.0 * a_use * ndx,
                                                     0.25 * tr),
                                         trust_min, trust_max),
                                tr)))

        if callback is not None:
            from jax.experimental import io_callback
            io_callback(callback, None, s["it"] + 1, f, err0, ls_trials,
                        ordered=True)

        x_n = x + a_use * dx
        z_lo_n = z_lo + a_d * dz_lo
        z_hi_n = z_hi + a_d * dz_hi
        w_lo_n = w_lo + a_d * dw_lo
        w_hi_n = w_hi + a_d * dw_hi

        # IPOPT's kappa-sigma safeguard: keep duals within a factor of mu/s
        sl, sh, tl, th = slacks(x_n)
        ks = 1e10
        z_lo_n = jnp.clip(z_lo_n, mu_next / (ks * sl), ks * mu_next / sl)
        z_hi_n = jnp.clip(z_hi_n, mu_next / (ks * sh), ks * mu_next / sh)
        w_lo_n = jnp.clip(w_lo_n, mu_next / (ks * tl), ks * mu_next / tl)
        w_hi_n = jnp.clip(w_hi_n, mu_next / (ks * th), ks * mu_next / th)

        return {
            "x": jnp.where(converged, x, x_n),
            "z_lo": jnp.where(converged, z_lo, z_lo_n),
            "z_hi": jnp.where(converged, z_hi, z_hi_n),
            "w_lo": jnp.where(converged, w_lo, w_lo_n),
            "w_hi": jnp.where(converged, w_hi, w_hi_n),
            "mu": mu_next,
            "f": f,
            "it": s["it"] + 1,
            "err0": err0,
            "done": converged,
            "tr": jnp.where(converged, tr, tr_next),
        }

    s = jax.lax.while_loop(cond, body, state)
    f_fin, g_fin, _ = fun_grad_hess(s["x"])
    err_fin = kkt_error(s["x"], s["z_lo"], s["z_hi"], s["w_lo"], s["w_hi"],
                        g_fin, 0.0)
    return IPResult(x=s["x"], f=f_fin, kkt_error=err_fin,
                    iterations=s["it"], converged=err_fin <= tol,
                    mu=s["mu"])
