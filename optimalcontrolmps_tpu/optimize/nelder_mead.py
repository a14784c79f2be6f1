"""Nelder-Mead simplex optimizer, batched.

Rebuild of the reference's Amoeba (/root/reference/include/Amoeba.hpp:9-218)
with identical algorithmic constants: reflection rho=1, expansion chi=2,
contraction psi=0.5, shrink sigma=0.5 (Amoeba.hpp:34-37), simplex init with
usual_delta=0.05 / zero_term_delta=2.5e-4 (Amoeba.hpp:31-32), stopping on
maxIter/maxFun=5000 or a tolFun=1e-6 spread (Amoeba.hpp:27-29, 93-104).

Implemented as a `lax.while_loop` over a (n+1, n) simplex so it jits and
vmaps across multistart batches — the derivative-free fallback path.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["NelderMeadResult", "minimize_nelder_mead"]


class NelderMeadResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    iterations: jnp.ndarray
    n_evals: jnp.ndarray
    converged: jnp.ndarray
    cost_history: jnp.ndarray    # (max_iter+1,), tail-filled with best f
    evals_history: jnp.ndarray   # (max_iter+1,), like Amoeba.hpp:211-214


def minimize_nelder_mead(fun: Callable, x0, max_iter: int = 5000,
                         max_fun: int = 5000, tol_fun: float = 1e-6,
                         usual_delta: float = 0.05,
                         zero_term_delta: float = 2.5e-4):
    """Minimize fun(x) -> scalar from x0 (n,). Jittable/vmappable."""
    n = x0.shape[0]
    rho, chi, psi, sigma = 1.0, 2.0, 0.5, 0.5

    # initialize simplex (Amoeba.hpp:68-83)
    def init_vertex(i):
        xi = jnp.where(x0[i] != 0, (1.0 + usual_delta) * x0[i],
                       zero_term_delta)
        return x0.at[i].set(xi)

    verts = jnp.concatenate([x0[None], jax.vmap(init_vertex)(jnp.arange(n))])
    fvals = jax.vmap(fun)(verts)

    def sort(verts, fvals):
        order = jnp.argsort(fvals)
        return verts[order], fvals[order]

    verts, fvals = sort(verts, fvals)

    hist_f = jnp.zeros(max_iter + 1, dtype=fvals.dtype).at[0].set(fvals[0])
    hist_f = hist_f.at[1].set(fvals[0])
    hist_e = jnp.zeros(max_iter + 1, jnp.int32).at[1].set(n + 1)
    state = {
        "v": verts, "f": fvals,
        "it": jnp.ones((), jnp.int32),
        "evals": jnp.asarray(n + 1, jnp.int32),
        "done": jnp.zeros((), jnp.bool_),
        "hist_f": hist_f, "hist_e": hist_e,
    }

    def cond(s):
        return ~s["done"]

    def body(s):
        v, f = s["v"], s["f"]
        # centroid of best n points (Amoeba.hpp:39-46: average of v[0..n-1])
        xbar = jnp.mean(v[:-1], axis=0)
        xr = (1.0 + rho) * xbar - rho * v[-1]
        fxr = fun(xr)
        evals = s["evals"] + 1

        # decision tree (Amoeba.hpp:145-204)
        expand = fxr < f[0]
        xe = (1.0 + rho * chi) * xbar - rho * chi * v[-1]
        fxe = fun(xe)
        use_e = expand & (fxe < fxr)
        evals = evals + jnp.where(expand, 1, 0)

        reflect_mid = (~expand) & (fxr < f[-2])

        contract_out = (~expand) & (~reflect_mid) & (fxr < f[-1])
        xc = (1.0 + psi * rho) * xbar - psi * rho * v[-1]
        fxc = fun(xc)
        use_co = contract_out & (fxc <= fxr)
        evals = evals + jnp.where(contract_out, 1, 0)

        contract_in = (~expand) & (~reflect_mid) & (~contract_out)
        xcc = (1.0 - psi) * xbar + psi * v[-1]
        fxcc = fun(xcc)
        use_ci = contract_in & (fxcc < f[-1])
        evals = evals + jnp.where(contract_in, 1, 0)

        shrink = (contract_out & ~use_co) | (contract_in & ~use_ci)

        # replace worst vertex
        new_x = jnp.where(use_e, xe,
                jnp.where(expand, xr,
                jnp.where(reflect_mid, xr,
                jnp.where(use_co, xc,
                jnp.where(use_ci, xcc, v[-1])))))
        new_f = jnp.where(use_e, fxe,
                jnp.where(expand, fxr,
                jnp.where(reflect_mid, fxr,
                jnp.where(use_co, fxc,
                jnp.where(use_ci, fxcc, f[-1])))))
        v1 = v.at[-1].set(new_x)
        f1 = f.at[-1].set(new_f)

        # shrink toward v[1] (Amoeba.hpp:85-91 shrinks toward v.at(1))
        sv = v[1][None] + sigma * (v - v[1][None])
        sf = jax.vmap(fun)(sv)
        sv = sv.at[0].set(v[0])  # index 0 untouched in loop from 1
        sf = sf.at[0].set(f[0])
        evals = evals + jnp.where(shrink, n, 0)

        v2 = jnp.where(shrink, sv, v1)
        f2 = jnp.where(shrink, sf, f1)
        v2, f2 = sort(v2, f2)

        it = s["it"] + 1
        spread = jnp.max(jnp.abs(f2[0] - f2[1:]))
        done = (spread <= tol_fun) | (it >= max_iter) | (evals >= max_fun)
        hist_f = s["hist_f"].at[it].set(f2[0])
        hist_e = s["hist_e"].at[it].set(evals)
        return {"v": v2, "f": f2, "it": it, "evals": evals, "done": done,
                "hist_f": hist_f, "hist_e": hist_e}

    s = jax.lax.while_loop(cond, body, state)
    spread = jnp.max(jnp.abs(s["f"][0] - s["f"][1:]))
    # fill the tail with the final values (Amoeba.hpp:211-214)
    idx = jnp.arange(max_iter + 1)
    hist_f = jnp.where(idx > s["it"], s["f"][0], s["hist_f"])
    hist_e = jnp.where(idx > s["it"], s["evals"], s["hist_e"])
    return NelderMeadResult(x=s["v"][0], f=s["f"][0], iterations=s["it"],
                            n_evals=s["evals"],
                            converged=spread <= tol_fun,
                            cost_history=hist_f, evals_history=hist_e)
