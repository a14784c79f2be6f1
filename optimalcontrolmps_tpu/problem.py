"""High-level optimal-control problem API.

Mirrors the public surface of OptimalControl<BH_tDMRG>
(/root/reference/include/OptimalControl.hpp:37-74) so reference users find
the same methods — getCost, getAnalyticGradient, getHessian,
getFidelityForAllT, getControlJacobian, getControl, getTimeAxis, propagatePsi
— while the implementation stays functional/jitted underneath. GRAPE mode
takes the raw control u(t) (N values); GROUP mode takes basis coefficients c
(M values) and converts through the ControlBasis (src/OptimalControl.cpp:
502-569). `bfgs=True` selects the memory-light gradient path
(src/OptimalControl.cpp:216-229).

The reference's `new_control` memoization protocol (README.md:8) is replaced
by jit caching + explicit aux threading — callers never manage staleness.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import engine
from .backends import engine_for
from .control import ControlBasis
from .tebd import TEBDStepper

__all__ = ["OptimalControlProblem"]


class OptimalControlProblem:
    """GRAPE (basis=None) or GROUP (basis given) optimal-control problem.

    Constructor mirrors the two OptimalControl ctors
    (src/OptimalControl.cpp:8-50).
    """

    def __init__(self, psi_target, psi_init, stepper: TEBDStepper, n_steps=None,
                 basis: ControlBasis | None = None, gamma: float = 0.0,
                 bfgs: bool = False):
        self.psi_target = psi_target
        self.psi_init = psi_init
        self.stepper = stepper
        self.basis = basis
        self.gamma = float(gamma)
        self.bfgs = bool(bfgs)
        if basis is not None:
            self.N = basis.N
            self.M = basis.M
        else:
            assert n_steps is not None, "GRAPE mode needs n_steps"
            self.N = int(n_steps)
            self.M = 0
        self._build()

    # -- jitted kernels ----------------------------------------------------
    def _build(self):
        st, psi_i, psi_f = self.stepper, self.psi_init, self.psi_target
        eng = engine_for(st)  # MPS TEBD or fixed-N sector GEMM backend

        def to_u(x):
            return self.basis.convert_control(x) if self.basis is not None else x

        def _cost(x, gamma):
            return eng.cost(st, psi_i, psi_f, to_u(x), gamma)

        def _fids(x):
            return eng.fidelities(st, psi_i, psi_f, to_u(x))

        grad_fn = eng.gradient_lowmem if self.bfgs else eng.gradient

        def _grad(x, gamma):
            g_u, _ = grad_fn(st, psi_i, psi_f, to_u(x), gamma)
            return (self.basis.convert_gradient(g_u)
                    if self.basis is not None else g_u)

        def _cost_and_grad(x, gamma):
            u = to_u(x)
            g_u, (psi_t, _, _, ov) = grad_fn(st, psi_i, psi_f, u, gamma)
            g = (self.basis.convert_gradient(g_u)
                 if self.basis is not None else g_u)
            fid = (ov * ov.conj()).real
            J = 0.5 * (1.0 - fid) + engine.regularization(u, gamma, st.dt)
            return J, g

        def _hess(x, gamma):
            u = to_u(x)
            H = eng.hessian(st, psi_i, psi_f, u, gamma)
            return (self.basis.convert_hessian(H)
                    if self.basis is not None else H)

        self._cost = jax.jit(_cost)
        self._fids = jax.jit(_fids)
        self._grad = jax.jit(_grad)
        self._cost_and_grad = jax.jit(_cost_and_grad)
        self._hess = jax.jit(_hess)

    # -- reference-parity surface -----------------------------------------
    def get_cost(self, x):
        """getCost (src/OptimalControl.cpp:502-507)."""
        return self._cost(jnp.asarray(x), self.gamma)

    def get_analytic_gradient(self, x):
        """getAnalyticGradient (src/OptimalControl.cpp:511-519)."""
        return self._grad(jnp.asarray(x), self.gamma)

    def get_cost_and_gradient(self, x):
        """Fused production path (one forward + one backward sweep)."""
        return self._cost_and_grad(jnp.asarray(x), self.gamma)

    def get_hessian(self, x):
        """getHessian (src/OptimalControl.cpp:522-556)."""
        return self._hess(jnp.asarray(x), self.gamma)

    def get_fidelity_for_all_t(self, x):
        """getFidelityForAllT (src/OptimalControl.cpp:560-565)."""
        return self._fids(jnp.asarray(x))

    def get_control(self, x):
        """getControl (src/OptimalControl.cpp:180-186)."""
        x = jnp.asarray(x)
        return self.basis.convert_control(x) if self.basis is not None else x

    def get_control_jacobian(self):
        """getControlJacobian (src/OptimalControl.cpp:573-589)."""
        if self.basis is not None:
            return self.basis.jacobian()
        return jnp.eye(self.N)

    def get_time_axis(self):
        """getTimeAxis (src/OptimalControl.cpp:190-201)."""
        return np.arange(self.N) * self.stepper.dt

    def propagate_psi(self, x):
        """propagatePsi (src/OptimalControl.cpp:496-499): full psi_t stack."""
        return engine_for(self.stepper).rollout(
            self.stepper, self.psi_init, self.get_control(jnp.asarray(x)))

    # -- setters for reference parity (OptimalControl.hpp:62-66) ----------
    def set_gamma(self, gamma):
        self.gamma = float(gamma)

    def set_bfgs(self, bfgs: bool):
        if bool(bfgs) != self.bfgs:
            self.bfgs = bool(bfgs)
            self._build()

    def use_bfgs(self) -> bool:
        return self.bfgs

    def grape(self) -> "OptimalControlProblem":
        """A GRAPE view of the same physics (reference setGRAPE(true),
        used in finalize_solution, src/BH_nlp.cpp:258)."""
        return OptimalControlProblem(self.psi_target, self.psi_init,
                                     self.stepper, n_steps=self.N,
                                     basis=None, gamma=self.gamma,
                                     bfgs=self.bfgs)
