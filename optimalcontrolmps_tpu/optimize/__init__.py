from .lbfgs import minimize_lbfgs, LBFGSResult  # noqa: F401
from .nelder_mead import minimize_nelder_mead, NelderMeadResult  # noqa: F401
from .interior_point import minimize_interior_point, IPResult  # noqa: F401
from .penalty import bound_penalty, make_penalized_cost  # noqa: F401
from .newton import minimize_newton, NewtonResult  # noqa: F401
