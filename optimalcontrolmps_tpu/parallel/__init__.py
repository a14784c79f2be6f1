from .mesh import make_mesh, batch_sharding, row_sharding  # noqa: F401
from .multistart import multistart_lbfgs, make_train_step  # noqa: F401
