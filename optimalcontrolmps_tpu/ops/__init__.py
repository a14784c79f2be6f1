from . import gates, trunc  # noqa: F401
