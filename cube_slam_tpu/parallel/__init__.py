from . import mesh, sharded_lm  # noqa: F401
