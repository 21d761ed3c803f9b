from . import factors, lm  # noqa: F401
