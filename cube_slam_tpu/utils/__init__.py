from . import geometry, io, padding, profiler  # noqa: F401
