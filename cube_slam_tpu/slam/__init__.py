from . import object_slam  # noqa: F401
