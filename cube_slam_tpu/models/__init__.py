from . import cuboid  # noqa: F401
