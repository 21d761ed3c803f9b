from . import distance_transform, image, lines  # noqa: F401
