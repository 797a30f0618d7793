from . import grid_sample, camera, posenc  # noqa: F401
