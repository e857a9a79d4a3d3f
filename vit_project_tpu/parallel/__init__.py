from . import mesh, dist  # noqa: F401
