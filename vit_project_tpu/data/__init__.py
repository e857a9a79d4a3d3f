from . import spose66  # noqa: F401
