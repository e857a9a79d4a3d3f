from . import figs  # noqa: F401
