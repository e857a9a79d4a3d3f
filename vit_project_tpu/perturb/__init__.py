from . import injectors, windows  # noqa: F401
