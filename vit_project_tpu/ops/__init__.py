from . import nn, attention, dora, rsa  # noqa: F401
