from . import dora, lora  # noqa: F401
