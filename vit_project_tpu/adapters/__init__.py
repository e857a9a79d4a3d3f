from . import dora, lora, finetune  # noqa: F401
