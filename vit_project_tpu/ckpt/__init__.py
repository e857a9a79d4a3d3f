from . import serialization, clip_ckpt, vit_ckpt  # noqa: F401
