from . import clip_loop, vit_loop, schedules  # noqa: F401
