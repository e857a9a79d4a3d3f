from . import vit, clip, tokenizer, convert  # noqa: F401
