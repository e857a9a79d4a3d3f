from . import prng, configs, logs, csvio  # noqa: F401
