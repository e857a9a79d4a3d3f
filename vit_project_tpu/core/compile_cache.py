"""Persistent XLA compilation cache for multi-run drivers.

The sweep / lengths paradigms build a fresh trainer per fork (and the TPU-VM
launchers run each condition as a separate process), so the in-process jit
cache never carries the expensive ViT-L/14 epoch-scan compile (450-650 s cold,
BENCHLOG.md) across runs. JAX's persistent cache keys on the HLO fingerprint —
identical shapes across forks make every run after the first a disk hit.

The reference has no equivalent concern: torch eager re-dispatches cuDNN
kernels per call (clip_train_behavior_sweep.py re-enters
run_behavioral_training 98 times with no compile step at all).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "vit_project_tpu", "xla_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache. Returns the directory, or
    None when disabled (VIT_TPU_NO_COMPILE_CACHE=1) or unsupported.

    Honors VIT_TPU_COMPILE_CACHE_DIR / JAX_COMPILATION_CACHE_DIR overrides.
    Safe to call repeatedly and before or after backend init."""
    if os.environ.get("VIT_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("VIT_TPU_COMPILE_CACHE_DIR")
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: a 98-fork sweep amortizes everything
        # (jax's default threshold is 1.0s, which would skip the small
        # eval/feature/shard programs entirely)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        return None
    return cache_dir
