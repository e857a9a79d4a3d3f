"""PRNG-key discipline.

The reference pipeline checkpoints five independent stateful RNG streams per epoch
(torch / torch.cuda / numpy / python / DataLoader generator — see reference
Training/functions/new_cvpr_train_behavior_things_pipeline.py:696-728) to get exact
resume. In JAX, all randomness is a pure function of a key, so "all RNG streams"
collapse to a small dict of named keys that is trivially serializable and replayable.
"""
from __future__ import annotations

import jax


def key_from_seed(seed: int) -> jax.Array:
    """Root key from an integer seed."""
    return jax.random.PRNGKey(seed)


def fold(key: jax.Array, *data: int) -> jax.Array:
    """Deterministically derive a subkey by folding integers into `key`."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def batch_perturb_key(perturb_seed: int, training_run: int, batch_idx) -> jax.Array:
    """Per-batch perturbation key.

    Mirrors the reference's per-batch seed arithmetic
    ``perturb_seed + training_run * 1000 + batch_idx`` (reference
    new_cvpr_train_behavior_things_pipeline.py:882,920,939): the perturbation applied
    to a given (run, batch) pair is identical across resumes and forks.

    `batch_idx` may be a traced integer so this works inside jit.
    """
    base = key_from_seed(int(perturb_seed) + int(training_run) * 1000)
    return jax.random.fold_in(base, batch_idx)
