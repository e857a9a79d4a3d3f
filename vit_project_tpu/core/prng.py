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


def perturb_base_key(perturb_seed: int, training_run: int) -> jax.Array:
    """Per-run perturbation base key — THE single home of the reference's
    seed arithmetic ``perturb_seed + training_run * 1000`` (reference
    new_cvpr_train_behavior_things_pipeline.py:882,920,939). Every consumer
    (the solo epoch scan, the batched multi-fork programs, and
    batch_perturb_key below) derives from this one function, so the
    fork-replay determinism contract cannot drift between them."""
    return key_from_seed(int(perturb_seed) + int(training_run) * 1000)


def batch_perturb_key(perturb_seed: int, training_run: int, batch_idx) -> jax.Array:
    """Per-batch perturbation key: fold_in(perturb_base_key, batch_idx).

    The perturbation applied to a given (run, batch) pair is identical
    across resumes and forks. `batch_idx` may be a traced integer so this
    works inside jit.
    """
    return jax.random.fold_in(perturb_base_key(perturb_seed, training_run),
                              batch_idx)
