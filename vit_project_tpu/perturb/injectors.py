"""The four perturbation injectors as pure, jit-able on-device transforms.

Reference semantics (train_model, new_cvpr_train_behavior_things_pipeline.py:
843-982) reproduced exactly in structure:
- per-batch determinism from seed arithmetic perturb_seed + training_run*1000 +
  batch_idx (ref :882,920,939) — here folded into a PRNG key
  (core.prng.batch_perturb_key), so a fork re-running (run, batch) applies the
  identical perturbation;
- perturbations apply AFTER normalization (the reference perturbs tensors that
  have been through ToTensor+Normalize);
- `random_target`: fresh Gaussian targets, N(0,1) for 'normal' or
  N(mean,std) of the target-embedding distribution for 'target' (ref :922-927);
- `label_shuffle`: permute the batch's target rows (shuffle_targets, ref :731-779);
- `uniform_images`: every pixel of the normalized tensor set to 0.5 (ref :904-906);
- `image_noise`: images replaced by N(mean,std) noise with the SAME
  perturb-distribution stats (ref :895-897 with mean/std from :1100-1105).

The ViT-side variants (measure_single_epoch_perturbation_effect.py:36-93) are
dataset/transform-level and live here too as batch transforms + index tables.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.prng import batch_perturb_key  # noqa: F401  (re-export)


# -- CLIP-side (in-loop, keyed per batch) -----------------------------------

# kinds that REPLACE the tower's input images (vs. target-only kinds, which
# leave images untouched): epochs where one of these is active cannot use the
# frozen-prefix activation cache (clip_loop ClipHBATrainer) — the cache was
# built from the clean images
IMAGE_KINDS = frozenset({"uniform_images", "image_noise"})

def random_targets(key: jax.Array, shape, distribution: str, mean: float,
                   std: float) -> jax.Array:
    g = jax.random.normal(key, shape, jnp.float32)
    if distribution == "target":
        g = g * std + mean
    return g


def shuffle_targets(key: jax.Array, targets: jax.Array,
                    valid: jax.Array | None = None) -> jax.Array:
    """Permute the batch's target rows. With a `valid` mask (padded batches),
    only valid rows participate: pad rows sort last so each valid row receives
    a uniformly-random valid row's target (argsort of iid uniforms is a uniform
    permutation, matching the reference's torch.randperm semantics)."""
    if valid is None:
        perm = jax.random.permutation(key, targets.shape[0])
        return targets[perm]
    r = jax.random.uniform(key, (targets.shape[0],))
    r = jnp.where(valid > 0, r, 2.0)
    perm = jnp.argsort(r)
    return targets[perm]


def uniform_images(images: jax.Array) -> jax.Array:
    return jnp.full_like(images, 0.5)


def image_noise(key: jax.Array, images: jax.Array, mean: float,
                std: float) -> jax.Array:
    return jax.random.normal(key, images.shape, images.dtype) * std + mean


def apply_clip_perturbation(perturb_type: str, key: jax.Array,
                            images: jax.Array, targets: jax.Array, *,
                            distribution: str = "target", mean: float = 0.0,
                            std: float = 1.0,
                            valid: jax.Array | None = None):
    """Dispatch (static perturb_type — each epoch's step is compiled per kind)."""
    if perturb_type == "random_target":
        return images, random_targets(key, targets.shape, distribution,
                                      mean, std)
    if perturb_type == "label_shuffle":
        return images, shuffle_targets(key, targets, valid)
    if perturb_type == "uniform_images":
        return uniform_images(images), targets
    if perturb_type == "image_noise":
        return image_noise(key, images, mean, std), targets
    return images, targets


def perturb_distribution_stats(target_embeddings: np.ndarray,
                               distribution: str) -> tuple[float, float]:
    """mean/std used by random_target ('target') and image_noise
    (reference run_behavioral_training :1100-1105)."""
    if distribution == "normal":
        return 0.0, 1.0
    emb = np.asarray(target_embeddings, np.float32)
    return float(np.mean(emb)), float(np.std(emb))


# -- ViT-side (measure_single_epoch_perturbation_effect.py:36-93) ------------

def vit_gaussian_noise(key: jax.Array, images: jax.Array,
                       epsilon: float = 0.1) -> jax.Array:
    """Image replaced by pure noise eps*N(0,1) (GaussianNoiseTransform)."""
    return jax.random.normal(key, images.shape, images.dtype) * epsilon


def vit_uniform_gray(images: jax.Array) -> jax.Array:
    """Image replaced by zeros post-normalization (UniformGrayTransform)."""
    return jnp.zeros_like(images)


def shuffled_label_table(n: int, shuffle_seed: int = 42) -> np.ndarray:
    """ShuffledLabelsDataset: sample i takes the label of shuffled_indices[i],
    fixed permutation from RandomState(seed)."""
    rng = np.random.RandomState(shuffle_seed)
    return rng.permutation(n)


def random_target_table(n: int, num_classes: int = 1000,
                        noise_seed: int = 42) -> np.ndarray:
    """TargetNoiseDataset: one fixed random class per sample."""
    rng = np.random.RandomState(noise_seed)
    return rng.randint(0, num_classes, n)


def apply_vit_perturbation(perturbation_type: str | None, key: jax.Array,
                           images: jax.Array, labels: jax.Array, *,
                           epsilon: float = 0.1,
                           label_override: jax.Array | None = None):
    """Batch-level dispatch. For label perturbations the caller passes
    `label_override` = labels gathered through the fixed tables above (they are
    index-table semantics, not key semantics, in the reference)."""
    if perturbation_type == "gaussian":
        return vit_gaussian_noise(key, images, epsilon), labels
    if perturbation_type == "uniform_gray":
        return vit_uniform_gray(images), labels
    if perturbation_type in ("label_shuffle", "target_noise"):
        return images, label_override
    return images, labels
