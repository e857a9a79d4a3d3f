"""DoRA (Weight-Decomposed Low-Rank Adaptation) — exact reference semantics.

This reproduces the math of the reference DoRALayer
(new_cvpr_train_behavior_things_pipeline.py:407-481) including its two deliberate
deviations from textbook DoRA (SURVEY.md section 0):

1. delta_D_A / delta_D_B are zero-initialized then immediately overwritten with
   kaiming-uniform(a=sqrt(5)) in reset_parameters (ref :443-445) — so at step 0 the
   adapted weight does NOT equal the pretrained weight.
2. Dropout is applied to delta_D (the low-rank *weight update*), not to the
   activations (ref :467-468).

Weight convention: our dense weights are [in, out] (x @ w), which is exactly the
reference's transposed view W.T (ref :418). The direction matrix D has unit-norm
columns over the *in* axis; the trainable magnitude m is per-output-column.

TPU note: the adapted weight depends only on parameters, not activations, so inside a
jitted train step XLA computes it once per step; the column-norm is a [in, out]
reduction fused with the rescale, and the result feeds a standard MXU matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def _kaiming_uniform(key: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """torch nn.init.kaiming_uniform_(a=sqrt(5)) on a 2-D tensor.

    gain = sqrt(2 / (1 + a^2)) = 1/sqrt(3); bound = gain * sqrt(3 / fan_in)
    = 1/sqrt(fan_in), with torch fan_in = shape[1].
    """
    fan_in = shape[1]
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def dora_init(key: jax.Array, w: jax.Array, r: int):
    """Decompose a pretrained [in, out] weight into DoRA parameters.

    Returns (trainable, buffers):
      trainable = {m: [out], delta_D_A: [r, out], delta_D_B: [in, r]}
      buffers   = {D: [in, out]}  (frozen unit-column direction matrix)
    """
    w = w.astype(jnp.float32)
    in_f, out_f = w.shape
    S = jnp.linalg.norm(w, axis=0)                # [out]
    # an all-zero column (pruned head) keeps D at 0 instead of NaN; nonzero
    # columns divide by their exact norm (no epsilon -> torch-oracle parity)
    D = w / jnp.where(S == 0.0, 1.0, S)           # unit-norm columns
    ka, kb = jax.random.split(key)
    trainable = {
        "m": S,
        "delta_D_A": _kaiming_uniform(ka, (r, out_f)),
        "delta_D_B": _kaiming_uniform(kb, (in_f, r)),
    }
    return trainable, {"D": D}


def dora_weight(trainable: dict, D: jax.Array, *, alpha: int, r: int,
                dropout_p: float = 0.0, dropout_key: jax.Array | None = None,
                deterministic: bool = True) -> jax.Array:
    """Adapted [in, out] weight: m * colnorm(D + dropout(B @ A * alpha/r))."""
    scaling = alpha / r
    delta = jnp.dot(trainable["delta_D_B"], trainable["delta_D_A"],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) * scaling
    if not deterministic and dropout_p > 0.0:
        if dropout_key is None:
            raise ValueError(
                "dora_weight: deterministic=False with dropout_p > 0 "
                "requires a dropout_key")
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_p, delta.shape)
        delta = jnp.where(keep, delta / (1.0 - dropout_p), 0.0)
    D_new = D + delta
    norms = jnp.linalg.norm(D_new, axis=0, keepdims=True) + EPS
    return (D_new / norms) * trainable["m"]


def dora_linear(x: jax.Array, trainable: dict, buffers: dict, *, alpha: int,
                r: int, dropout_p: float = 0.0,
                dropout_key: jax.Array | None = None,
                deterministic: bool = True) -> jax.Array:
    """y = x @ W_adapted + bias. buffers: {D: [in,out], bias: [out] or absent}."""
    w = dora_weight(trainable, buffers["D"], alpha=alpha, r=r,
                    dropout_p=dropout_p, dropout_key=dropout_key,
                    deterministic=deterministic)
    # output (and cotangent) stays in x.dtype so backward matmuls stay on the
    # fast MXU path; the adapted-weight computation itself is f32
    y = jnp.dot(x, w.astype(x.dtype))
    if buffers.get("bias") is not None:
        y = y + buffers["bias"].astype(y.dtype)
    return y


def count_params(trainable_tree) -> int:
    """Total trainable parameter count of a DoRA tree (ref expects 183,040 for
    ViT-L/14 with rank 32, 2 vision + 1 text layer)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(trainable_tree))
