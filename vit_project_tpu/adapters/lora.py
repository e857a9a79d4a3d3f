"""LoRA adapter (additive low-rank).

Present for API parity: the reference ships LoRALayer / apply_lora_to_ViT /
unfreeze_lora_layers (new_cvpr_train_behavior_things_pipeline.py:307-404) although
every entry point applies DoRA only. Reference quirks kept: BOTH lora_A and lora_B
are kaiming-uniform initialized (so the adapter perturbs the model from step 0,
ref :321-323), and dropout is applied to the activations feeding the low-rank path
(ref :328).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.dora import _kaiming_uniform


def lora_init(key: jax.Array, in_features: int, out_features: int,
              r: int) -> dict:
    """(alpha is NOT baked in here — the alpha/r scaling is applied at
    call time by lora_linear/lora_merged_weight, matching the reference's
    LoRALayer which stores it as a module attribute, ref :317.)"""
    ka, kb = jax.random.split(key)
    return {
        "lora_A": _kaiming_uniform(ka, (r, out_features)),
        "lora_B": _kaiming_uniform(kb, (in_features, r)),
    }


def lora_linear(x: jax.Array, base_w: jax.Array, base_b: jax.Array | None,
                lora: dict, *, alpha: int, r: int, dropout_p: float = 0.0,
                dropout_key: jax.Array | None = None,
                deterministic: bool = True) -> jax.Array:
    """y = x @ W + b + dropout(x) @ B @ A * (alpha/r)."""
    scaling = alpha / r
    y = jnp.dot(x, base_w.astype(x.dtype), preferred_element_type=jnp.float32)
    if base_b is not None:
        y = y + base_b.astype(jnp.float32)
    xd = x
    if not deterministic and dropout_p > 0.0:
        if dropout_key is None:  # same explicit error as ops/dora.py
            raise ValueError("lora_linear with dropout_p > 0 and "
                             "deterministic=False requires a dropout_key")
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_p, x.shape)
        xd = jnp.where(keep, x / (1.0 - dropout_p), 0.0)
    low = jnp.dot(jnp.dot(xd, lora["lora_B"].astype(x.dtype),
                          preferred_element_type=jnp.float32).astype(x.dtype),
                  lora["lora_A"].astype(x.dtype),
                  preferred_element_type=jnp.float32) * scaling
    return (y + low).astype(x.dtype)


def lora_merged_weight(base_w: jax.Array, lora: dict, *, alpha: int,
                       r: int) -> jax.Array:
    """Merged [in, out] weight (the reference LoRALayer.weight property)."""
    return base_w + jnp.dot(lora["lora_B"], lora["lora_A"],
                            preferred_element_type=jnp.float32) * (alpha / r)
