"""Core neural-net ops, written MXU-first.

Design rules (see /opt/skills/guides/pallas_guide.md and the scaling-book recipe):
- params live in float32; activations are computed in a configurable compute dtype
  (bfloat16 on TPU) with float32 accumulation via ``preferred_element_type``.
- patch embedding is a single big matmul (conv with stride == kernel == patch size is
  exactly a reshape + matmul), which tiles perfectly onto the 128x128 MXU.
- elementwise ops (GELU, LayerNorm, bias adds) are left to XLA fusion; the flash
  attention kernel lives in ops/attention.py.

These replace the reference's reliance on cuDNN/cuBLAS under torch nn.Modules
(the reference has no native source of its own; SURVEY.md section 2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def round_up_multiple(x: int, m: int) -> int:
    """Smallest multiple of m >= x (the tile/sublane alignment helper shared
    by the pallas kernels — one definition, not one per kernel file)."""
    return ((x + m - 1) // m) * m


def trunc_normal(key, shape, std: float = 0.02) -> jax.Array:
    """timm-style truncated-normal init (the one shared by every dense and
    MoE weight in models/vit.py and ops/moe.py — keep them identical so a
    1-expert MoE block is statistically the dense block)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                             jnp.float32)


# Trace-time opt-in: route dense's backward through the fused dW+db Pallas
# kernel (ops/fused_dw.py). Read when a step is TRACED, not when it runs —
# set it (ViTTrainConfig.fused_dw does) before the first step executes.
_DW_FUSED = False


def set_dense_dw_fused(on: bool) -> None:
    global _DW_FUSED
    _DW_FUSED = bool(on)


def dense(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """x @ w (+ b). w is [in, out].

    The output stays in x.dtype (bf16 on the hot path): the MXU always
    accumulates in f32 internally and rounds on output, and keeping the output
    (and therefore every backward cotangent) in bf16 keeps the backward matmuls
    on the fast MXU path — an f32 cotangent would silently turn them into
    multi-pass f32 matmuls (~3-6x slower).

    Quantized weights ({"q": int8, "s": f32} from ops.quant.quantize_weight)
    dispatch to the int8 MXU path — every dense call site (blocks, MLP,
    patch embed, heads) serves quantized checkpoints with no caller changes.
    """
    if isinstance(w, dict):
        from . import quant as _quant
        return _quant.int8_dense(x, w, b)
    if _DW_FUSED and b is not None:
        from . import fused_dw as _fdw
        return _fdw.dense_dw_fused(x, w, b)
    y = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in f32 for stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches torch.nn.GELU default used by timm ViT."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximate GELU. ~15% faster fwd+bwd on v5e than erf (the erf
    backward is transcendental-heavy); numerically within 1e-3 of exact."""
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x: jax.Array) -> jax.Array:
    """QuickGELU x * sigmoid(1.702 x) — the activation used by OpenAI CLIP."""
    return x * jax.nn.sigmoid(1.702 * x)


def mlp(x: jax.Array, p: dict, act=gelu) -> jax.Array:
    """Transformer MLP block: dense -> act -> dense."""
    h = dense(x, p["fc1_w"], p["fc1_b"])
    h = act(h)
    return dense(h, p["fc2_w"], p["fc2_b"])


def patch_embed(images: jax.Array, w: jax.Array, b: jax.Array | None,
                patch: int) -> jax.Array:
    """Patchify + embed as ONE matmul (conv stride==kernel==patch).

    images: [B, H, W, 3] -> [B, (H/p)*(W/p), D].
    w: [p*p*3, D] (flattened in (ph, pw, c) order), b: [D] or None.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)           # [B, gh, gw, p, p, C]
    x = x.reshape(B, gh * gw, patch * patch * C)
    return dense(x, w, b)


def patch_embed_affine(images_raw: jax.Array, w: jax.Array,
                       b: jax.Array | None, patch: int, *,
                       mean, std, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Patchify + embed with per-channel input normalization FOLDED INTO the
    patch matrix: ((x/255 - mean)/std) @ W + b  ==  x @ (a*W) + (b + pix_b@W)
    with a_c = 1/(255*std_c), pix_b_c = -mean_c/std_c.

    images_raw: [B, H, W, 3] in raw uint8 scale (uint8 or float 0..255).
    Saves the separate normalize pass over the image tensor AND expresses the
    patchify transpose as einsum labels so XLA folds it into the matmul's
    operand reads instead of materializing a relayout (measured on v5e,
    BENCHLOG.md). Replaces normalize_imagenet + patch_embed on the hot path.
    """
    B, H, W, C = images_raw.shape
    gh, gw = H // patch, W // patch
    D = w.shape[-1]
    a = 1.0 / (255.0 * jnp.asarray(std, jnp.float32))          # [C]
    pix_b = -jnp.asarray(mean, jnp.float32) / jnp.asarray(std, jnp.float32)
    w4 = w.reshape(patch * patch, C, D)
    wf = (w4 * a[None, :, None]).reshape(patch, patch, C, D)
    bias = jnp.einsum("c,pcd->d", pix_b, w4)
    if b is not None:
        bias = bias + b
    x = images_raw.reshape(B, gh, patch, gw, patch, C).astype(compute_dtype)
    t = jnp.einsum("bhpwqc,pqcd->bhwd", x, wf.astype(compute_dtype))
    return (t + bias.astype(compute_dtype)).reshape(B, gh * gw, D)


def conv_kernel_to_patch_matrix(kernel: np.ndarray) -> np.ndarray:
    """Convert a torch conv kernel [D, C, p, p] to our [p*p*C, D] patch matrix.

    The patchify in `patch_embed` flattens each patch in (ph, pw, c) order, so the
    kernel must be permuted to (p, p, C, D) before flattening.
    """
    D, C, ph, pw = kernel.shape
    k = np.transpose(kernel, (2, 3, 1, 0))      # [p, p, C, D]
    return k.reshape(ph * pw * C, D)
