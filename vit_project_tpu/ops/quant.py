"""Int8 inference quantization for the serving path.

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 peak
(394 TOPS vs 197 TFLOPs), and a ViT forward is ~98% dense-layer MACs
(qkv/out/fc1/fc2 — attention scores are O(S^2 D) vs the blocks' O(S D^2)),
so quantizing just the four block matmuls captures nearly all of it.

Scheme (the standard production-serving recipe, e.g. AQT / "w8a8 dynamic"):
- weights: symmetric per-OUTPUT-CHANNEL int8 (`quantize_weight`), computed
  once offline — each output column gets its own scale so one outlier
  column cannot crush the rest of the matrix's resolution;
- activations: symmetric dynamic per-ROW int8 (`int8_dense`) — the scale is
  max|x| of each token's feature vector, computed on the fly (a cheap
  row-reduce XLA fuses into the quantize), so no calibration set is needed;
- accumulation: int32 inside the MXU (`preferred_element_type`), then ONE
  f32 rescale by (row_scale x col_scale) fused into the epilogue.

Training never sees this path (round() has no useful gradient): these are
serving-only transforms applied to a finished checkpoint, composed with
adapters.dora.bake (bake first, then quantize the baked weights). The
reference has no quantized inference path at all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_QKEYS = ("qkv_w", "out_w", "fc1_w", "fc2_w")


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_weight(w) -> dict:
    """[in, out] float weight -> {"q": int8 [in, out], "s": f32 [out]}
    (symmetric per-output-channel)."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, _EPS)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_weight(wq: dict) -> jax.Array:
    return wq["q"].astype(jnp.float32) * wq["s"]


def int8_dense(x: jax.Array, wq: dict, b: jax.Array | None = None):
    """x @ dequant(wq) (+ b) computed as an int8 MXU matmul.

    Per-row dynamic activation quantization; output stays in x.dtype like
    ops.nn.dense (bf16 on the hot path)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     _EPS)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq["q"],
                            (((xq.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * (sx * wq["s"])).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def quantize_vit_blocks(params: dict) -> dict:
    """Quantize the four dense weights of every transformer block in a
    ViT/CLIP-tower param tree (models.vit layout). Everything else — patch
    embed, positional/CLS, LayerNorms, biases, head/proj — stays float:
    together they are ~2% of the forward FLOPs and some (LN, softmax) need
    the precision. MoE blocks are left untouched (expert dispatch is not
    wired for int8). Returns a new tree; the input is not modified."""
    out = dict(params)
    blocks = []
    for bp in params["blocks"]:
        if "moe" in bp:
            blocks.append(bp)
            continue
        nbp = dict(bp)
        for k in _QKEYS:
            nbp[k] = quantize_weight(bp[k])
        blocks.append(nbp)
    out["blocks"] = blocks
    return out


def quantize_clip_blocks(clip_params: dict) -> dict:
    """quantize_vit_blocks applied to BOTH CLIP towers (the text tower's
    blocks share the visual block layout — encode_text reuses vit._block_fn).
    Bake adapters first (adapters.dora.bake), then quantize the baked tree."""
    out = dict(clip_params)
    if "blocks" in clip_params["visual"]:
        out["visual"] = quantize_vit_blocks(clip_params["visual"])
    # else: an RN (ModifiedResNet) conv tower — int8 is wired for the dense
    # transformer-block weights only, so the conv trunk stays float and just
    # the text tower quantizes
    out["text"] = quantize_vit_blocks(clip_params["text"])
    return out
