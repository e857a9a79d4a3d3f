"""CLIP ModifiedResNet visual tower (the RN50 family), TPU-native.

The reference's CLIPHBA defaults to ``backbone_name='RN50'``
(new_cvpr_train_behavior_things_pipeline.py:269) and loads it through its
clip_hba fork of OpenAI CLIP (load_clip_to_cpu, :251-265); the RN50-path
unfreezers (:552-581) act on ``visual.layer3 / layer4 / attnpool``; the
entry scripts set ``pos_embedding=False`` for RN50
(cvpr_train_behavior_things_pipeline_baseline.py:757-758). That external
fork is not in the reference tree, so — like the BPE tokenizer — this
module rebuilds the public ModifiedResNet architecture natively rather
than translating torch code:

- NHWC activations and HWIO kernels end-to-end (the TPU conv engine's
  native layout; torch checkpoints are NCHW/OIHW and are transposed once
  at conversion time in models/convert.py);
- BatchNorm is a pure function of the stored running statistics. This is
  *exactly* the reference semantics, not an approximation: CLIPHBA.forward
  forces ``clip_model.eval()`` even mid-training
  (new_cvpr_train_behavior_things_pipeline.py:288-289), so running stats
  never update there either. The affine (scale, bias) leaves remain
  trainable — the unfreezers expose them to the optimizer;
- the anti-aliasing rect-2 average pools (stem + strided bottlenecks) are
  reshape-means, which XLA fuses into the surrounding elementwise work
  instead of emitting reduce_window;
- attention pooling computes ONLY the mean-token query row
  ([B,1,C] x [B,HW+1,C]) instead of materializing all HW+1 attention rows
  the way torch's F.multi_head_attention_forward does before discarding
  everything but row 0 — identical output, ~50x less attention work at
  the 7x7 output grid.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import nn as vnn

_BN_EPS = 1e-5  # torch BatchNorm2d default


@dataclass(frozen=True)
class ResNetConfig:
    """ModifiedResNet geometry (OpenAI build_model's inferred quantities)."""
    layers: tuple = (3, 4, 6, 3)   # bottleneck counts per stage (RN50)
    width: int = 64                # stem width; stage c widths = width * 2^c
    heads: int = 32                # attnpool heads (= width * 32 // 64)
    image_size: int = 224
    out_dim: int = 1024            # attnpool c_proj output (CLIP embed dim)

    @property
    def feature_dim(self) -> int:  # channels entering attnpool
        return self.width * 32

    @property
    def pool_grid(self) -> int:    # output grid side (5 stride-2 stages)
        return self.image_size // 32


RN50 = ResNetConfig(layers=(3, 4, 6, 3), width=64, heads=32,
                    image_size=224, out_dim=1024)
RN101 = ResNetConfig(layers=(3, 4, 23, 3), width=64, heads=32,
                     image_size=224, out_dim=512)


# ---------------------------------------------------------------------------
# primitives


def _conv(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """NHWC x HWIO 'same'-ish conv (torch padding=k//2 semantics).

    Output stays in x.dtype, like ops.nn.dense: the conv engine accumulates
    in f32 internally either way, and an f32 output would make every
    backward cotangent f32 (slow path) — and trips conv_general_dilated's
    transpose rule, which requires operand/cotangent dtypes to match."""
    k = w.shape[0]
    pad = k // 2
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x: jax.Array, p: dict) -> jax.Array:
    """Inference BatchNorm: the (mean, var) fold happens in f32 once per
    call and XLA hoists it out of the conv fusion as two [C] constants."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + _BN_EPS)
    scale = p["scale"].astype(jnp.float32) * inv
    shift = p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def _avgpool2(x: jax.Array) -> jax.Array:
    """AvgPool2d(2): rect-2 window, stride 2, floor on odd dims (torch)."""
    B, H, W, C = x.shape
    x = x[:, : H // 2 * 2, : W // 2 * 2, :]
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.mean(axis=(2, 4))


def _bottleneck(x: jax.Array, p: dict, stride: int) -> jax.Array:
    """OpenAI Bottleneck: 1x1 -> 3x3 -> (avgpool if stride>1) -> 1x1,
    with an avgpool+1x1+bn shortcut when shape changes."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]), p["bn2"]))
    if stride > 1:
        out = _avgpool2(out)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "down_conv" in p:
        sc = _avgpool2(x) if stride > 1 else x
        sc = _bn(_conv(sc, p["down_conv"]), p["down_bn"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def _attention_pool(x: jax.Array, p: dict, heads: int,
                    use_pos_embedding: bool) -> jax.Array:
    """AttentionPool2d with a single (mean-token) query.

    `use_pos_embedding` mirrors the reference CLIPHBA pos_embedding flag —
    False for RN50 runs (cvpr_..._baseline.py:757) skips the learned
    positional embedding on the pooled sequence.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H * W, C)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    if use_pos_embedding:
        x = x + p["pos"].astype(x.dtype)
    q = vnn.dense(x[:, :1], p["q_w"], p["q_b"])          # [B, 1, C]
    k = vnn.dense(x, p["k_w"], p["k_b"])                 # [B, S, C]
    v = vnn.dense(x, p["v_w"], p["v_b"])
    dh = C // heads
    q = q.reshape(B, 1, heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return vnn.dense(out, p["c_w"], p["c_b"])            # [B, out_dim]


# ---------------------------------------------------------------------------
# forward


def resnet_encode(params: dict, images: jax.Array, cfg: ResNetConfig, *,
                  use_pos_embedding: bool = True,
                  compute_dtype=jnp.float32,
                  remat: bool = False) -> jax.Array:
    """images [B, H, W, 3] -> [B, out_dim] CLIP embeddings.

    The stem is three 3x3 convs (first stride 2) + rect-2 avgpool; the four
    stages halve resolution with the avgpool-before-1x1 trick; attention
    pooling replaces global average pooling. `remat` checkpoints each stage
    (the RN trunk's activation footprint is conv-pyramid shaped, so
    per-stage granularity is the useful lever)."""
    st = params["stem"]
    x = images.astype(compute_dtype)
    x = jax.nn.relu(_bn(_conv(x, st["conv1"], stride=2), st["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, st["conv2"]), st["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, st["conv3"]), st["bn3"]))
    x = _avgpool2(x)

    def stage(x, blocks, stride):
        x = _bottleneck(x, blocks[0], stride)
        for bp in blocks[1:]:
            x = _bottleneck(x, bp, 1)
        return x

    for i in range(4):
        f = lambda x, bl=params[f"layer{i + 1}"], s=(1 if i == 0 else 2): \
            stage(x, bl, s)
        x = jax.checkpoint(f)(x) if remat else f(x)

    out = _attention_pool(x, params["attnpool"], cfg.heads, use_pos_embedding)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# init (random towers for tests / no-weights runs)


def _init_bn(c: int) -> dict:
    return {"scale": jnp.ones(c), "bias": jnp.zeros(c),
            "mean": jnp.zeros(c), "var": jnp.ones(c)}


def _init_conv(key, k: int, cin: int, cout: int) -> jax.Array:
    # He fan-out, like torch's Conv2d default family for ResNets
    std = (2.0 / (k * k * cout)) ** 0.5
    return std * jax.random.normal(key, (k, k, cin, cout), jnp.float32)


def _init_block(key, cin: int, planes: int, stride: int) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(ks[0], 1, cin, planes), "bn1": _init_bn(planes),
        "conv2": _init_conv(ks[1], 3, planes, planes), "bn2": _init_bn(planes),
        "conv3": _init_conv(ks[2], 1, planes, planes * 4),
        "bn3": _init_bn(planes * 4),
    }
    # OpenAI zero-inits bn3.weight so fresh blocks start as identity
    p["bn3"] = dict(p["bn3"], scale=jnp.zeros(planes * 4))
    if stride > 1 or cin != planes * 4:
        p["down_conv"] = _init_conv(ks[3], 1, cin, planes * 4)
        p["down_bn"] = _init_bn(planes * 4)
    return p


def init_resnet_params(key, cfg: ResNetConfig) -> dict:
    w = cfg.width
    ks = jax.random.split(key, 9)
    stem = {
        "conv1": _init_conv(ks[0], 3, 3, w // 2), "bn1": _init_bn(w // 2),
        "conv2": _init_conv(ks[1], 3, w // 2, w // 2), "bn2": _init_bn(w // 2),
        "conv3": _init_conv(ks[2], 3, w // 2, w), "bn3": _init_bn(w),
    }
    params = {"stem": stem}
    cin = w
    for i, n in enumerate(cfg.layers):
        planes = w * (2 ** i)
        stride = 1 if i == 0 else 2
        bkeys = jax.random.split(ks[3 + i], n)
        blocks = [_init_block(bkeys[0], cin, planes, stride)]
        cin = planes * 4
        blocks += [_init_block(bk, cin, planes, 1) for bk in bkeys[1:]]
        params[f"layer{i + 1}"] = blocks
    C = cfg.feature_dim
    std = C ** -0.5
    pk = jax.random.split(ks[7], 5)
    params["attnpool"] = {
        "pos": std * jax.random.normal(pk[0], (cfg.pool_grid ** 2 + 1, C)),
        "q_w": std * jax.random.normal(pk[1], (C, C)), "q_b": jnp.zeros(C),
        "k_w": std * jax.random.normal(pk[2], (C, C)), "k_b": jnp.zeros(C),
        "v_w": std * jax.random.normal(pk[3], (C, C)), "v_b": jnp.zeros(C),
        "c_w": std * jax.random.normal(pk[4], (C, cfg.out_dim)),
        "c_b": jnp.zeros(cfg.out_dim),
    }
    return params
