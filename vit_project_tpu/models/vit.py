"""Shared Vision-Transformer trunk.

One functional encoder serves both model families the reference uses:
- the OpenAI-CLIP visual tower (ViT-L/14: pre-LN stem `ln_pre`, QuickGELU, no patch
  bias, CLS ln_post + projection) — reference loads it via the external clip_hba
  package (new_cvpr_train_behavior_things_pipeline.py:251-265);
- the timm-style ViT-B/16 classifier (patch bias, exact GELU, final LayerNorm over
  all tokens, CLS head) — reference builds it via timm.create_model
  (train_vit_sgd.py:283) and uses `forward_features` + CLS pooling for RSA
  (measure_single_epoch_perturbation_effect.py:309-322).

Params are plain pytrees (nested dicts / lists), so adapter surgery and checkpoint
conversion are pure tree transformations. Blocks are unrolled Python loops — 12-24
layers compile quickly and run without scan overhead; DoRA-adapted blocks differ
structurally from frozen ones, which unrolling expresses naturally.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import nn as vnn
from ..ops import attention as vattn
from ..ops import dora as vdora


@dataclass(frozen=True)
class ViTConfig:
    patch: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    image_size: int = 224
    pre_norm: bool = False        # CLIP visual tower has ln_pre
    patch_bias: bool = True       # CLIP conv1 has no bias
    quick_gelu: bool = False      # CLIP uses QuickGELU
    gelu_approx: bool = True      # tanh-approx GELU (measured ~15% step win on
                                  # v5e); set False for exact-erf torch parity
    out_dim: Optional[int] = None  # CLIP projection dim (e.g. 768 for ViT-L/14)
    num_classes: Optional[int] = None  # classifier head (timm path)
    # Mixture-of-Experts (beyond-reference; ops/moe.py): > 0 replaces the
    # dense MLP of every `moe_every`-th block with a Switch top-1 MoE of
    # this many experts. 0 = dense everywhere (every reference model).
    moe_experts: int = 0
    moe_every: int = 2             # Switch default: every other block
    moe_capacity: float = 1.25     # per-expert capacity factor
    moe_topk: int = 1              # 1 = Switch routing, 2 = GShard top-2

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1

    def is_moe_block(self, i: int) -> bool:
        """MoE goes in the LAST block of each `moe_every` group (Switch puts
        sparse layers at odd depths; this matches for moe_every=2)."""
        return self.moe_experts > 0 and i % self.moe_every == self.moe_every - 1


VIT_B16 = ViTConfig(patch=16, width=768, layers=12, heads=12, num_classes=1000)

# name registry for CLI surfaces (timm-style names; reference uses
# timm.create_model('vit_base_patch16_224'), train_vit_sgd.py:283)
VIT_CONFIGS = {
    "vit_base_patch16_224": VIT_B16,
    "vit_small_patch16_224": ViTConfig(patch=16, width=384, layers=12, heads=6,
                                       num_classes=1000),
    "vit_large_patch16_224": ViTConfig(patch=16, width=1024, layers=24,
                                       heads=16, num_classes=1000),
    "test-tiny": ViTConfig(patch=8, width=32, layers=2, heads=2,
                           image_size=32, num_classes=10),
}
CLIP_VIT_L14_VISUAL = ViTConfig(patch=14, width=1024, layers=24, heads=16,
                                pre_norm=True, patch_bias=False,
                                quick_gelu=True, out_dim=768)
CLIP_VIT_B32_VISUAL = ViTConfig(patch=32, width=768, layers=12, heads=12,
                                pre_norm=True, patch_bias=False,
                                quick_gelu=True, out_dim=512)
CLIP_VIT_B16_VISUAL = ViTConfig(patch=16, width=768, layers=12, heads=12,
                                pre_norm=True, patch_bias=False,
                                quick_gelu=True, out_dim=512)


_trunc_normal = vnn.trunc_normal


def init_block(key, width: int, mlp_ratio: int, moe_experts: int = 0) -> dict:
    ks = jax.random.split(key, 4)
    hidden = width * mlp_ratio
    p = {
        "ln1": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "qkv_w": _trunc_normal(ks[0], (width, 3 * width)),
        "qkv_b": jnp.zeros(3 * width),
        "out_w": _trunc_normal(ks[1], (width, width)),
        "out_b": jnp.zeros(width),
        "ln2": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
    }
    if moe_experts > 0:
        from ..ops import moe as vmoe
        p["moe"] = vmoe.init_moe_mlp(ks[2], width, hidden, moe_experts)
    else:
        p.update({
            "fc1_w": _trunc_normal(ks[2], (width, hidden)),
            "fc1_b": jnp.zeros(hidden),
            "fc2_w": _trunc_normal(ks[3], (hidden, width)),
            "fc2_b": jnp.zeros(width),
        })
    return p


def init_vit_params(key, cfg: ViTConfig) -> dict:
    ks = jax.random.split(key, cfg.layers + 5)
    # head gets the (previously unused) last key: a config with BOTH out_dim
    # and num_classes must not draw proj and head from the same key
    head_key = ks[cfg.layers + 4]
    p = {
        "patch_w": _trunc_normal(ks[0], (cfg.patch * cfg.patch * 3, cfg.width)),
        "patch_b": jnp.zeros(cfg.width) if cfg.patch_bias else None,
        "cls": _trunc_normal(ks[1], (cfg.width,)),
        "pos": _trunc_normal(ks[2], (cfg.seq_len, cfg.width)),
        "blocks": [init_block(ks[4 + i], cfg.width, cfg.mlp_ratio,
                              cfg.moe_experts if cfg.is_moe_block(i) else 0)
                   for i in range(cfg.layers)],
        "norm": {"scale": jnp.ones(cfg.width), "bias": jnp.zeros(cfg.width)},
    }
    if cfg.pre_norm:
        p["ln_pre"] = {"scale": jnp.ones(cfg.width), "bias": jnp.zeros(cfg.width)}
    if cfg.out_dim is not None:
        p["proj"] = _trunc_normal(ks[3], (cfg.width, cfg.out_dim),
                                  std=cfg.width ** -0.5)
    if cfg.num_classes is not None:
        p["head_w"] = _trunc_normal(head_key, (cfg.width, cfg.num_classes))
        p["head_b"] = jnp.zeros(cfg.num_classes)
    return p


def block_forward(p: dict, x: jax.Array, heads: int, *, quick_gelu: bool,
                  causal: bool = False, adapter: dict | None = None,
                  adapter_cfg: dict | None = None,
                  dropout_key: jax.Array | None = None,
                  deterministic: bool = True,
                  use_pallas: bool | None = None,
                  gelu_approx: bool = False,
                  with_aux: bool = False,
                  moe_capacity: float = 1.25,
                  moe_topk: int = 1,
                  ring: tuple | None = None,
                  head_shard=None) -> jax.Array:
    """Pre-norm transformer block. If `adapter` is given, the attention output
    projection is DoRA-adapted (replaces attn.out_proj, matching the reference's
    apply_dora_to_ViT surgery, new_cvpr...pipeline.py:484-513).

    Blocks whose params carry a "moe" entry (ViTConfig.moe_experts > 0) run the
    Switch MoE FFN (ops/moe.py) in place of the dense MLP; `with_aux=True`
    makes the return a (x, aux_loss) pair (aux is 0 for dense blocks).

    `ring=(mesh, axis, s_valid)` routes the attention core through ring
    attention (parallel/ring.py) — for sequence-parallel trunks whose k/v
    should rotate over ICI instead of all-gathering (vit_encode
    ring_attn=True). Implies the XLA qkv path.

    `head_shard` (parallel/mesh.head_sharding) pins q/k/v and the attention
    output to the Megatron [B('data'), S, H('model'), dh] layout under
    tensor parallelism, so GSPMD keeps the softmax chain heads-sharded
    instead of replicating+repartitioning it (only meaningful on the XLA
    einsum path the tp layout already routes to)."""
    act = (vnn.quick_gelu if quick_gelu
           else (vnn.gelu_tanh if gelu_approx else vnn.gelu))
    h = vnn.layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"])

    B, S, D = h.shape
    dh = D // heads
    # Three separate projections from the packed qkv weight (runtime reshape
    # only — the stored/checkpointed param stays [D, 3D]). q/k/v stay in the
    # packed [B, S, D] layout the dense matmul emits; the attention core
    # treats heads as dh-lane slices, so NO head transpose is ever
    # materialized in HBM (the relayouts cost more than the kernel saves at
    # these shapes — BENCHLOG.md round 2).
    quantized = isinstance(p["qkv_w"], dict)  # ops.quant serving checkpoint
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # Tensor-parallel params store qkv_w head-aligned as [D, 3, D] with the
    # trailing axis model-sharded (shard_vit_params_tp). The pallas branch
    # would flatten it back to [D, 3D] (merging the sharded minor axis) and
    # feed a pallas_call with no GSPMD partitioning rule — both force
    # re-gathers. The layout is statically visible here, so route TP to the
    # XLA path regardless of what the caller asked for.
    use_pallas = (use_pallas and ring is None
                  and (quantized or p["qkv_w"].ndim != 3))
    if quantized:
        # int8 path: ONE packed int8 projection (the quantized weight stays
        # [D, 3D] — per-output-column scales survive any column grouping),
        # then the standard attention core on the bf16 output.
        qkv = vnn.dense(h, p["qkv_w"], p["qkv_b"])  # [B, S, 3D]
        if use_pallas:
            # the packed kernel expects q lanes PRESCALED by 1/sqrt(dh)
            qkv = qkv.at[..., :D].multiply(1.0 / (dh ** 0.5))
            o = vattn.flash_mha_packed_qkv(qkv, num_heads=heads,
                                           causal=causal)
        else:
            q = qkv[..., :D].reshape(B, S, heads, dh)
            k = qkv[..., D:2 * D].reshape(B, S, heads, dh)
            v = qkv[..., 2 * D:].reshape(B, S, heads, dh)
            if ring is not None:
                from ..parallel import ring as vring
                o = vring.ring_attention_bshd(q, k, v, ring[0], ring[1],
                                              s_valid=ring[2], causal=causal)
            else:
                o = vattn.attention_core_bshd(q, k, v, causal=causal,
                                              use_pallas=False)
    elif use_pallas:
        # ONE packed projection [D, 3D] (better MXU shape than 3 separate
        # [D, D] dots; one dW matmul in the backward) with the 1/sqrt(dh)
        # score scale folded into the q columns
        w3 = p["qkv_w"].reshape(D, 3, D)
        b3 = p["qkv_b"].reshape(3, D)
        scale = 1.0 / (dh ** 0.5)
        colscale = jnp.concatenate([jnp.full((D,), scale, jnp.float32),
                                    jnp.ones(2 * D, jnp.float32)])
        qkv = vnn.dense(h, w3.reshape(D, 3 * D) * colscale,
                        b3.reshape(3 * D) * colscale)
        o = vattn.flash_mha_packed_qkv(qkv, num_heads=heads, causal=causal)
    else:
        w3 = p["qkv_w"].reshape(D, 3, D)
        b3 = p["qkv_b"].reshape(3, D)
        q = (jnp.einsum("bsd,dhe->bshe", h,
                        w3[:, 0].reshape(D, heads, dh).astype(h.dtype))
             + b3[0].reshape(heads, dh).astype(h.dtype))
        k = (jnp.einsum("bsd,dhe->bshe", h,
                        w3[:, 1].reshape(D, heads, dh).astype(h.dtype))
             + b3[1].reshape(heads, dh).astype(h.dtype))
        v = (jnp.einsum("bsd,dhe->bshe", h,
                        w3[:, 2].reshape(D, heads, dh).astype(h.dtype))
             + b3[2].reshape(heads, dh).astype(h.dtype))
        if head_shard is not None:
            q = jax.lax.with_sharding_constraint(q, head_shard)
            k = jax.lax.with_sharding_constraint(k, head_shard)
            v = jax.lax.with_sharding_constraint(v, head_shard)
        if ring is not None:
            from ..parallel import ring as vring
            o = vring.ring_attention_bshd(q, k, v, ring[0], ring[1],
                                          s_valid=ring[2], causal=causal)
        else:
            o = vattn.attention_core_bshd(q, k, v, causal=causal,
                                          use_pallas=False)
        if head_shard is not None:
            o = jax.lax.with_sharding_constraint(o, head_shard)
    o = o.reshape(B, S, D)
    if adapter is not None:
        o = vdora.dora_linear(
            o, adapter["trainable"], adapter["buffers"],
            alpha=adapter_cfg["alpha"], r=adapter_cfg["r"],
            dropout_p=adapter_cfg.get("dropout", 0.0),
            dropout_key=dropout_key, deterministic=deterministic)
    else:
        o = vnn.dense(o, p["out_w"], p["out_b"])
    x = x + o

    h = vnn.layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"])
    if "moe" in p:
        from ..ops import moe as vmoe
        h, aux = vmoe.moe_mlp(h, p["moe"], act=act,
                              capacity_factor=moe_capacity, topk=moe_topk)
    else:
        h = vnn.mlp(h, p, act=act)
        aux = jnp.zeros((), jnp.float32)
    x = x + h
    return (x, aux) if with_aux else x


def _seq_parallel_checks(cfg: ViTConfig, seq_shard, ring_attn: bool) -> None:
    """Shared sp/ring argument validation for both encoder trunks."""
    if ring_attn and seq_shard is None:
        raise ValueError("ring_attn=True needs seq_shard (the sequence-"
                         "parallel mesh constraint)")
    if ring_attn and cfg.moe_experts > 0:
        raise ValueError(
            "ring_attn does not compose with MoE blocks: ring padding "
            "tokens would compete for expert capacity and pollute the "
            "aux loss — use the gather sp path (no padding)")


def _seq_parallel_enter(x: jax.Array, seq_shard, ring_attn: bool):
    """Shared sp/ring prologue at the top of the block stack: pad the token
    stream for the ring (padded keys are masked, padded rows sliced off by
    the caller) and apply the first token-sharding constraint. Returns
    (x, ring_tuple_or_None, original_S_or_None)."""
    ring = None
    s_real = None
    if ring_attn:
        from ..parallel import ring as vring
        ring_axis = seq_shard.spec[1]
        x, s_real = vring.pad_seq(x, seq_shard.mesh.shape[ring_axis])
        ring = (seq_shard.mesh, ring_axis, s_real)
    if seq_shard is not None:
        x = jax.lax.with_sharding_constraint(x, seq_shard)
    return x, ring, s_real


def _block_fn(cfg: ViTConfig, adapter_cfg, deterministic, use_pallas,
              remat, with_aux: bool = False, ring: tuple | None = None,
              causal: bool = False, head_shard=None):
    """Per-block callable shared by the encoder trunks (the two visual
    trunks here and the causal text tower in models/clip.py); with
    remat=True each call is wrapped in jax.checkpoint (see vit_encode
    docstring)."""
    def _block(bp, x, ad, dk):
        return block_forward(bp, x, cfg.heads, quick_gelu=cfg.quick_gelu,
                             causal=causal,
                             adapter=ad, adapter_cfg=adapter_cfg,
                             dropout_key=dk, deterministic=deterministic,
                             use_pallas=use_pallas,
                             gelu_approx=cfg.gelu_approx,
                             with_aux=with_aux,
                             moe_capacity=cfg.moe_capacity,
                             moe_topk=cfg.moe_topk,
                             ring=ring, head_shard=head_shard)
    return jax.checkpoint(_block) if remat else _block


def vit_embed(params: dict, images: jax.Array, cfg: ViTConfig, *,
              input_norm: tuple | None = None,
              compute_dtype=jnp.float32) -> jax.Array:
    """The encoder stem: patchify+embed (normalization folded in when
    `input_norm` is given — see vit_encode), CLS concat, positional add,
    optional ln_pre. ONE implementation shared by vit_encode and the GPipe
    pipeline (parallel/pipeline.py _embed) so the two forwards cannot
    drift."""
    if input_norm is not None:
        mean, std = input_norm
        x = vnn.patch_embed_affine(images, params["patch_w"],
                                   params["patch_b"], cfg.patch,
                                   mean=mean, std=std,
                                   compute_dtype=compute_dtype)
    else:
        x = images.astype(compute_dtype)
        x = vnn.patch_embed(x, params["patch_w"], params["patch_b"], cfg.patch)
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"].astype(x.dtype)
    if cfg.pre_norm:
        x = vnn.layer_norm(x, params["ln_pre"]["scale"],
                           params["ln_pre"]["bias"])
    return x


def vit_encode(params: dict, images: jax.Array, cfg: ViTConfig, *,
               adapters: dict | None = None, adapter_cfg: dict | None = None,
               dropout_key: jax.Array | None = None, deterministic: bool = True,
               use_pallas: bool | None = None,
               input_norm: tuple | None = None,
               compute_dtype=jnp.float32, remat: bool = False,
               seq_shard=None, with_aux: bool = False,
               ring_attn: bool = False, head_shard=None) -> jax.Array:
    """images [B, H, W, 3] -> tokens [B, S, width] after the final LayerNorm.

    `adapters` maps block index -> {trainable, buffers} DoRA entries.
    This is the timm `forward_features` contract for the classifier config and
    the pre-ln_post token stream for the CLIP config.

    `input_norm=(mean, std)` marks `images` as RAW uint8-scale: the
    per-channel (x/255 - mean)/std normalization is folded into the patch
    matrix (ops/nn.py patch_embed_affine), removing a full image-tensor pass
    from the hot path. Without it, `images` must already be normalized.

    `remat=True` wraps each block in jax.checkpoint: the backward replays
    each block's forward instead of holding its activations, cutting peak
    HBM from O(layers) to O(1) block activations at ~1/3 extra FLOPs — the
    lever for batch sizes / model widths whose activations outgrow one
    chip's HBM. Gradients are bit-identical (same math, same key threading).

    `seq_shard` (a NamedSharding like P('data', 'model', None) — see
    parallel/mesh.py seq_sharding) turns on Megatron-style SEQUENCE
    parallelism: the [B, S, D] activations are constrained token-sharded at
    every block boundary, so LayerNorm / MLP / projections run on 1/N of the
    tokens per device and GSPMD inserts the k/v gathers that attention's
    token mixing needs (the only place full S is required). Per-device
    activation memory drops ~Nx — the lever for sequence lengths that
    outgrow one chip. Forces the XLA attention path (the pallas kernel has
    no GSPMD partitioning rule over S).

    `with_aux=True` returns (tokens, aux_loss_sum) — the summed MoE
    load-balance losses of any MoE blocks (0.0 for dense models).

    `ring_attn=True` (needs seq_shard) upgrades sequence parallelism to RING
    attention (parallel/ring.py): the token stream is zero-padded to a
    multiple of the sequence axis (padded keys masked, padded rows sliced
    off at the end — attention is the only token-mixing op, so valid tokens
    are exact) and each block's k/v rotate around the ring via ppermute
    instead of all-gathering.
    """
    if seq_shard is not None:
        use_pallas = False
    _seq_parallel_checks(cfg, seq_shard, ring_attn)
    x = vit_embed(params, images, cfg, input_norm=input_norm,
                  compute_dtype=compute_dtype)
    x, ring, s_real = _seq_parallel_enter(x, seq_shard, ring_attn)
    adapters = adapters or {}
    blk = _block_fn(cfg, adapter_cfg, deterministic, use_pallas, remat,
                    with_aux=with_aux, ring=ring, head_shard=head_shard)
    aux_total = jnp.zeros((), jnp.float32)
    for i, bp in enumerate(params["blocks"]):
        ad = adapters.get(i)
        dk = None
        if ad is not None and dropout_key is not None:
            dk = jax.random.fold_in(dropout_key, i)
        if with_aux:
            x, aux = blk(bp, x, ad, dk)
            aux_total = aux_total + aux
        else:
            x = blk(bp, x, ad, dk)
        if seq_shard is not None:
            x = jax.lax.with_sharding_constraint(x, seq_shard)
    if ring_attn and x.shape[1] != s_real:
        x = x[:, :s_real]   # drop the ring padding rows
    out = vnn.layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    return (out, aux_total) if with_aux else out


def vit_classify(params: dict, images: jax.Array, cfg: ViTConfig, *,
                 use_pallas: bool | None = None,
                 input_norm: tuple | None = None,
                 compute_dtype=jnp.float32, remat: bool = False,
                 seq_shard=None, with_aux: bool = False,
                 ring_attn: bool = False, head_shard=None) -> jax.Array:
    """ViT classifier logits [B, num_classes] from the CLS token.

    `seq_shard` / `with_aux` / `ring_attn` / `head_shard` as in vit_encode;
    with_aux=True returns (logits, moe_aux_loss)."""
    tokens = vit_encode(params, images, cfg, use_pallas=use_pallas,
                        input_norm=input_norm, compute_dtype=compute_dtype,
                        remat=remat, seq_shard=seq_shard, with_aux=with_aux,
                        ring_attn=ring_attn, head_shard=head_shard)
    if with_aux:
        tokens, aux = tokens
    cls = tokens[:, 0]
    logits = vnn.dense(cls, params["head_w"], params["head_b"])
    logits = logits.astype(jnp.float32)
    return (logits, aux) if with_aux else logits


def forward_features(params: dict, images: jax.Array, cfg: ViTConfig, *,
                     pool: str = "token", use_pallas: bool | None = None,
                     input_norm: tuple | None = None,
                     compute_dtype=jnp.float32,
                     seq_shard=None, ring_attn: bool = False) -> jax.Array:
    """timm forward_features + pooling, used for ViT RSA embeddings
    (reference compute_rsa_score, measure...effect.py:309-322):
    pool='token' -> CLS token; pool='avg' -> mean of patch tokens.
    `seq_shard`/`ring_attn` as in vit_encode (the RSA forward honors the
    trainer's sequence-parallel mode like every other step)."""
    tokens = vit_encode(params, images, cfg, use_pallas=use_pallas,
                        input_norm=input_norm, compute_dtype=compute_dtype,
                        seq_shard=seq_shard, ring_attn=ring_attn)
    if pool == "avg":
        return tokens[:, 1:].mean(axis=1)
    return tokens[:, 0]


def clip_visual_encode(params: dict, images: jax.Array, cfg: ViTConfig, *,
                       adapters: dict | None = None,
                       adapter_cfg: dict | None = None,
                       dropout_key: jax.Array | None = None,
                       deterministic: bool = True,
                       use_pallas: bool | None = None,
                       use_pos_embedding: bool = True,
                       compute_dtype=jnp.float32,
                       remat: bool = False,
                       seq_shard=None, ring_attn: bool = False) -> jax.Array:
    """CLIP visual tower: trunk -> ln_post(CLS) -> projection -> [B, out_dim].

    `use_pos_embedding` mirrors the reference CLIPHBA pos_embedding flag
    (cvpr_train_behavior_things_pipeline_baseline.py:184: forward passes it to the
    clip_hba CLIP; True for ViT backbones, False for RN50). When False the visual
    positional embedding is skipped. `remat` / `seq_shard` / `ring_attn` as in
    vit_encode (sequence parallelism for the tower, gather or ring form).
    """
    if seq_shard is not None:
        use_pallas = False
    _seq_parallel_checks(cfg, seq_shard, ring_attn)
    x = _clip_visual_stem(params, images, cfg,
                          use_pos_embedding=use_pos_embedding,
                          compute_dtype=compute_dtype)
    x, ring, _ = _seq_parallel_enter(x, seq_shard, ring_attn)
    adapters = adapters or {}
    blk = _block_fn(cfg, adapter_cfg, deterministic, use_pallas, remat,
                    ring=ring)
    for i, bp in enumerate(params["blocks"]):
        ad = adapters.get(i)
        dk = None
        if ad is not None and dropout_key is not None:
            dk = jax.random.fold_in(dropout_key, i)
        x = blk(bp, x, ad, dk)
        if seq_shard is not None:
            x = jax.lax.with_sharding_constraint(x, seq_shard)
    return _clip_visual_out(params, x)


def _clip_visual_stem(params: dict, images: jax.Array, cfg: ViTConfig, *,
                      use_pos_embedding: bool,
                      compute_dtype) -> jax.Array:
    """CLIP visual stem: patch embed + CLS + (optional) pos + ln_pre.
    Shared by clip_visual_encode and clip_visual_prefix so the full and
    split-tower forwards cannot drift."""
    x = images.astype(compute_dtype)
    x = vnn.patch_embed(x, params["patch_w"], params["patch_b"], cfg.patch)
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (B, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    if use_pos_embedding:
        x = x + params["pos"].astype(x.dtype)
    return vnn.layer_norm(x, params["ln_pre"]["scale"],
                          params["ln_pre"]["bias"])


def _clip_visual_out(params: dict, x: jax.Array) -> jax.Array:
    """CLIP visual tail: ln_post over the CLS token + projection."""
    cls_tok = vnn.layer_norm(x[:, 0], params["norm"]["scale"],
                             params["norm"]["bias"])
    out = jnp.dot(cls_tok, params["proj"].astype(cls_tok.dtype),
                  preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def clip_visual_prefix(params: dict, images: jax.Array, cfg: ViTConfig, *,
                       n_suffix: int, use_pos_embedding: bool = True,
                       use_pallas: bool | None = None,
                       compute_dtype=jnp.float32) -> jax.Array:
    """The FROZEN prefix of the CLIP visual tower: stem + the first
    `layers - n_suffix` blocks -> hidden tokens [B, S, width].

    The CLIP-HBA fine-tune trains DoRA adapters only in the last
    `vision_layers` blocks (reference apply_dora_to_ViT,
    new_cvpr_train_behavior_things_pipeline.py:484-513); everything below the
    split is frozen AND the THINGS data pipeline has no random augmentation
    (resize+normalize only, ref ThingsDataset :186-188), so these activations
    are a pure function of the image — computable once per run and reused
    every epoch (train/clip_loop.py build_prefix_cache)."""
    if not 0 <= n_suffix <= cfg.layers:
        raise ValueError(f"n_suffix={n_suffix} outside [0, {cfg.layers}]")
    x = _clip_visual_stem(params, images, cfg,
                          use_pos_embedding=use_pos_embedding,
                          compute_dtype=compute_dtype)
    blk = _block_fn(cfg, None, True, use_pallas, False)
    for bp in params["blocks"][:cfg.layers - n_suffix]:
        x = blk(bp, x, None, None)
    return x


def clip_visual_suffix(params: dict, hidden: jax.Array, cfg: ViTConfig, *,
                       n_suffix: int, adapters: dict | None = None,
                       adapter_cfg: dict | None = None,
                       dropout_key: jax.Array | None = None,
                       deterministic: bool = True,
                       use_pallas: bool | None = None,
                       remat: bool = False) -> jax.Array:
    """The trainable suffix: blocks [layers - n_suffix, layers) + ln_post/proj,
    from cached prefix activations. Block indices stay ABSOLUTE so adapter
    lookup and per-block dropout-key folding match clip_visual_encode exactly
    (same fold_in(i) stream -> identical dropout draws)."""
    start = cfg.layers - n_suffix
    adapters = adapters or {}
    below = [i for i in adapters if i < start]
    if below:
        raise ValueError(
            f"adapters at blocks {below} live below the prefix/suffix split "
            f"({start}): the cached prefix would silently exclude them")
    x = hidden
    blk = _block_fn(cfg, adapter_cfg, deterministic, use_pallas, remat)
    for i, bp in enumerate(params["blocks"][start:], start=start):
        ad = adapters.get(i)
        dk = None
        if ad is not None and dropout_key is not None:
            dk = jax.random.fold_in(dropout_key, i)
        x = blk(bp, x, ad, dk)
    return _clip_visual_out(params, x)
