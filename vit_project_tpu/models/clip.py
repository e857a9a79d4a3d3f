"""CLIP image+text towers and the CLIP-HBA prompt-similarity head.

Reimplements, natively, what the reference imports from the external CLIP-HBA
package (`src.models.CLIPs.clip_hba.clip`, new_cvpr_train_behavior_things_pipeline.py:21):
a CLIP model whose forward takes (image, tokenized_prompts, pos_embedding) and
returns a [B, n_prompts] similarity score matrix — one score per SPoSE class-name
prompt (CLIPHBA.forward, ref :287-304). Scores are logit-scaled cosine similarities
between the image embedding and the n_prompts text embeddings.

The text tower carries DoRA adapters in its last n blocks during behavioral
fine-tuning, so prompt embeddings are (cheaply — 66 x 77 tokens) recomputed each
step inside the jitted train step.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import nn as vnn
from . import resnet as vresnet
from . import vit as vvit
from .resnet import ResNetConfig
from .vit import ViTConfig


@dataclass(frozen=True)
class TextConfig:
    width: int = 768
    layers: int = 12
    heads: int = 12
    vocab_size: int = 49408
    context_length: int = 77


@dataclass(frozen=True)
class CLIPConfig:
    visual: ViTConfig | ResNetConfig  # transformer or ModifiedResNet tower
    text: TextConfig
    embed_dim: int


CLIP_VIT_L14 = CLIPConfig(visual=vvit.CLIP_VIT_L14_VISUAL,
                          text=TextConfig(width=768, layers=12, heads=12),
                          embed_dim=768)
CLIP_VIT_B32 = CLIPConfig(visual=vvit.CLIP_VIT_B32_VISUAL,
                          text=TextConfig(width=512, layers=12, heads=8),
                          embed_dim=512)
CLIP_VIT_B16 = CLIPConfig(visual=vvit.CLIP_VIT_B16_VISUAL,
                          text=TextConfig(width=512, layers=12, heads=8),
                          embed_dim=512)

# ViT-L/14@336px: identical tower, higher-resolution positional grid. The
# converter's shape inference (convert.clip_config_from_state_dict) derives
# image_size = grid * patch from the checkpoint, so loading the @336px
# checkpoint produces exactly this config; the preset exists so the backbone
# name works without a checkpoint too.
CLIP_VIT_L14_336 = CLIPConfig(
    visual=dataclasses.replace(vvit.CLIP_VIT_L14_VISUAL, image_size=336),
    text=TextConfig(width=768, layers=12, heads=12),
    embed_dim=768)

# ModifiedResNet towers — the reference CLIPHBA's default backbone is 'RN50'
# (new_cvpr_train_behavior_things_pipeline.py:269). Geometry for the whole
# RN50xN family follows OpenAI build_model's inference rules: attnpool heads
# = vision_width * 32 // 64, text heads = text_width // 64, and the input
# resolution scales with the tower (288/384/448 for x4/x16/x64).
CLIP_RN50 = CLIPConfig(visual=vresnet.RN50,
                       text=TextConfig(width=512, layers=12, heads=8),
                       embed_dim=1024)
CLIP_RN101 = CLIPConfig(visual=vresnet.RN101,
                        text=TextConfig(width=512, layers=12, heads=8),
                        embed_dim=512)
CLIP_RN50x4 = CLIPConfig(
    visual=vresnet.ResNetConfig(layers=(4, 6, 10, 6), width=80, heads=40,
                                image_size=288, out_dim=640),
    text=TextConfig(width=640, layers=12, heads=10),
    embed_dim=640)
CLIP_RN50x16 = CLIPConfig(
    visual=vresnet.ResNetConfig(layers=(6, 8, 18, 8), width=96, heads=48,
                                image_size=384, out_dim=768),
    text=TextConfig(width=768, layers=12, heads=12),
    embed_dim=768)
CLIP_RN50x64 = CLIPConfig(
    visual=vresnet.ResNetConfig(layers=(3, 15, 36, 10), width=128, heads=64,
                                image_size=448, out_dim=1024),
    text=TextConfig(width=1024, layers=12, heads=16),
    embed_dim=1024)

# the full clip._MODELS registry surface (ref new_cvpr...pipeline.py:252 keys
# into it by backbone name) — every name OpenAI ships resolves here too
CLIP_CONFIGS = {"ViT-L/14": CLIP_VIT_L14, "ViT-B/32": CLIP_VIT_B32,
                "ViT-B/16": CLIP_VIT_B16, "ViT-L/14@336px": CLIP_VIT_L14_336,
                "RN50": CLIP_RN50, "RN101": CLIP_RN101,
                "RN50x4": CLIP_RN50x4, "RN50x16": CLIP_RN50x16,
                "RN50x64": CLIP_RN50x64}

# miniature backbone for integration tests / CI (full 224 input, 2-layer towers)
CLIP_CONFIGS["test-tiny"] = CLIPConfig(
    visual=ViTConfig(patch=32, width=32, layers=2, heads=2, image_size=224,
                     pre_norm=True, patch_bias=False, quick_gelu=True,
                     out_dim=16),
    text=TextConfig(width=32, layers=2, heads=2, vocab_size=49408,
                    context_length=77),
    embed_dim=16)


def tiny_clip_config(width=32, layers=2, heads=2, patch=16, image_size=32,
                     embed_dim=16, vocab=512, context=16) -> CLIPConfig:
    """Miniature CLIP for tests / CI."""
    return CLIPConfig(
        visual=ViTConfig(patch=patch, width=width, layers=layers, heads=heads,
                         image_size=image_size, pre_norm=True, patch_bias=False,
                         quick_gelu=True, out_dim=embed_dim),
        text=TextConfig(width=width, layers=layers, heads=heads,
                        vocab_size=vocab, context_length=context),
        embed_dim=embed_dim)


def init_text_params(key, cfg: TextConfig, embed_dim: int) -> dict:
    ks = jax.random.split(key, cfg.layers + 4)
    return {
        "token_embedding": 0.02 * jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.width), jnp.float32),
        "pos": 0.01 * jax.random.normal(
            ks[1], (cfg.context_length, cfg.width), jnp.float32),
        "blocks": [vvit.init_block(ks[3 + i], cfg.width, 4)
                   for i in range(cfg.layers)],
        "ln_final": {"scale": jnp.ones(cfg.width), "bias": jnp.zeros(cfg.width)},
        "text_projection": (cfg.width ** -0.5) * jax.random.normal(
            ks[2], (cfg.width, embed_dim), jnp.float32),
    }


def init_clip_params(key, cfg: CLIPConfig) -> dict:
    kv, kt = jax.random.split(key)
    if isinstance(cfg.visual, ResNetConfig):
        visual = vresnet.init_resnet_params(kv, cfg.visual)
    else:
        visual = vvit.init_vit_params(kv, cfg.visual)
    return {
        "visual": visual,
        "text": init_text_params(kt, cfg.text, cfg.embed_dim),
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32),
    }


def encode_text(params: dict, tokens: jax.Array, cfg: CLIPConfig, *,
                adapters: dict | None = None, adapter_cfg: dict | None = None,
                dropout_key: jax.Array | None = None, deterministic: bool = True,
                use_pallas: bool | None = None,
                compute_dtype=jnp.float32, remat: bool = False) -> jax.Array:
    """tokens [N, context] int32 -> [N, embed_dim].

    Causal transformer; features taken at the EOT position (argmax of token ids,
    since EOT is the largest id) then projected — OpenAI CLIP semantics.
    `remat` checkpoints each block like the visual tower (small next to the
    image tower at 66x77 tokens, but the flag covers BOTH towers).
    """
    tp = params["text"]
    x = tp["token_embedding"][tokens].astype(compute_dtype)
    x = x + tp["pos"].astype(x.dtype)
    adapters = adapters or {}

    # one _block_fn serves every trunk (key threading / remat / adapter
    # plumbing live in one place) — only heads/quick_gelu matter from the
    # shim config, the text tower is causal and never MoE/ring
    blk = _text_block_fn(cfg, adapter_cfg, deterministic, use_pallas, remat)
    for i, bp in enumerate(tp["blocks"]):
        ad = adapters.get(i)
        dk = None
        if ad is not None and dropout_key is not None:
            dk = jax.random.fold_in(dropout_key, i)
        x = blk(bp, x, ad, dk)
    x = vnn.layer_norm(x, tp["ln_final"]["scale"], tp["ln_final"]["bias"])
    eot = jnp.argmax(tokens, axis=-1)
    feats = x[jnp.arange(x.shape[0]), eot]
    out = jnp.dot(feats, tp["text_projection"].astype(feats.dtype),
                  preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def _text_block_fn(cfg: CLIPConfig, adapter_cfg, deterministic, use_pallas,
                   remat):
    """The text tower's per-block callable (causal; shim config as in
    encode_text) — one builder shared by the full and prefix/suffix paths."""
    blk_cfg = ViTConfig(heads=cfg.text.heads, quick_gelu=True)
    return vvit._block_fn(blk_cfg, adapter_cfg, deterministic, use_pallas,
                          remat, causal=True)


def encode_text_prefix(params: dict, tokens: jax.Array, cfg: CLIPConfig, *,
                       n_suffix: int, use_pallas: bool | None = None,
                       compute_dtype=jnp.float32):
    """The FROZEN prefix of the text tower: embeddings + the first
    `layers - n_suffix` blocks -> (hidden [N, context, width], eot [N]).

    The 66 SPoSE prompts are fixed for a whole run and DoRA only adapts the
    last `transformer_layers` text blocks, so this is computable once
    (see models/vit.py clip_visual_prefix for the visual-side rationale)."""
    if not 0 <= n_suffix <= cfg.text.layers:
        raise ValueError(f"n_suffix={n_suffix} outside [0, {cfg.text.layers}]")
    tp = params["text"]
    x = tp["token_embedding"][tokens].astype(compute_dtype)
    x = x + tp["pos"].astype(x.dtype)
    blk = _text_block_fn(cfg, None, True, use_pallas, False)
    for bp in tp["blocks"][:cfg.text.layers - n_suffix]:
        x = blk(bp, x, None, None)
    eot = jnp.argmax(tokens, axis=-1)
    return x, eot


def encode_text_suffix(params: dict, hidden: jax.Array, eot: jax.Array,
                       cfg: CLIPConfig, *, n_suffix: int,
                       adapters: dict | None = None,
                       adapter_cfg: dict | None = None,
                       dropout_key: jax.Array | None = None,
                       deterministic: bool = True,
                       use_pallas: bool | None = None,
                       remat: bool = False) -> jax.Array:
    """Trainable text suffix: blocks [layers - n_suffix, layers) + ln_final +
    EOT gather + projection. Absolute block indices keep the adapter lookup
    and dropout fold_in stream identical to encode_text."""
    start = cfg.text.layers - n_suffix
    adapters = adapters or {}
    below = [i for i in adapters if i < start]
    if below:
        raise ValueError(
            f"text adapters at blocks {below} live below the prefix/suffix "
            f"split ({start}): the cached prefix would silently exclude them")
    tp = params["text"]
    x = hidden
    blk = _text_block_fn(cfg, adapter_cfg, deterministic, use_pallas, remat)
    for i, bp in enumerate(tp["blocks"][start:], start=start):
        ad = adapters.get(i)
        dk = None
        if ad is not None and dropout_key is not None:
            dk = jax.random.fold_in(dropout_key, i)
        x = blk(bp, x, ad, dk)
    x = vnn.layer_norm(x, tp["ln_final"]["scale"], tp["ln_final"]["bias"])
    feats = x[jnp.arange(x.shape[0]), eot]
    out = jnp.dot(feats, tp["text_projection"].astype(feats.dtype),
                  preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def encode_image(params: dict, images: jax.Array, cfg: CLIPConfig, *,
                 adapters: dict | None = None, adapter_cfg: dict | None = None,
                 dropout_key: jax.Array | None = None,
                 deterministic: bool = True, use_pallas: bool | None = None,
                 use_pos_embedding: bool = True,
                 compute_dtype=jnp.float32, remat: bool = False,
                 seq_shard=None, ring_attn: bool = False) -> jax.Array:
    if isinstance(cfg.visual, ResNetConfig):
        if adapters:
            raise ValueError(
                "DoRA adapters target transformer resblocks; the RN50 tower "
                "has none (the reference's RN50 path uses the finetune "
                "unfreezers instead, adapters/finetune.py)")
        if seq_shard is not None or ring_attn:
            raise ValueError("sequence parallelism applies to transformer "
                             "towers; the RN trunk is a conv pyramid")
        return vresnet.resnet_encode(
            params["visual"], images, cfg.visual,
            use_pos_embedding=use_pos_embedding,
            compute_dtype=compute_dtype, remat=remat)
    return vvit.clip_visual_encode(
        params["visual"], images, cfg.visual, adapters=adapters,
        adapter_cfg=adapter_cfg, dropout_key=dropout_key,
        deterministic=deterministic, use_pallas=use_pallas,
        use_pos_embedding=use_pos_embedding, compute_dtype=compute_dtype,
        remat=remat, seq_shard=seq_shard, ring_attn=ring_attn)


def clip_hba_forward(params: dict, images: jax.Array, prompt_tokens: jax.Array,
                     cfg: CLIPConfig, *, adapters: dict | None = None,
                     adapter_cfg: dict | None = None,
                     dropout_key: jax.Array | None = None,
                     deterministic: bool = True,
                     use_pallas: bool | None = None,
                     use_pos_embedding: bool = True,
                     compute_dtype=jnp.float32, remat: bool = False,
                     seq_shard=None, ring_attn: bool = False) -> jax.Array:
    """model(images) -> [B, n_prompts] prediction scores (CLIPHBA contract).

    adapters = {"visual": {idx: dora}, "text": {idx: dora}} — the DoRA surgery of
    apply_dora_to_ViT applied as a pure function of parameter trees.
    `seq_shard`/`ring_attn` apply sequence parallelism to the VISUAL tower
    only (the text tower is 66 x 77 tokens — not worth sharding).
    """
    adapters = adapters or {}
    kv = kt = None
    if dropout_key is not None:
        kv, kt = jax.random.split(dropout_key)
    img = encode_image(params, images, cfg, adapters=adapters.get("visual"),
                       adapter_cfg=adapter_cfg, dropout_key=kv,
                       deterministic=deterministic, use_pallas=use_pallas,
                       use_pos_embedding=use_pos_embedding,
                       compute_dtype=compute_dtype, remat=remat,
                       seq_shard=seq_shard, ring_attn=ring_attn)
    txt = encode_text(params, prompt_tokens, cfg, adapters=adapters.get("text"),
                      adapter_cfg=adapter_cfg, dropout_key=kt,
                      deterministic=deterministic, use_pallas=use_pallas,
                      compute_dtype=compute_dtype, remat=remat)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    return scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32)


def clip_hba_suffix_forward(params: dict, vis_hidden: jax.Array,
                            txt_hidden: jax.Array, txt_eot: jax.Array,
                            cfg: CLIPConfig, *, n_vis_suffix: int,
                            n_txt_suffix: int, adapters: dict | None = None,
                            adapter_cfg: dict | None = None,
                            dropout_key: jax.Array | None = None,
                            deterministic: bool = True,
                            use_pallas: bool | None = None,
                            remat: bool = False) -> jax.Array:
    """clip_hba_forward from cached frozen-prefix activations.

    `vis_hidden` = clip_visual_prefix(images), `txt_hidden`/`txt_eot` =
    encode_text_prefix(prompt_tokens): only the adapted suffix blocks + heads
    run here — for the reference configuration (2 of 24 visual + 1 of 12 text
    blocks adapted) that removes ~92% of the forward FLOPs from every train /
    eval / RSA step. The dropout-key split (kv, kt) and per-block fold_in
    match clip_hba_forward, so a cached train step draws the identical
    dropout masks as the full-tower step.

    Transformer towers only (ViTConfig visual); the RN trunk has no block
    split (and no adapters — encode_image rejects them there)."""
    if isinstance(cfg.visual, ResNetConfig):
        raise ValueError("frozen-prefix caching applies to transformer "
                         "visual towers; the RN trunk is a conv pyramid")
    adapters = adapters or {}
    kv = kt = None
    if dropout_key is not None:
        kv, kt = jax.random.split(dropout_key)
    img = vvit.clip_visual_suffix(
        params["visual"], vis_hidden, cfg.visual, n_suffix=n_vis_suffix,
        adapters=adapters.get("visual"), adapter_cfg=adapter_cfg,
        dropout_key=kv, deterministic=deterministic, use_pallas=use_pallas,
        remat=remat)
    txt = encode_text_suffix(
        params, txt_hidden, txt_eot, cfg, n_suffix=n_txt_suffix,
        adapters=adapters.get("text"), adapter_cfg=adapter_cfg,
        dropout_key=kt, deterministic=deterministic, use_pallas=use_pallas,
        remat=remat)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    return scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32)
