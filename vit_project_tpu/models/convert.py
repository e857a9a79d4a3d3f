"""Checkpoint converters: torch state dicts -> our param pytrees.

Supports the two pretrained sources the reference depends on:
- OpenAI CLIP .pt archives (jit or plain state dict), as downloaded by the external
  clip package (reference load_clip_to_cpu, new_cvpr...pipeline.py:251-265);
- timm `vit_base_patch16_224` state dicts (reference train_vit_sgd.py:283).

torch (CPU wheel) is used only as a deserializer here; all compute is JAX.
"""
from __future__ import annotations

import numpy as np

from .clip import CLIPConfig, TextConfig
from .resnet import ResNetConfig
from .vit import ViTConfig
from ..ops.nn import conv_kernel_to_patch_matrix


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint (handles jit archives) into {name: np.ndarray}."""
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: np.asarray(v.detach().float().numpy() if hasattr(v, "detach")
                          else v) for k, v in sd.items()}


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _clip_block(sd, prefix):
    """One CLIP ResidualAttentionBlock -> our block dict (weights transposed to
    [in, out])."""
    return {
        "ln1": _ln(sd, prefix + ".ln_1"),
        "qkv_w": sd[prefix + ".attn.in_proj_weight"].T.copy(),
        "qkv_b": sd[prefix + ".attn.in_proj_bias"],
        "out_w": sd[prefix + ".attn.out_proj.weight"].T.copy(),
        "out_b": sd[prefix + ".attn.out_proj.bias"],
        "ln2": _ln(sd, prefix + ".ln_2"),
        "fc1_w": sd[prefix + ".mlp.c_fc.weight"].T.copy(),
        "fc1_b": sd[prefix + ".mlp.c_fc.bias"],
        "fc2_w": sd[prefix + ".mlp.c_proj.weight"].T.copy(),
        "fc2_b": sd[prefix + ".mlp.c_proj.bias"],
    }


def _hwio(w):
    """torch conv kernel OIHW -> TPU-native HWIO."""
    return np.transpose(w, (2, 3, 1, 0)).copy()


def _rn_bn(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"],
            "mean": sd[prefix + ".running_mean"],
            "var": sd[prefix + ".running_var"]}


def _rn_block(sd, prefix):
    p = {
        "conv1": _hwio(sd[prefix + ".conv1.weight"]),
        "bn1": _rn_bn(sd, prefix + ".bn1"),
        "conv2": _hwio(sd[prefix + ".conv2.weight"]),
        "bn2": _rn_bn(sd, prefix + ".bn2"),
        "conv3": _hwio(sd[prefix + ".conv3.weight"]),
        "bn3": _rn_bn(sd, prefix + ".bn3"),
    }
    if prefix + ".downsample.0.weight" in sd:  # avgpool is the unnamed "-1"
        p["down_conv"] = _hwio(sd[prefix + ".downsample.0.weight"])
        p["down_bn"] = _rn_bn(sd, prefix + ".downsample.1")
    return p


def _rn_visual_config(sd: dict, embed_dim: int) -> ResNetConfig:
    """Mirror OpenAI build_model's ResNet shape inference."""
    counts = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
        for b in (1, 2, 3, 4))
    width = sd["visual.layer1.0.conv1.weight"].shape[0]
    grid = int(round(
        (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
    # OpenAI convention: heads = embed width / 64. max(1, ...) only matters
    # for sub-64-width test fixtures (every real CLIP width divides by 64);
    # without it a tiny round-tripped checkpoint infers heads=0 and the
    # attention reshape divides by zero.
    return ResNetConfig(layers=counts, width=width,
                        heads=max(1, width * 32 // 64), image_size=grid * 32,
                        out_dim=embed_dim)


def _rn_visual_params(sd: dict, cfg: ResNetConfig) -> dict:
    stem = {}
    for i in (1, 2, 3):
        stem[f"conv{i}"] = _hwio(sd[f"visual.conv{i}.weight"])
        stem[f"bn{i}"] = _rn_bn(sd, f"visual.bn{i}")
    params = {"stem": stem}
    for b, n in enumerate(cfg.layers, start=1):
        params[f"layer{b}"] = [_rn_block(sd, f"visual.layer{b}.{i}")
                               for i in range(n)]
    ap = "visual.attnpool."
    params["attnpool"] = {
        "pos": sd[ap + "positional_embedding"],
        "q_w": sd[ap + "q_proj.weight"].T.copy(),
        "q_b": sd[ap + "q_proj.bias"],
        "k_w": sd[ap + "k_proj.weight"].T.copy(),
        "k_b": sd[ap + "k_proj.bias"],
        "v_w": sd[ap + "v_proj.weight"].T.copy(),
        "v_b": sd[ap + "v_proj.bias"],
        "c_w": sd[ap + "c_proj.weight"].T.copy(),
        "c_b": sd[ap + "c_proj.bias"],
    }
    return params


def clip_config_from_state_dict(sd: dict) -> CLIPConfig:
    """Infer the architecture from checkpoint shapes (mirrors what
    clip.build_model derives). Branches ViT vs ModifiedResNet the same way
    build_model does: ViT checkpoints carry `visual.proj`."""
    embed_dim = sd["text_projection"].shape[1]
    text_width = sd["ln_final.weight"].shape[0]
    text_layers = len({k.split(".")[2] for k in sd
                      if k.startswith("transformer.resblocks.")})
    text = TextConfig(width=text_width, layers=text_layers,
                      heads=max(1, text_width // 64),
                      vocab_size=sd["token_embedding.weight"].shape[0],
                      context_length=sd["positional_embedding"].shape[0])
    if "visual.proj" not in sd:  # ModifiedResNet tower (RN50 family)
        return CLIPConfig(visual=_rn_visual_config(sd, embed_dim), text=text,
                          embed_dim=embed_dim)
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = len({k.split(".")[3] for k in sd
                        if k.startswith("visual.transformer.resblocks.")})
    return CLIPConfig(
        visual=ViTConfig(patch=patch, width=vision_width, layers=vision_layers,
                         heads=max(1, vision_width // 64),
                         image_size=grid * patch,
                         pre_norm=True, patch_bias=False, quick_gelu=True,
                         out_dim=embed_dim),
        text=text, embed_dim=embed_dim)


def clip_params_from_state_dict(sd: dict) -> tuple[dict, CLIPConfig]:
    cfg = clip_config_from_state_dict(sd)
    if isinstance(cfg.visual, ResNetConfig):
        visual = _rn_visual_params(sd, cfg.visual)
    else:
        visual = _vit_visual_params(sd, cfg)
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "pos": sd["positional_embedding"],
        "blocks": [_clip_block(sd, f"transformer.resblocks.{i}")
                   for i in range(cfg.text.layers)],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    params = {"visual": visual, "text": text,
              "logit_scale": np.asarray(sd["logit_scale"], np.float32)}
    return params, cfg


def _vit_visual_params(sd: dict, cfg: CLIPConfig) -> dict:
    return {
        "patch_w": conv_kernel_to_patch_matrix(sd["visual.conv1.weight"]),
        "patch_b": None,
        "cls": sd["visual.class_embedding"],
        "pos": sd["visual.positional_embedding"],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": [_clip_block(sd, f"visual.transformer.resblocks.{i}")
                   for i in range(cfg.visual.layers)],
        "norm": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
    }


def _timm_block(sd, prefix):
    return {
        "ln1": _ln(sd, prefix + ".norm1"),
        "qkv_w": sd[prefix + ".attn.qkv.weight"].T.copy(),
        "qkv_b": sd[prefix + ".attn.qkv.bias"],
        "out_w": sd[prefix + ".attn.proj.weight"].T.copy(),
        "out_b": sd[prefix + ".attn.proj.bias"],
        "ln2": _ln(sd, prefix + ".norm2"),
        "fc1_w": sd[prefix + ".mlp.fc1.weight"].T.copy(),
        "fc1_b": sd[prefix + ".mlp.fc1.bias"],
        "fc2_w": sd[prefix + ".mlp.fc2.weight"].T.copy(),
        "fc2_b": sd[prefix + ".mlp.fc2.bias"],
    }


def vit_params_from_timm_state_dict(sd: dict, layers: int | None = None) -> dict:
    """timm ViT classifier state dict -> our param tree.

    `layers` is inferred from the block keys by default — a hardcoded count
    would silently truncate a deeper model (vit_large has 24 blocks)."""
    if layers is None:
        layers = len({k.split(".")[1] for k in sd
                      if k.startswith("blocks.")})
    p = {
        "patch_w": conv_kernel_to_patch_matrix(sd["patch_embed.proj.weight"]),
        "patch_b": sd["patch_embed.proj.bias"],
        "cls": sd["cls_token"].reshape(-1),
        "pos": sd["pos_embed"].reshape(sd["pos_embed"].shape[-2],
                                       sd["pos_embed"].shape[-1]),
        "blocks": [_timm_block(sd, f"blocks.{i}") for i in range(layers)],
        "norm": _ln(sd, "norm"),
    }
    if "head.weight" in sd:
        p["head_w"] = sd["head.weight"].T.copy()
        p["head_b"] = sd["head.bias"]
    return p


# ---------------------------------------------------------------------------
# Reverse direction: our param pytrees -> torch state dicts.
#
# Closes the migration loop the forward converters open: a model trained (or
# DoRA-adapted + baked, adapters.dora.bake) in this framework exports to the
# exact name/layout surface the reference ecosystem consumes — OpenAI CLIP
# state dicts (loadable by clip.build_model) and timm ViT state dicts
# (loadable by timm.create_model(...).load_state_dict). Round-trip with the
# forward converters is bit-exact (tests/test_clip_conversion.py).

def patch_matrix_to_conv_kernel(mat: np.ndarray, patch: int,
                                channels: int = 3) -> np.ndarray:
    """Inverse of conv_kernel_to_patch_matrix: [p*p*C, D] -> [D, C, p, p]."""
    mat = np.asarray(mat)
    d = mat.shape[1]
    k = mat.reshape(patch, patch, channels, d)   # (ph, pw, C, D)
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def _f32(x) -> np.ndarray:
    """Host float32 copy (bf16/f32 device arrays and python scalars alike)."""
    return np.asarray(x, dtype=np.float32)


def _t_out(w) -> np.ndarray:
    """Our [in, out] linear weight -> torch's [out, in]."""
    return np.ascontiguousarray(_f32(w).T)


def _ln_out(sd, prefix, p):
    sd[prefix + ".weight"] = _f32(p["scale"])
    sd[prefix + ".bias"] = _f32(p["bias"])


def _clip_block_out(sd, prefix, b):
    _ln_out(sd, prefix + ".ln_1", b["ln1"])
    sd[prefix + ".attn.in_proj_weight"] = _t_out(b["qkv_w"])
    sd[prefix + ".attn.in_proj_bias"] = _f32(b["qkv_b"])
    sd[prefix + ".attn.out_proj.weight"] = _t_out(b["out_w"])
    sd[prefix + ".attn.out_proj.bias"] = _f32(b["out_b"])
    _ln_out(sd, prefix + ".ln_2", b["ln2"])
    sd[prefix + ".mlp.c_fc.weight"] = _t_out(b["fc1_w"])
    sd[prefix + ".mlp.c_fc.bias"] = _f32(b["fc1_b"])
    sd[prefix + ".mlp.c_proj.weight"] = _t_out(b["fc2_w"])
    sd[prefix + ".mlp.c_proj.bias"] = _f32(b["fc2_b"])


def _oihw(w) -> np.ndarray:
    """Our HWIO conv kernel -> torch OIHW."""
    return np.ascontiguousarray(np.transpose(_f32(w), (3, 2, 0, 1)))


def _rn_bn_out(sd, prefix, p):
    sd[prefix + ".weight"] = _f32(p["scale"])
    sd[prefix + ".bias"] = _f32(p["bias"])
    sd[prefix + ".running_mean"] = _f32(p["mean"])
    sd[prefix + ".running_var"] = _f32(p["var"])
    # torch tracks this buffer; build_model tolerates int64 zeros
    sd[prefix + ".num_batches_tracked"] = np.zeros((), np.int64)


def _rn_block_out(sd, prefix, p):
    for i in (1, 2, 3):
        sd[f"{prefix}.conv{i}.weight"] = _oihw(p[f"conv{i}"])
        _rn_bn_out(sd, f"{prefix}.bn{i}", p[f"bn{i}"])
    if "down_conv" in p:
        sd[prefix + ".downsample.0.weight"] = _oihw(p["down_conv"])
        _rn_bn_out(sd, prefix + ".downsample.1", p["down_bn"])


def clip_state_dict_from_params(params: dict, cfg: CLIPConfig) -> dict:
    """Our CLIP param tree -> OpenAI-CLIP-format {name: np.float32 ndarray}.

    Exact inverse of clip_params_from_state_dict for both tower families;
    clip_config_from_state_dict re-infers `cfg` from the result."""
    sd: dict = {}
    v = params["visual"]
    if isinstance(cfg.visual, ResNetConfig):
        for i in (1, 2, 3):
            sd[f"visual.conv{i}.weight"] = _oihw(v["stem"][f"conv{i}"])
            _rn_bn_out(sd, f"visual.bn{i}", v["stem"][f"bn{i}"])
        for b, n in enumerate(cfg.visual.layers, start=1):
            for i in range(n):
                _rn_block_out(sd, f"visual.layer{b}.{i}", v[f"layer{b}"][i])
        ap = v["attnpool"]
        sd["visual.attnpool.positional_embedding"] = _f32(ap["pos"])
        for nm in ("q", "k", "v", "c"):
            sd[f"visual.attnpool.{nm}_proj.weight"] = _t_out(ap[f"{nm}_w"])
            sd[f"visual.attnpool.{nm}_proj.bias"] = _f32(ap[f"{nm}_b"])
    else:
        sd["visual.conv1.weight"] = patch_matrix_to_conv_kernel(
            _f32(v["patch_w"]), cfg.visual.patch)
        sd["visual.class_embedding"] = _f32(v["cls"])
        sd["visual.positional_embedding"] = _f32(v["pos"])
        _ln_out(sd, "visual.ln_pre", v["ln_pre"])
        for i, b in enumerate(v["blocks"]):
            _clip_block_out(sd, f"visual.transformer.resblocks.{i}", b)
        _ln_out(sd, "visual.ln_post", v["norm"])
        sd["visual.proj"] = _f32(v["proj"])
    t = params["text"]
    sd["token_embedding.weight"] = _f32(t["token_embedding"])
    sd["positional_embedding"] = _f32(t["pos"])
    for i, b in enumerate(t["blocks"]):
        _clip_block_out(sd, f"transformer.resblocks.{i}", b)
    _ln_out(sd, "ln_final", t["ln_final"])
    sd["text_projection"] = _f32(t["text_projection"])
    sd["logit_scale"] = _f32(params["logit_scale"])
    return sd


def timm_state_dict_from_vit_params(params: dict, patch: int) -> dict:
    """Our ViT classifier tree -> timm-format {name: np.float32 ndarray}.

    Inverse of vit_params_from_timm_state_dict; `patch` is needed to unfold
    the patch matrix back into a conv kernel."""
    sd: dict = {}
    sd["patch_embed.proj.weight"] = patch_matrix_to_conv_kernel(
        _f32(params["patch_w"]), patch)
    sd["patch_embed.proj.bias"] = _f32(params["patch_b"])
    sd["cls_token"] = _f32(params["cls"]).reshape(1, 1, -1)
    sd["pos_embed"] = _f32(params["pos"])[None]
    for i, b in enumerate(params["blocks"]):
        sd[f"blocks.{i}.norm1.weight"] = _f32(b["ln1"]["scale"])
        sd[f"blocks.{i}.norm1.bias"] = _f32(b["ln1"]["bias"])
        sd[f"blocks.{i}.attn.qkv.weight"] = _t_out(b["qkv_w"])
        sd[f"blocks.{i}.attn.qkv.bias"] = _f32(b["qkv_b"])
        sd[f"blocks.{i}.attn.proj.weight"] = _t_out(b["out_w"])
        sd[f"blocks.{i}.attn.proj.bias"] = _f32(b["out_b"])
        sd[f"blocks.{i}.norm2.weight"] = _f32(b["ln2"]["scale"])
        sd[f"blocks.{i}.norm2.bias"] = _f32(b["ln2"]["bias"])
        sd[f"blocks.{i}.mlp.fc1.weight"] = _t_out(b["fc1_w"])
        sd[f"blocks.{i}.mlp.fc1.bias"] = _f32(b["fc1_b"])
        sd[f"blocks.{i}.mlp.fc2.weight"] = _t_out(b["fc2_w"])
        sd[f"blocks.{i}.mlp.fc2.bias"] = _f32(b["fc2_b"])
    sd["norm.weight"] = _f32(params["norm"]["scale"])
    sd["norm.bias"] = _f32(params["norm"]["bias"])
    if "head_w" in params:
        sd["head.weight"] = _t_out(params["head_w"])
        sd["head.bias"] = _f32(params["head_b"])
    return sd


def save_torch_state_dict(path: str, sd: dict) -> None:
    """Write {name: ndarray} as a plain torch.save state dict (.pth) that
    torch.load / nn.Module.load_state_dict on the reference side consume
    directly. DoRA adapter trees go through adapters.dora.to_reference_names
    first; baked full models through clip_state_dict_from_params."""
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
                for k, v in sd.items()}, path)
