"""RN50 (ModifiedResNet) CLIP tower: conversion fidelity against a torch
oracle built with OpenAI CLIP's architecture and parameter names, the
pos_embedding flag semantics (False for the reference's RN50 runs,
cvpr_train_behavior_things_pipeline_baseline.py:757-758), the CLIP-HBA
[B, n_prompts] head on an RN visual tower, and the RN50 finetune
unfreezer splits (new_cvpr_train_behavior_things_pipeline.py:552-567)."""
from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from test_clip_conversion import TorchResBlock
from vit_project_tpu.adapters import finetune as vft
from vit_project_tpu.models import clip as vclip
from vit_project_tpu.models import convert as vconvert
from vit_project_tpu.models import resnet as vrn

# tiny ModifiedResNet: width 8 -> feature dim 8*32=256; image 64 -> 2x2 grid
RNW, LAYERS, HEADS, IMG, EMB = 8, (1, 1, 2, 1), 2, 64, 16
TW, TL, THEADS = 128, 2, 2   # text tower (converter infers heads = W // 64)
VOCAB, CTX = 50, 12


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(OrderedDict([
                ("-1", tnn.AvgPool2d(stride)),
                ("0", tnn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", tnn.BatchNorm2d(planes * 4))]))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + identity)


class TorchAttnPool(tnn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = tnn.Linear(embed_dim, embed_dim)
        self.q_proj = tnn.Linear(embed_dim, embed_dim)
        self.v_proj = tnn.Linear(embed_dim, embed_dim)
        self.c_proj = tnn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x, use_pos=True):
        x = x.flatten(start_dim=2).permute(2, 0, 1)       # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        if use_pos:
            x = x + self.positional_embedding[:, None, :].to(x.dtype)
        x, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                    self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            training=False, need_weights=False)
        return x.squeeze(0)


class TorchModifiedResNet(tnn.Module):
    def __init__(self, layers, output_dim, heads, input_resolution, width):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width // 2, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width // 2)
        self.conv2 = tnn.Conv2d(width // 2, width // 2, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width // 2)
        self.conv3 = tnn.Conv2d(width // 2, width, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width)
        self.avgpool = tnn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = TorchAttnPool(input_resolution // 32, width * 32,
                                      heads, output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        mods = [TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * TorchBottleneck.expansion
        for _ in range(1, blocks):
            mods.append(TorchBottleneck(self._inplanes, planes))
        return tnn.Sequential(*mods)

    def forward(self, x, use_pos=True):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.attnpool(x, use_pos=use_pos)


class TorchRNCLIP(tnn.Module):
    """OpenAI-CLIP-shaped model with an RN visual tower (matching names)."""

    def __init__(self):
        super().__init__()
        self.visual = TorchModifiedResNet(LAYERS, EMB, HEADS, IMG, RNW)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TorchResBlock(TW, THEADS) for _ in range(TL)])
        self.token_embedding = tnn.Embedding(VOCAB, TW)
        self.positional_embedding = tnn.Parameter(torch.randn(CTX, TW) * 0.01)
        self.ln_final = tnn.LayerNorm(TW)
        self.text_projection = tnn.Parameter(torch.randn(TW, EMB) * 0.05)
        self.logit_scale = tnn.Parameter(torch.tensor(np.log(1 / 0.07),
                                                      dtype=torch.float32))

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        mask = torch.triu(torch.full((CTX, CTX), float("-inf")), diagonal=1)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = self.ln_final(x.permute(1, 0, 2))
        eot = tokens.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection

    def forward(self, images, tokens, use_pos=False):
        img = self.visual(images, use_pos=use_pos)
        txt = self.encode_text(tokens)
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        return self.logit_scale.exp() * img @ txt.t()


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(7)
    model = TorchRNCLIP()
    # populate BatchNorm running stats with real batch statistics so the
    # oracle catches a swapped/ignored mean-var mapping
    model.train()
    with torch.no_grad():
        for seed in (0, 1):
            g = torch.Generator().manual_seed(seed)
            model.visual(torch.randn(4, 3, IMG, IMG, generator=g))
    model.eval()
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in model.state_dict().items()}
    params, cfg = vconvert.clip_params_from_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params, cfg


class TestRNConversion:
    def test_config_inferred_from_shapes(self, converted):
        _, _, cfg = converted
        assert isinstance(cfg.visual, vrn.ResNetConfig)
        assert cfg.visual.layers == LAYERS
        assert cfg.visual.width == RNW
        assert cfg.visual.image_size == IMG
        assert cfg.visual.out_dim == EMB and cfg.embed_dim == EMB
        assert cfg.visual.heads == RNW * 32 // 64
        assert cfg.text.width == TW and cfg.text.layers == TL

    @pytest.mark.parametrize("use_pos", [True, False])
    def test_image_tower_matches_torch(self, converted, use_pos):
        model, params, cfg = converted
        rs = np.random.RandomState(0)
        imgs = rs.randn(3, IMG, IMG, 3).astype(np.float32)
        with torch.no_grad():
            want = model.visual(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                                use_pos=use_pos).numpy()
        got = np.asarray(vclip.encode_image(
            params, jnp.asarray(imgs), cfg, use_pos_embedding=use_pos))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        if use_pos:  # the flag must actually change the output
            off = np.asarray(vclip.encode_image(
                params, jnp.asarray(imgs), cfg, use_pos_embedding=False))
            assert np.abs(off - got).max() > 1e-5

    def test_full_prompt_similarity_head(self, converted):
        """[B, n_prompts] CLIPHBA contract with pos_embedding=False — the
        reference's RN50 configuration (cvpr_..._baseline.py:757)."""
        model, params, cfg = converted
        rs = np.random.RandomState(2)
        imgs = rs.randn(2, IMG, IMG, 3).astype(np.float32)
        tokens = rs.randint(1, VOCAB - 2, (5, CTX))
        tokens[:, -1] = VOCAB - 1
        with torch.no_grad():
            want = model(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                         torch.tensor(tokens), use_pos=False).numpy()
        got = np.asarray(vclip.clip_hba_forward(
            params, jnp.asarray(imgs), jnp.asarray(tokens), cfg,
            use_pos_embedding=False))
        assert got.shape == (2, 5)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_jit_bf16_smoke(self, converted):
        _, params, cfg = converted
        fn = jax.jit(lambda p, x: vclip.encode_image(
            p, x, cfg, use_pos_embedding=False,
            compute_dtype=jnp.bfloat16))
        out = fn(params, jnp.ones((2, IMG, IMG, 3), jnp.float32))
        assert out.shape == (2, EMB) and out.dtype == jnp.float32
        assert bool(jnp.isfinite(out).all())


class TestRNRegistryAndInit:
    def test_rn50_registered(self):
        cfg = vclip.CLIP_CONFIGS["RN50"]
        assert isinstance(cfg.visual, vrn.ResNetConfig)
        assert cfg.visual.layers == (3, 4, 6, 3)
        assert cfg.embed_dim == 1024
        assert cfg.visual.pool_grid == 7

    def test_init_and_encode(self):
        cfg = vrn.ResNetConfig(layers=(1, 1, 1, 1), width=8, heads=2,
                               image_size=32, out_dim=16)
        params = vrn.init_resnet_params(jax.random.PRNGKey(0), cfg)
        out = vrn.resnet_encode(params, jnp.ones((2, 32, 32, 3)), cfg)
        assert out.shape == (2, 16) and bool(jnp.isfinite(out).all())
        # remat variant computes the same function
        out_r = vrn.resnet_encode(params, jnp.ones((2, 32, 32, 3)), cfg,
                                  remat=True)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out),
                                   rtol=1e-6, atol=1e-6)

    def test_adapters_and_seq_parallel_rejected(self, converted):
        _, params, cfg = converted
        x = jnp.ones((1, IMG, IMG, 3))
        with pytest.raises(ValueError, match="finetune"):
            vclip.encode_image(params, x, cfg, adapters={0: {}})
        with pytest.raises(ValueError, match="conv pyramid"):
            vclip.encode_image(params, x, cfg, seq_shard=object())

    def test_quantize_skips_conv_tower(self, converted):
        from vit_project_tpu.ops import quant as vquant
        _, params, cfg = converted
        q = vquant.quantize_clip_blocks(params)
        # visual untouched, text blocks quantized
        assert q["visual"] is params["visual"]
        assert "q" in q["text"]["blocks"][0]["qkv_w"]


class TestRNFinetuneSplit:
    def test_split_merge_roundtrip(self, converted):
        _, params, _ = converted
        trainable, frozen = vft.split_rn_image_layers(params)
        assert set(trainable["visual"]) == {"layer3", "layer4", "attnpool"}
        assert frozen["visual"]["layer3"] is None  # no aliasing
        merged = vft.merge(frozen, trainable)
        a = jax.tree_util.tree_leaves(merged)
        b = jax.tree_util.tree_leaves(params)
        assert len(a) == len(b)
        assert all(x is y for x, y in zip(a, b))

    def test_grads_flow_only_through_trainable(self, converted):
        _, params, cfg = converted
        trainable, frozen = vft.split_rn_image_layers(params)
        x = jnp.ones((1, IMG, IMG, 3))

        def loss(tr):
            p = vft.merge(frozen, tr)
            return vclip.encode_image(p, x, cfg,
                                      use_pos_embedding=False).sum()

        g = jax.grad(loss)(trainable)
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves and any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_split_rejects_vit_tower(self):
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="RN visual tower"):
            vft.split_rn_image_layers(params)


class TestModelRegistry:
    """The backbone registry mirrors OpenAI clip._MODELS (the reference keys
    into it by name, new_cvpr_train_behavior_things_pipeline.py:252): every
    name OpenAI ships must resolve, with the geometry build_model would
    infer from the corresponding checkpoint's shapes."""

    OPENAI_NAMES = ["RN50", "RN101", "RN50x4", "RN50x16", "RN50x64",
                    "ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px"]

    def test_every_openai_name_resolves(self):
        for name in self.OPENAI_NAMES:
            assert name in vclip.CLIP_CONFIGS, name

    @pytest.mark.parametrize("name,layers,width,image,embed", [
        ("RN50", (3, 4, 6, 3), 64, 224, 1024),
        ("RN101", (3, 4, 23, 3), 64, 224, 512),
        ("RN50x4", (4, 6, 10, 6), 80, 288, 640),
        ("RN50x16", (6, 8, 18, 8), 96, 384, 768),
        ("RN50x64", (3, 15, 36, 10), 128, 448, 1024),
    ])
    def test_rn_family_geometry(self, name, layers, width, image, embed):
        cfg = vclip.CLIP_CONFIGS[name]
        v = cfg.visual
        assert isinstance(v, vrn.ResNetConfig)
        assert v.layers == layers and v.width == width
        assert v.image_size == image and v.out_dim == embed
        assert cfg.embed_dim == embed
        # build_model's inference rules (OpenAI CLIP model.py):
        assert v.heads == v.width * 32 // 64          # attnpool heads
        assert cfg.text.heads == cfg.text.width // 64  # transformer heads
        assert v.feature_dim == v.width * 32
        assert v.pool_grid == image // 32

    def test_vit_l14_336_geometry(self):
        cfg = vclip.CLIP_CONFIGS["ViT-L/14@336px"]
        base = vclip.CLIP_CONFIGS["ViT-L/14"]
        # same tower, only the positional grid changes: 24x24 + CLS = 577
        assert cfg.visual.image_size == 336
        assert cfg.visual.seq_len == 577
        assert cfg.text == base.text and cfg.embed_dim == base.embed_dim
        assert cfg.visual.width == base.visual.width
        assert cfg.visual.layers == base.visual.layers

    def test_rn50x4_params_match_converter_inference(self):
        # init_clip_params at RN50x4 geometry must produce shapes the
        # converter's _rn_visual_config would round-trip: attnpool pos
        # embedding rows = grid^2 + 1, stem width = width.
        cfg = vclip.CLIP_CONFIGS["RN50x4"]
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        pos = params["visual"]["attnpool"]["pos"]
        assert pos.shape[0] == cfg.visual.pool_grid ** 2 + 1
        assert params["visual"]["stem"]["conv1"].shape[-1] == cfg.visual.width // 2
