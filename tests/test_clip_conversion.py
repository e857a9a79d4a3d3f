"""CLIP conversion fidelity: a small OpenAI-CLIP-architecture model built with
torch primitives is exported as a state dict in OpenAI naming, converted with
models/convert.py, and our JAX towers must reproduce its outputs end-to-end —
validating the converter mapping, the visual tower (ln_pre, QuickGELU, CLS
ln_post + projection), the causal text tower with EOT-argmax pooling, and the
[B, n_prompts] logit-scaled cosine head (SURVEY.md hard part 1)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from vit_project_tpu.models import clip as vclip
from vit_project_tpu.models import convert as vconvert

# heads must equal width // 64 — the converter infers head count with the
# OpenAI convention (ViT-L/14: 1024/64=16 visual, 768/64=12 text)
W, L, HEADS, PATCH, IMG, EMB = 128, 2, 2, 8, 32, 32
VOCAB, CTX = 100, 12


class TorchResBlock(tnn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(width, heads)
        self.ln_1 = tnn.LayerNorm(width)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(width, width * 4))
        self.mlp.add_module("c_proj", tnn.Linear(width * 4, width))
        self.ln_2 = tnn.LayerNorm(width)

    def forward(self, x, attn_mask=None):  # x: [S, B, W] (torch MHA default)
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        h = self.ln_2(x)
        h = self.mlp.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.mlp.c_proj(h)


class TorchCLIP(tnn.Module):
    """Minimal OpenAI-CLIP-architecture model with matching parameter names."""

    def __init__(self):
        super().__init__()
        grid = IMG // PATCH
        self.visual = tnn.Module()
        self.visual.conv1 = tnn.Conv2d(3, W, PATCH, PATCH, bias=False)
        self.visual.class_embedding = tnn.Parameter(torch.randn(W) * 0.02)
        self.visual.positional_embedding = tnn.Parameter(
            torch.randn(grid * grid + 1, W) * 0.02)
        self.visual.ln_pre = tnn.LayerNorm(W)
        self.visual.transformer = tnn.Module()
        self.visual.transformer.resblocks = tnn.ModuleList(
            [TorchResBlock(W, HEADS) for _ in range(L)])
        self.visual.ln_post = tnn.LayerNorm(W)
        self.visual.proj = tnn.Parameter(torch.randn(W, EMB) * 0.05)

        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TorchResBlock(W, HEADS) for _ in range(L)])
        self.token_embedding = tnn.Embedding(VOCAB, W)
        self.positional_embedding = tnn.Parameter(torch.randn(CTX, W) * 0.01)
        self.ln_final = tnn.LayerNorm(W)
        self.text_projection = tnn.Parameter(torch.randn(W, EMB) * 0.05)
        self.logit_scale = tnn.Parameter(torch.tensor(np.log(1 / 0.07),
                                                      dtype=torch.float32))

    def encode_image(self, images):  # [B, 3, H, W]
        x = self.visual.conv1(images)                      # [B, W, g, g]
        x = x.flatten(2).permute(0, 2, 1)                  # [B, g*g, W]
        cls = self.visual.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.visual.positional_embedding
        x = self.visual.ln_pre(x).permute(1, 0, 2)         # [S, B, W]
        for blk in self.visual.transformer.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        return self.visual.ln_post(x[:, 0]) @ self.visual.proj

    def encode_text(self, tokens):  # [N, CTX] int
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        mask = torch.triu(torch.full((CTX, CTX), float("-inf")), diagonal=1)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = self.ln_final(x.permute(1, 0, 2))
        eot = tokens.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection

    def forward(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        return self.logit_scale.exp() * img @ txt.t()


def _state_dict_with_openai_names(model: TorchCLIP) -> dict:
    """Torch names here already match OpenAI CLIP's (attn.in_proj_weight etc.)"""
    return {k: np.asarray(v.detach().numpy())
            for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    model = TorchCLIP().eval()
    sd = _state_dict_with_openai_names(model)
    params, cfg = vconvert.clip_params_from_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params, cfg


class TestClipConversion:
    def test_config_inferred_from_shapes(self, converted):
        _, _, cfg = converted
        assert cfg.visual.width == W and cfg.visual.layers == L
        assert cfg.visual.patch == PATCH and cfg.visual.image_size == IMG
        assert cfg.embed_dim == EMB
        assert cfg.text.vocab_size == VOCAB
        assert cfg.text.context_length == CTX

    def test_image_tower_matches_torch(self, converted):
        model, params, cfg = converted
        rs = np.random.RandomState(0)
        imgs = rs.randn(3, IMG, IMG, 3).astype(np.float32)
        with torch.no_grad():
            want = model.encode_image(
                torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(vclip.encode_image(params, jnp.asarray(imgs), cfg,
                                            use_pallas=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_text_tower_matches_torch(self, converted):
        model, params, cfg = converted
        rs = np.random.RandomState(1)
        # EOT = max token id per row, placed mid-sequence to test argmax pooling
        tokens = rs.randint(1, VOCAB - 2, (5, CTX))
        tokens[:, 0] = VOCAB - 2  # SOT-like
        for i in range(5):
            tokens[i, rs.randint(2, CTX)] = VOCAB - 1  # EOT (largest id)
        with torch.no_grad():
            want = model.encode_text(torch.tensor(tokens)).numpy()
        got = np.asarray(vclip.encode_text(params, jnp.asarray(tokens), cfg,
                                           use_pallas=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_full_prompt_similarity_head(self, converted):
        """model(images, prompts) -> [B, n_prompts] logit-scaled cosine —
        the CLIPHBA forward contract."""
        model, params, cfg = converted
        rs = np.random.RandomState(2)
        imgs = rs.randn(2, IMG, IMG, 3).astype(np.float32)
        tokens = rs.randint(1, VOCAB - 2, (7, CTX))
        tokens[:, -1] = VOCAB - 1
        with torch.no_grad():
            want = model(torch.tensor(imgs.transpose(0, 3, 1, 2)),
                         torch.tensor(tokens)).numpy()
        got = np.asarray(vclip.clip_hba_forward(
            params, jnp.asarray(imgs), jnp.asarray(tokens), cfg,
            use_pallas=False))
        assert got.shape == (2, 7)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestReverseExport:
    """Reverse converters (our pytrees -> torch state dicts): bit-exact
    round-trip through the forward converters, config re-inference, and a
    torch.load oracle on the saved .pth."""

    def _leaves_equal(self, a, b):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x, np.float32),
                                          np.asarray(y, np.float32))

    def test_clip_vit_roundtrip(self):
        # widths >= 64 so build_model's heads inference (width // 64) is exact
        cfg = vclip.tiny_clip_config(width=64, layers=2, heads=1, patch=16,
                                     image_size=32, embed_dim=16,
                                     vocab=50, context=12)
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        sd = vconvert.clip_state_dict_from_params(params, cfg)
        params2, cfg2 = vconvert.clip_params_from_state_dict(sd)
        assert cfg2 == cfg
        self._leaves_equal(params, params2)

    def test_clip_rn_roundtrip(self):
        from vit_project_tpu.models import resnet as vrn
        cfg = vclip.CLIPConfig(
            visual=vrn.ResNetConfig(layers=(1, 1, 2, 1), width=8, heads=4,
                                    image_size=64, out_dim=16),
            text=vclip.TextConfig(width=64, layers=2, heads=1,
                                  vocab_size=50, context_length=12),
            embed_dim=16)
        params = vclip.init_clip_params(jax.random.PRNGKey(1), cfg)
        sd = vconvert.clip_state_dict_from_params(params, cfg)
        assert "visual.layer4.0.downsample.0.weight" in sd
        assert "visual.bn1.num_batches_tracked" in sd  # torch buffer present
        params2, cfg2 = vconvert.clip_params_from_state_dict(sd)
        assert cfg2 == cfg
        self._leaves_equal(params, params2)

    def test_timm_roundtrip(self):
        from vit_project_tpu.models import vit as vvit
        cfg = vvit.ViTConfig(patch=16, width=64, layers=2, heads=1,
                             image_size=32, pre_norm=False, patch_bias=True,
                             num_classes=10)
        params = vvit.init_vit_params(jax.random.PRNGKey(2), cfg)
        sd = vconvert.timm_state_dict_from_vit_params(params, patch=cfg.patch)
        assert sd["pos_embed"].shape == (1, cfg.seq_len, cfg.width)
        assert sd["cls_token"].shape == (1, 1, cfg.width)
        params2 = vconvert.vit_params_from_timm_state_dict(sd)
        self._leaves_equal(params, params2)

    def test_patch_matrix_kernel_inverse(self):
        rng = np.random.default_rng(0)
        kernel = rng.normal(size=(8, 3, 4, 4)).astype(np.float32)  # OIHW
        mat = vconvert.conv_kernel_to_patch_matrix(kernel)
        back = vconvert.patch_matrix_to_conv_kernel(mat, patch=4)
        np.testing.assert_array_equal(kernel, back)

    def test_save_torch_state_dict_loads_in_torch(self, tmp_path):
        cfg = vclip.tiny_clip_config(width=64, layers=2, heads=1, patch=16,
                                     image_size=32, embed_dim=16,
                                     vocab=50, context=12)
        params = vclip.init_clip_params(jax.random.PRNGKey(3), cfg)
        sd = vconvert.clip_state_dict_from_params(params, cfg)
        path = str(tmp_path / "exported.pth")
        vconvert.save_torch_state_dict(path, sd)
        loaded = torch.load(path, map_location="cpu", weights_only=True)
        assert set(loaded) == set(sd)
        for k in sd:
            assert isinstance(loaded[k], torch.Tensor)
            np.testing.assert_array_equal(loaded[k].numpy(), sd[k])
        # and the generic forward loader consumes the file directly
        params2, cfg2 = vconvert.clip_params_from_state_dict(
            vconvert.load_torch_state_dict(path))
        assert cfg2 == cfg

    def test_dora_adapter_export_torch_loadable(self, tmp_path):
        from vit_project_tpu.adapters import dora as adora
        cfg = vclip.tiny_clip_config(width=64, layers=2, heads=1, patch=16,
                                     image_size=32, embed_dim=16,
                                     vocab=50, context=12)
        params = vclip.init_clip_params(jax.random.PRNGKey(4), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, _, _ = adora.apply_dora(params, spec, r=2,
                                           key=jax.random.PRNGKey(5))
        flat = adora.to_reference_names(trainable)
        path = str(tmp_path / "epoch1_dora_params.pth")
        vconvert.save_torch_state_dict(path, flat)
        loaded = torch.load(path, map_location="cpu", weights_only=True)
        assert set(loaded) == set(flat)
        for k, v in flat.items():
            np.testing.assert_array_equal(loaded[k].numpy(),
                                          np.asarray(v, np.float32))


class TestViTPretrainedValidator:
    """Synthetic oracle for examples/validate_vit_pretrained.py: the loader
    must unwrap every container shape the reference ships (raw timm state
    dict, jit-free full checkpoint with model_state_dict + DDP prefixes)
    and the converted tree must score the same RSA as the source params."""

    def _load_example(self):
        import importlib.util
        import pathlib
        path = pathlib.Path(__file__).resolve().parents[1] / "examples" / \
            "validate_vit_pretrained.py"
        spec = importlib.util.spec_from_file_location("validate_vit", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_container_unwrapping_roundtrip(self, tmp_path):
        import torch
        from vit_project_tpu.models import vit as vvit
        mod = self._load_example()
        cfg = vvit.ViTConfig(patch=16, width=64, layers=2, heads=1,
                             image_size=32, pre_norm=False, patch_bias=True,
                             num_classes=10)
        params = vvit.init_vit_params(jax.random.PRNGKey(4), cfg)
        sd = vconvert.timm_state_dict_from_vit_params(params, patch=cfg.patch)
        tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

        raw = str(tmp_path / "raw.pth")
        torch.save(tsd, raw)
        full = str(tmp_path / "full.pth")
        torch.save({
            "epoch": 0,
            "model_state_dict": {f"module.{k}": v for k, v in tsd.items()},
            "optimizer_state_dict": {"state": {}, "param_groups": []},
            "val_acc": 0.1,
        }, full)

        for path in (raw, full):
            back = vconvert.vit_params_from_timm_state_dict(
                mod.load_vit_weights(path))
            a = jax.tree_util.tree_leaves(params)
            b = jax.tree_util.tree_leaves(back)
            assert len(a) == len(b)
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           atol=1e-6)

    def test_rsa_matches_source_params(self, tmp_path):
        """End-to-end: a reference-style checkpoint written from known
        params must validate (exit 0) when --expect is that params tree's
        own THINGS-48 RSA."""
        import sys
        import torch
        import scipy.io
        from PIL import Image
        from vit_project_tpu.core.configs import ViTTrainConfig
        from vit_project_tpu.models import vit as vvit
        from vit_project_tpu.train.vit_loop import ViTTrainer
        from vit_project_tpu.cli.vit_measure import load_things_for_vit
        mod = self._load_example()

        cfg = vvit.ViTConfig(patch=16, width=64, layers=2, heads=1,
                             image_size=32, pre_norm=False, patch_bias=True,
                             num_classes=10)
        params = vvit.init_vit_params(jax.random.PRNGKey(5), cfg)

        rs = np.random.RandomState(0)
        img_dir = tmp_path / "things"
        img_dir.mkdir()
        names = []
        for i in range(48):
            n = f"t{i:02d}.png"
            Image.fromarray(rs.randint(0, 255, (32, 32, 3),
                                       np.uint8)).save(str(img_dir / n))
            names.append(n)
        import pandas as pd
        csv = str(tmp_path / "things48.csv")
        pd.DataFrame({"image_name": names}).to_csv(csv, index=False)
        rdm = rs.rand(48, 48)
        rdm = ((rdm + rdm.T) / 2).astype(np.float32)
        np.fill_diagonal(rdm, 0)
        rdm_path = str(tmp_path / "rdm.mat")
        scipy.io.savemat(rdm_path, {"RDM48_triplet": rdm})

        trainer = ViTTrainer(cfg, ViTTrainConfig(
            batch_size=8, compute_dtype="float32", image_size=32,
            num_classes=10))
        _, things_images = load_things_for_vit(csv, str(img_dir), size=32)
        rho, _ = trainer.compute_rsa_score(
            jax.tree_util.tree_map(jnp.asarray, params), things_images, rdm,
            batch_size=8)

        sd = vconvert.timm_state_dict_from_vit_params(params, patch=cfg.patch)
        ckpt = str(tmp_path / "checkpoint_epoch_000.pth")
        torch.save({"model_state_dict": {
            f"module.{k}": torch.from_numpy(np.asarray(v))
            for k, v in sd.items()}}, ckpt)

        argv = ["validate_vit_pretrained.py", "--weights", ckpt,
                "--things_csv", csv, "--things_img_dir", str(img_dir),
                "--things_rdm", rdm_path, "--backbone", "test-tiny-b16p16",
                "--expect", f"{float(rho):.6f}", "--tol", "0.02",
                "--batch_size", "8"]
        vvit.VIT_CONFIGS["test-tiny-b16p16"] = cfg
        old = sys.argv
        try:
            sys.argv = argv
            rc = mod.main()
        finally:
            sys.argv = old
            vvit.VIT_CONFIGS.pop("test-tiny-b16p16", None)
        assert rc == 0
