"""cli.export_torch end-to-end: CLIP (bake trained DoRA adapters back into an
OpenAI-format state dict) and ViT (our full-state checkpoint -> timm state
dict), both verified by loading the produced .pth with torch and comparing
against the in-process bake/param trees."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vit_project_tpu.adapters import dora as adora
from vit_project_tpu.ckpt import clip_ckpt, vit_ckpt
from vit_project_tpu.cli import export_torch as xt
from vit_project_tpu.models import clip as vclip
from vit_project_tpu.models import convert as vconvert
from vit_project_tpu.models import vit as vvit


@pytest.fixture(scope="module")
def tiny_cfg():
    return vclip.tiny_clip_config(width=64, layers=2, heads=1, patch=16,
                                  image_size=32, embed_dim=16,
                                  vocab=50, context=12)


class TestExportClip:
    def _setup_run(self, tmp_path, cfg):
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        base = str(tmp_path / "base_clip.pth")
        vconvert.save_torch_state_dict(
            base, vconvert.clip_state_dict_from_params(params, cfg))
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, static, _ = adora.apply_dora(params, spec, r=2,
                                                key=jax.random.PRNGKey(1))
        # "train": deterministically move the adapters off their init
        trainable = jax.tree_util.tree_map(lambda x: x * 1.5 + 0.01, trainable)
        path = clip_ckpt.save_dora_parameters(trainable, str(tmp_path / "dora"), 0)
        # the training-side writer produces a REAL torch archive: the
        # reference's torch.load path (new_cvpr...pipeline.py:1156-1171)
        # consumes it directly, even under weights_only=True
        loaded = torch.load(path, map_location="cpu", weights_only=True)
        ref = adora.to_reference_names(trainable)
        assert set(loaded) == set(ref)
        for k in ref:
            assert isinstance(loaded[k], torch.Tensor)
            np.testing.assert_array_equal(loaded[k].numpy(),
                                          np.asarray(ref[k], np.float32))
        return params, trainable, static, spec, base

    def test_bake_and_export(self, tmp_path, tiny_cfg):
        cfg = tiny_cfg
        params, trainable, static, spec, base = self._setup_run(tmp_path, cfg)
        out = str(tmp_path / "exported_clip.pth")
        rc = xt.main(["clip", "--clip_weights", base,
                      "--dora_checkpoint",
                      str(tmp_path / "dora" / "epoch1_dora_params.pth"),
                      "--vision_layers", "1", "--transformer_layers", "1",
                      "--rank", "2", "--out", out])
        assert rc == 0
        params2, cfg2 = vconvert.clip_params_from_state_dict(
            vconvert.load_torch_state_dict(out))
        assert cfg2 == cfg
        baked = adora.bake(params, trainable, static, alpha=16, r=2)
        for tower in ("visual", "text"):
            for idx in spec[tower]:
                np.testing.assert_allclose(
                    np.asarray(params2[tower]["blocks"][idx]["out_w"]),
                    np.asarray(baked[tower]["blocks"][idx]["out_w"],
                               np.float32), rtol=0, atol=1e-6)
        # unadapted blocks ride through untouched
        np.testing.assert_array_equal(
            np.asarray(params2["visual"]["blocks"][0]["fc1_w"]),
            np.asarray(params["visual"]["blocks"][0]["fc1_w"], np.float32))

    def test_extra_adapter_blocks_is_loud(self, tmp_path, tiny_cfg):
        """The converse guard: a checkpoint trained with MORE adapted blocks
        than the export flags request must refuse (silently dropping a
        trained adapter from the bake is a numerically wrong export)."""
        cfg = tiny_cfg
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        base = str(tmp_path / "base_clip.pth")
        vconvert.save_torch_state_dict(
            base, vconvert.clip_state_dict_from_params(params, cfg))
        # train BOTH vision blocks (cfg.visual.layers == 2)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 2, 1)
        trainable, _, _ = adora.apply_dora(params, spec, r=2,
                                           key=jax.random.PRNGKey(1))
        clip_ckpt.save_dora_parameters(trainable, str(tmp_path / "dora"), 0)
        with pytest.raises(SystemExit, match="not covered by"):
            xt.main(["clip", "--clip_weights", base,
                     "--dora_checkpoint",
                     str(tmp_path / "dora" / "epoch1_dora_params.pth"),
                     "--vision_layers", "1", "--transformer_layers", "1",
                     "--rank", "2", "--out", str(tmp_path / "x.pth")])

    def test_missing_adapter_blocks_is_loud(self, tmp_path, tiny_cfg):
        cfg = tiny_cfg
        _, _, _, _, base = self._setup_run(tmp_path, cfg)
        # ask for 2 vision layers when the checkpoint only carries 1
        with pytest.raises(SystemExit, match="missing adapters"):
            xt.main(["clip", "--clip_weights", base,
                     "--dora_checkpoint",
                     str(tmp_path / "dora" / "epoch1_dora_params.pth"),
                     "--vision_layers", "2", "--transformer_layers", "1",
                     "--rank", "2", "--out", str(tmp_path / "x.pth")])


class TestExportVit:
    def test_checkpoint_to_timm(self, tmp_path):
        cfg = vvit.VIT_CONFIGS["test-tiny"]
        params = vvit.init_vit_params(jax.random.PRNGKey(2), cfg)
        vit_ckpt.save_checkpoint(3, params, {"momentum": None},
                                 {"last_epoch": 3}, 1.0, 2.0, 0.5,
                                 str(tmp_path), sharded=False)
        out = str(tmp_path / "timm_export.pth")
        rc = xt.main(["vit", "--checkpoint",
                      str(tmp_path / "checkpoint_epoch_003.pth"),
                      "--backbone", "test-tiny", "--out", out])
        assert rc == 0
        loaded = torch.load(out, map_location="cpu", weights_only=True)
        assert loaded["head.weight"].shape == (10, 32)
        back = vconvert.vit_params_from_timm_state_dict(
            {k: v.numpy() for k, v in loaded.items()})
        la = jax.tree_util.tree_leaves(params)
        lb = jax.tree_util.tree_leaves(back)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b, np.float32))

    def test_unknown_backbone_is_loud(self, tmp_path):
        with pytest.raises(SystemExit, match="unknown --backbone"):
            xt.main(["vit", "--checkpoint", "x.pth",
                     "--backbone", "nope", "--out", "y.pth"])
