"""Int8 serving quantization: exactness on representable inputs, error bounds
vs the f32 forward, dispatch through ops.nn.dense, both attention paths, and
the quantized serve constructors (incl. bake-then-quantize for CLIP-HBA)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.adapters import dora as adora
from vit_project_tpu.models import clip as vclip
from vit_project_tpu.models import vit as vvit
from vit_project_tpu.ops import nn as vnn
from vit_project_tpu.ops import quant as vquant
from vit_project_tpu.serve import clip_hba_engine, vit_classifier_engine

TINY = vvit.VIT_CONFIGS["test-tiny"]


class TestInt8Dense:
    def test_exact_on_representable_inputs(self):
        """Integer x and w with amax=127 quantize losslessly -> exact dot."""
        rs = np.random.RandomState(0)
        x = rs.randint(-127, 128, (4, 16)).astype(np.float32)
        x[:, 0] = 127  # pin every row scale to exactly 1
        w = rs.randint(-127, 128, (16, 8)).astype(np.float32)
        w[0, :] = 127  # pin every column scale to exactly 1
        wq = vquant.quantize_weight(w)
        got = vquant.int8_dense(jnp.asarray(x), wq)
        np.testing.assert_array_equal(np.asarray(got), x @ w)

    def test_close_on_random_inputs(self):
        rs = np.random.RandomState(1)
        x = rs.randn(8, 64).astype(np.float32)
        w = rs.randn(64, 32).astype(np.float32)
        b = rs.randn(32).astype(np.float32)
        got = np.asarray(vquant.int8_dense(jnp.asarray(x),
                                           vquant.quantize_weight(w),
                                           jnp.asarray(b)))
        want = x @ w + b
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.02, rel

    def test_per_channel_scales_isolate_outlier_column(self):
        """One huge column must not destroy the others' resolution."""
        rs = np.random.RandomState(2)
        w = rs.randn(32, 4).astype(np.float32)
        w[:, 0] *= 1000.0
        x = rs.randn(4, 32).astype(np.float32)
        got = np.asarray(vquant.int8_dense(jnp.asarray(x),
                                           vquant.quantize_weight(w)))
        want = x @ w
        rel_rest = (np.linalg.norm(got[:, 1:] - want[:, 1:])
                    / np.linalg.norm(want[:, 1:]))
        assert rel_rest < 0.03, rel_rest

    def test_dense_dispatches_on_dict(self):
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(2, 8).astype(np.float32))
        w = rs.randn(8, 4).astype(np.float32)
        via_nn = vnn.dense(x, vquant.quantize_weight(w))
        via_quant = vquant.int8_dense(x, vquant.quantize_weight(w))
        np.testing.assert_array_equal(np.asarray(via_nn),
                                      np.asarray(via_quant))

    def test_dequantize_roundtrip_error_bound(self):
        rs = np.random.RandomState(4)
        w = rs.randn(16, 16).astype(np.float32)
        wd = np.asarray(vquant.dequantize_weight(vquant.quantize_weight(w)))
        colmax = np.abs(w).max(axis=0)
        assert np.all(np.abs(wd - w) <= colmax / 254 + 1e-6)


class TestQuantizedViT:
    def _logits(self, params, imgs, **kw):
        return np.asarray(vvit.vit_classify(params, jnp.asarray(imgs), TINY,
                                            **kw))

    def test_quantized_forward_close_to_f32(self):
        params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
        qparams = vquant.quantize_vit_blocks(params)
        rs = np.random.RandomState(5)
        imgs = rs.rand(4, TINY.image_size, TINY.image_size,
                       3).astype(np.float32)
        f32 = self._logits(params, imgs, use_pallas=False)
        q = self._logits(qparams, imgs, use_pallas=False)
        rel = np.linalg.norm(q - f32) / np.linalg.norm(f32)
        assert rel < 0.05, rel
        # the quantized forward must still rank classes like the f32 one
        assert (np.argmax(q, -1) == np.argmax(f32, -1)).mean() >= 0.75

    def test_quantized_pallas_path_matches_xla_path(self):
        """Interpret-mode packed kernel on the int8-produced qkv == XLA core."""
        params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
        qparams = vquant.quantize_vit_blocks(params)
        rs = np.random.RandomState(6)
        imgs = rs.rand(3, TINY.image_size, TINY.image_size,
                       3).astype(np.float32)
        a = self._logits(qparams, imgs, use_pallas=False)
        b = self._logits(qparams, imgs, use_pallas=True)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_non_block_weights_stay_float(self):
        params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
        qparams = vquant.quantize_vit_blocks(params)
        assert not vquant.is_quantized(qparams["patch_w"])
        assert not vquant.is_quantized(qparams["head_w"])
        for bp in qparams["blocks"]:
            assert vquant.is_quantized(bp["qkv_w"])
            assert vquant.is_quantized(bp["fc2_w"])
            assert bp["qkv_b"].dtype == jnp.float32

    def test_moe_blocks_left_untouched(self):
        cfg = vvit.ViTConfig(patch=8, width=32, layers=2, heads=2,
                             image_size=32, num_classes=10, moe_experts=2)
        params = vvit.init_vit_params(jax.random.PRNGKey(0), cfg)
        qparams = vquant.quantize_vit_blocks(params)
        moe_idx = [i for i in range(cfg.layers) if cfg.is_moe_block(i)]
        assert moe_idx
        for i in moe_idx:
            assert not vquant.is_quantized(qparams["blocks"][i]["qkv_w"])


class TestQuantizedEngines:
    def test_vit_engine_quantize_close(self):
        params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
        rs = np.random.RandomState(7)
        imgs = rs.rand(5, TINY.image_size, TINY.image_size,
                       3).astype(np.float32)
        f32 = vit_classifier_engine(params, TINY, buckets=(8,),
                                    compute_dtype=jnp.float32,
                                    use_pallas=False)
        q = vit_classifier_engine(params, TINY, buckets=(8,),
                                  compute_dtype=jnp.float32,
                                  use_pallas=False, quantize="int8")
        a, b = f32(imgs), q(imgs)
        rel = np.linalg.norm(b - a) / np.linalg.norm(a)
        assert rel < 0.05, rel

    def test_unknown_quantize_mode_rejected(self):
        params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
        with pytest.raises(ValueError, match="int8"):
            vit_classifier_engine(params, TINY, quantize="fp4")

    def test_clip_engine_bake_then_quantize(self):
        """Quantized CLIP-HBA engine serves scores close to the adapted f32
        forward — i.e. quantization happened AFTER the DoRA bake."""
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(1), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, static, acfg = adora.apply_dora(
            params, spec, r=4, alpha=16, key=jax.random.PRNGKey(2))
        trainable = jax.tree_util.tree_map(lambda x: x + 0.05, trainable)
        tokens = np.asarray(
            jax.random.randint(jax.random.PRNGKey(3),
                               (6, cfg.text.context_length), 0,
                               cfg.text.vocab_size))
        rs = np.random.RandomState(8)
        imgs = rs.rand(4, cfg.visual.image_size, cfg.visual.image_size,
                       3).astype(np.float32)
        eng = clip_hba_engine(params, tokens, cfg, trainable=trainable,
                              static=static, alpha=16, r=4,
                              compute_dtype=jnp.float32, use_pallas=False,
                              buckets=(8,), quantize="int8")
        got = eng(imgs)
        want = np.asarray(vclip.clip_hba_forward(
            params, jnp.asarray(imgs), jnp.asarray(tokens), cfg,
            adapters=adora.assemble(trainable, static), adapter_cfg=acfg,
            deterministic=True, use_pallas=False))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.08, rel
        # and the BAKE must matter: quantizing the UN-adapted tree is farther
        plain = clip_hba_engine(params, tokens, cfg,
                                compute_dtype=jnp.float32, use_pallas=False,
                                buckets=(8,), quantize="int8")(imgs)
        rel_plain = np.linalg.norm(plain - want) / np.linalg.norm(want)
        assert rel_plain > rel
