"""Serving-engine tests: bucket padding/chunking equivalence vs the direct
forward, jit-cache boundedness, dp-mesh serving, ordered streaming, and the
baked-DoRA CLIP-HBA engine (which must equal the adapted training forward)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.adapters import dora as adora
from vit_project_tpu.models import clip as vclip
from vit_project_tpu.models import vit as vvit
from vit_project_tpu.parallel import mesh as vmesh
from vit_project_tpu.serve import (InferenceEngine, clip_hba_engine,
                                   vit_classifier_engine)

TINY = vvit.VIT_CONFIGS["test-tiny"]


def _tiny_vit():
    return vvit.init_vit_params(jax.random.PRNGKey(0), TINY)


def _images(n, seed=0):
    rs = np.random.RandomState(seed)
    return rs.rand(n, TINY.image_size, TINY.image_size, 3).astype(np.float32)


def _engine(params, **kw):
    kw.setdefault("compute_dtype", jnp.float32)  # exact vs the direct call
    kw.setdefault("use_pallas", False)
    return vit_classifier_engine(params, TINY, **kw)


class TestBucketing:
    def test_padding_equivalence(self):
        """B between buckets pads up; outputs equal the unpadded forward."""
        params = _tiny_vit()
        eng = _engine(params, buckets=(4, 8))
        imgs = _images(5)
        got = eng(imgs)
        want = np.asarray(vvit.vit_classify(params, jnp.asarray(imgs), TINY,
                                            use_pallas=False))
        assert got.shape == (5, TINY.num_classes)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_chunking_above_max_bucket(self):
        """B > max bucket splits into max-bucket chunks (here 4+4+2->4)."""
        params = _tiny_vit()
        eng = _engine(params, buckets=(2, 4))
        imgs = _images(10)
        got = eng(imgs)
        want = np.asarray(vvit.vit_classify(params, jnp.asarray(imgs), TINY,
                                            use_pallas=False))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_jit_cache_bounded_by_ladder(self):
        """Many request sizes -> at most one compile per bucket."""
        params = _tiny_vit()
        eng = _engine(params, buckets=(4, 8))
        for n in (1, 2, 3, 4, 5, 7, 8, 9, 11):
            assert eng(_images(n)).shape == (n, TINY.num_classes)
        if hasattr(eng._fn, "_cache_size"):
            assert eng._fn._cache_size() <= len(eng.buckets)

    def test_warmup_compiles_every_bucket(self):
        params = _tiny_vit()
        eng = _engine(params, buckets=(2, 4))
        eng.warmup((TINY.image_size, TINY.image_size, 3))
        if hasattr(eng._fn, "_cache_size"):
            assert eng._fn._cache_size() == len(eng.buckets)

    def test_empty_batch_rejected(self):
        eng = _engine(_tiny_vit(), buckets=(4,))
        with pytest.raises(ValueError, match="empty"):
            eng(_images(4)[:0])

    def test_bad_buckets_rejected(self):
        with pytest.raises(ValueError, match="positive"):
            InferenceEngine(lambda p, x: x, {}, buckets=())
        with pytest.raises(ValueError, match="positive"):
            InferenceEngine(lambda p, x: x, {}, buckets=(0, 4))


class TestMeshServing:
    def test_dp_mesh_matches_single_device(self):
        params = _tiny_vit()
        mesh = vmesh.make_mesh()  # all 8 virtual devices on the data axis
        solo = _engine(params, buckets=(8, 16))
        dp = _engine(params, buckets=(8, 16), mesh=mesh)
        imgs = _images(11)  # chunk of 11 -> pad to 16 over 8 devices
        np.testing.assert_allclose(dp(imgs), solo(imgs), rtol=1e-5, atol=1e-5)

    def test_bucket_not_multiple_of_mesh_rejected(self):
        mesh = vmesh.make_mesh()
        with pytest.raises(ValueError, match="multiples"):
            _engine(_tiny_vit(), buckets=(4, 8), mesh=mesh)

    def test_tp_sharded_serving_matches_solo(self):
        """shard_params=shard_vit_params_tp: tensor-parallel serving over a
        ('data','model') mesh equals the single-device forward."""
        params = _tiny_vit()
        mesh = vmesh.make_mesh(n_data=4, n_model=2)
        solo = _engine(params, buckets=(4, 8))
        tp = _engine(params, buckets=(4, 8), mesh=mesh,
                     shard_params=lambda m, p: vmesh.shard_vit_params_tp(
                         m, p, heads=TINY.heads))
        imgs = _images(7)
        np.testing.assert_allclose(tp(imgs), solo(imgs), rtol=1e-5, atol=1e-5)

    def test_shard_params_without_mesh_rejected(self):
        with pytest.raises(ValueError, match="mesh"):
            _engine(_tiny_vit(), buckets=(4,),
                    shard_params=lambda m, p: p)


class TestStreaming:
    def test_map_stream_matches_calls_in_order(self):
        params = _tiny_vit()
        eng = _engine(params, buckets=(2, 4))
        batches = [_images(3, seed=1), _images(9, seed=2), _images(1, seed=3),
                   _images(4, seed=4)]
        outs = list(eng.map_stream(iter(batches), depth=2))
        assert len(outs) == len(batches)
        for got, imgs in zip(outs, batches):
            np.testing.assert_allclose(got, eng(imgs), rtol=1e-5, atol=1e-5)

    def test_map_stream_depth_one(self):
        eng = _engine(_tiny_vit(), buckets=(4,))
        batches = [_images(2, seed=5), _images(6, seed=6)]
        outs = list(eng.map_stream(batches, depth=1))
        assert [o.shape[0] for o in outs] == [2, 6]

    def test_map_stream_bad_depth(self):
        eng = _engine(_tiny_vit(), buckets=(4,))
        with pytest.raises(ValueError, match="depth"):
            list(eng.map_stream([_images(2)], depth=0))


class TestClipHbaEngine:
    def test_baked_dora_equals_adapted_forward(self):
        """Engine (DoRA baked into frozen weights) == training-path forward
        with live adapters, dropout off — the zero-overhead-serving claim."""
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(1), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, static, acfg = adora.apply_dora(
            params, spec, r=4, alpha=16, key=jax.random.PRNGKey(2))
        # perturb the adapters away from init so baking is non-trivial
        trainable = jax.tree_util.tree_map(lambda x: x + 0.01, trainable)
        tokens = np.asarray(
            jax.random.randint(jax.random.PRNGKey(3), (6, cfg.text.context_length),
                               0, cfg.text.vocab_size))
        rs = np.random.RandomState(7)
        imgs = rs.rand(5, cfg.visual.image_size, cfg.visual.image_size,
                       3).astype(np.float32)

        eng = clip_hba_engine(params, tokens, cfg, trainable=trainable,
                              static=static, alpha=16, r=4,
                              compute_dtype=jnp.float32, use_pallas=False,
                              buckets=(8,))
        got = eng(imgs)

        want = np.asarray(vclip.clip_hba_forward(
            params, jnp.asarray(imgs), jnp.asarray(tokens), cfg,
            adapters=adora.assemble(trainable, static), adapter_cfg=acfg,
            deterministic=True, use_pallas=False))
        assert got.shape == (5, 6)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_trainable_without_static_rejected(self):
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(1), cfg)
        with pytest.raises(ValueError, match="both"):
            clip_hba_engine(params, np.zeros((2, cfg.text.context_length), np.int32),
                            cfg, trainable={})

    def test_bf16_params_serving_close(self):
        """param_dtype=bf16 (the HBM-traffic halver) stays close to f32."""
        params = _tiny_vit()
        f32 = _engine(params, buckets=(8,))
        bf16 = vit_classifier_engine(params, TINY, buckets=(8,),
                                     compute_dtype=jnp.bfloat16,
                                     use_pallas=False,
                                     param_dtype=jnp.bfloat16)
        imgs = _images(6)
        a, b = f32(imgs), bf16(imgs)
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.1)
