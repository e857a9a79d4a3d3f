"""AOT serving-artifact tests (serve/export.py): export -> load roundtrip
equals the live engine on every bucket path (padded, chunked, streamed),
the artifact layout/manifest contract, and the loader's validation
(platform binding, shape binding, non-artifact dirs)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.models import vit as vvit
from vit_project_tpu.parallel import mesh as vmesh
from vit_project_tpu.serve import vit_classifier_engine
from vit_project_tpu.serve import export as sexport

TINY = vvit.VIT_CONFIGS["test-tiny"]
SHAPE = (TINY.image_size, TINY.image_size, 3)


def _tiny_vit():
    return vvit.init_vit_params(jax.random.PRNGKey(0), TINY)


def _images(n, seed=0):
    rs = np.random.RandomState(seed)
    return rs.rand(n, *SHAPE).astype(np.float32)


def _engine(params, **kw):
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("use_pallas", False)
    return vit_classifier_engine(params, TINY, **kw)


class TestExportRoundtrip:
    def test_outputs_equal_live_engine(self, tmp_path):
        params = _tiny_vit()
        live = _engine(params, buckets=(2, 4))
        d = str(tmp_path / "art")
        manifest = sexport.export_serving(live, SHAPE, d)
        assert manifest["buckets"] == [2, 4]
        aot = sexport.load_serving(d)
        for n in (1, 2, 3, 4, 9):  # pad, exact, pad, exact, chunked
            np.testing.assert_allclose(aot(_images(n)), live(_images(n)),
                                       rtol=1e-5, atol=1e-6)

    def test_map_stream_and_warmup(self, tmp_path):
        params = _tiny_vit()
        live = _engine(params, buckets=(2, 4))
        d = str(tmp_path / "art")
        sexport.export_serving(live, SHAPE, d)
        aot = sexport.load_serving(d)
        aot.warmup(SHAPE)
        batches = [_images(3, seed=1), _images(6, seed=2)]
        got = list(aot.map_stream(iter(batches)))
        want = [live(b) for b in batches]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    def test_artifact_layout(self, tmp_path):
        d = str(tmp_path / "art")
        sexport.export_serving(_engine(_tiny_vit(), buckets=(2,)), SHAPE, d)
        assert sorted(os.listdir(d)) == ["bucket_00002.jaxexp",
                                         "manifest.json", "params.pth"]
        m = json.load(open(os.path.join(d, "manifest.json")))
        assert m["format"].startswith("vit_project_tpu.aot_serving/")
        assert m["example_shape"] == list(SHAPE)
        assert m["input_dtype"] == "float32"
        assert jax.default_backend() in [p.lower() for p in m["platforms"]]

    def test_input_dtype_is_enforced_by_cast(self, tmp_path):
        # uint8 export: float requests are cast to the exported dtype
        params = _tiny_vit()
        live = _engine(params, buckets=(2,))
        d = str(tmp_path / "art")
        sexport.export_serving(live, SHAPE, d, input_dtype=np.uint8)
        aot = sexport.load_serving(d)
        imgs = (_images(2) * 255).astype(np.uint8)
        np.testing.assert_allclose(aot(imgs), live(imgs.astype(np.float32)),
                                   rtol=1e-5, atol=1e-6)


class TestValidation:
    def test_meshed_engine_refused(self, tmp_path):
        eng = _engine(_tiny_vit(), buckets=(8,), mesh=vmesh.make_mesh())
        with pytest.raises(ValueError, match="single-device"):
            sexport.export_serving(eng, SHAPE, str(tmp_path / "a"))

    def test_platform_mismatch_refused(self, tmp_path):
        d = str(tmp_path / "art")
        sexport.export_serving(_engine(_tiny_vit(), buckets=(2,)), SHAPE, d)
        m = json.load(open(os.path.join(d, "manifest.json")))
        m["platforms"] = ["woven9000"]
        json.dump(m, open(os.path.join(d, "manifest.json"), "w"))
        with pytest.raises(ValueError, match="platform"):
            sexport.load_serving(d)

    def test_wrong_request_shape_refused(self, tmp_path):
        d = str(tmp_path / "art")
        sexport.export_serving(_engine(_tiny_vit(), buckets=(2,)), SHAPE, d)
        aot = sexport.load_serving(d)
        bad = np.zeros((2, 8, 8, 3), np.float32)
        with pytest.raises(ValueError, match="exported example shape"):
            aot(bad)

    def test_non_artifact_dir_refused(self, tmp_path):
        d = str(tmp_path / "not_art")
        os.makedirs(d)
        json.dump({"format": "something/else"},
                  open(os.path.join(d, "manifest.json"), "w"))
        with pytest.raises(ValueError, match="not an AOT serving artifact"):
            sexport.load_serving(d)
