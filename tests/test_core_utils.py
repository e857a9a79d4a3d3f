"""Direct unit tests for small core/adapter utilities that the integration
suites only exercise indirectly: adapters/lora.py (reference dead-code parity,
new_cvpr...pipeline.py:307-404), core/compile_cache.py, core/profiling.py."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.adapters import lora as vlora
from vit_project_tpu.core import compile_cache, profiling


class TestLoRA:
    def test_init_quirk_both_matrices_nonzero(self):
        """Reference quirk (ref :321-323): BOTH lora_A and lora_B are
        kaiming-initialized, so the adapter perturbs the model from step 0
        (textbook LoRA zeroes B for an identity start)."""
        p = vlora.lora_init(jax.random.PRNGKey(0), 8, 6, r=3)
        assert p["lora_A"].shape == (3, 6) and p["lora_B"].shape == (8, 3)
        assert float(jnp.abs(p["lora_A"]).max()) > 0
        assert float(jnp.abs(p["lora_B"]).max()) > 0
        # kaiming-uniform(a=sqrt(5)) bound is 1/sqrt(fan_in) with torch
        # fan_in = shape[1]
        assert float(jnp.abs(p["lora_A"]).max()) <= 1 / np.sqrt(6)
        assert float(jnp.abs(p["lora_B"]).max()) <= 1 / np.sqrt(3)

    def test_deterministic_linear_equals_merged_weight(self):
        """With dropout off, y = x @ merged_w + b exactly (the reference
        LoRALayer.weight property's contract)."""
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(4, 8).astype(np.float32))
        w = jnp.asarray(rs.randn(8, 6).astype(np.float32))
        b = jnp.asarray(rs.randn(6).astype(np.float32))
        p = vlora.lora_init(jax.random.PRNGKey(1), 8, 6, r=3)
        y = vlora.lora_linear(x, w, b, p, alpha=16, r=3)
        merged = vlora.lora_merged_weight(w, p, alpha=16, r=3)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(x @ merged + b),
                                   rtol=1e-5, atol=1e-5)
        # manual merged-weight math
        want = np.asarray(w) + (np.asarray(p["lora_B"])
                                @ np.asarray(p["lora_A"])) * (16 / 3)
        np.testing.assert_allclose(np.asarray(merged), want, rtol=1e-6)

    def test_dropout_hits_activations_only(self):
        """Reference quirk (ref :328): dropout is applied to the activations
        feeding the low-rank path, NOT to the base path — a fully-dropped
        input still produces the base projection."""
        x = jnp.ones((2, 8))
        w = jnp.eye(8, 6)
        p = vlora.lora_init(jax.random.PRNGKey(1), 8, 6, r=3)
        full_drop = vlora.lora_linear(
            x, w, None, p, alpha=16, r=3, dropout_p=1.0 - 1e-7,
            dropout_key=jax.random.PRNGKey(2), deterministic=False)
        np.testing.assert_allclose(np.asarray(full_drop), np.asarray(x @ w),
                                   atol=1e-4)
        # deterministic=True ignores dropout entirely
        a = vlora.lora_linear(x, w, None, p, alpha=16, r=3, dropout_p=0.9)
        b = vlora.lora_linear(x, w, None, p, alpha=16, r=3, dropout_p=0.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCompileCache:
    def _restore(self):
        jax.config.update("jax_compilation_cache_dir", None)

    def test_enables_and_creates_dir(self, tmp_path, monkeypatch):
        monkeypatch.delenv("VIT_TPU_NO_COMPILE_CACHE", raising=False)
        d = str(tmp_path / "xla_cache")
        try:
            got = compile_cache.enable_persistent_cache(d)
            assert got == d and os.path.isdir(d)
            assert jax.config.jax_compilation_cache_dir == d
        finally:
            self._restore()

    def test_env_override_and_kill_switch(self, tmp_path, monkeypatch):
        monkeypatch.setenv("VIT_TPU_NO_COMPILE_CACHE", "1")
        assert compile_cache.enable_persistent_cache() is None
        monkeypatch.delenv("VIT_TPU_NO_COMPILE_CACHE")
        d = str(tmp_path / "via_env")
        monkeypatch.setenv("VIT_TPU_COMPILE_CACHE_DIR", d)
        try:
            assert compile_cache.enable_persistent_cache() == d
        finally:
            self._restore()


class TestProfiling:
    def test_trace_none_is_noop(self):
        with profiling.trace(None):
            x = 1 + 1
        assert x == 2

    def test_epoch_timer_format(self):
        t = profiling.EpochTimer()
        line = t.finish(images=100)
        assert line.startswith("epoch_time=") and "images_per_sec=" in line
        assert t.seconds() >= 0.0
        # no images -> no throughput field
        assert "images_per_sec" not in profiling.EpochTimer().finish()


class TestCheckpointTempReaping:
    def test_stale_temps_reaped_fresh_survive(self, tmp_path):
        """reap_stale_temps deletes abandoned pid-temps (>1h) next to a
        target but leaves a live racing writer's fresh temp alone — shared
        by ser.save and the vit_ckpt 'latest' byte-copy path."""
        import time
        from vit_project_tpu.ckpt import serialization as ser

        target = tmp_path / "checkpoint_latest.pth"
        stale = tmp_path / "checkpoint_latest.pth.tmp.111"
        fresh = tmp_path / "checkpoint_latest.pth.tmp.222"
        stale.write_bytes(b"x")
        fresh.write_bytes(b"y")
        os.utime(stale, (time.time() - 7200, time.time() - 7200))
        ser.reap_stale_temps(str(target))
        assert not stale.exists()
        assert fresh.exists()

    def test_vit_latest_copy_reaps(self, tmp_path, monkeypatch):
        """save_checkpoint's 'latest' byte copy reaps stale temps the same
        way ser.save does (a SIGKILLed run must not leak multi-hundred-MB
        temp copies forever)."""
        import time
        import jax.numpy as jnp
        from vit_project_tpu.ckpt import vit_ckpt

        stale = tmp_path / "checkpoint_latest.pth.tmp.999"
        stale.write_bytes(b"x" * 10)
        os.utime(stale, (time.time() - 7200, time.time() - 7200))
        vit_ckpt.save_checkpoint(
            0, {"w": jnp.ones(2)}, {"m": jnp.zeros(2)},
            {"last_epoch": 0}, 1.0, 2.0, 3.0, str(tmp_path), sharded=False)
        assert not stale.exists()
        assert (tmp_path / "checkpoint_latest.pth").exists()


class TestConfigDefaults:
    def test_clip_host_prefetch_default_on(self):
        """Measured -19% steady per-epoch on chip (BENCHLOG round 3): the
        config default is ON, and the batched multi-fork setup reads the
        SAME parsed config (not a divergent dict fallback)."""
        from vit_project_tpu.core.configs import ClipRunConfig
        assert ClipRunConfig().host_prefetch is True


class TestFlatContainerRobustness:
    """save_torch/load_flat container edge cases (round-3 review findings)."""

    def test_save_torch_falls_back_to_pickle_without_torch(self, tmp_path,
                                                           monkeypatch):
        """On a torch-less host the per-epoch adapter writer degrades to the
        native pickle container instead of crashing the run at the first
        checkpoint — load_flat reads both identically."""
        import sys
        from vit_project_tpu.ckpt import serialization as ser

        monkeypatch.setitem(sys.modules, "torch", None)  # import -> ImportError
        monkeypatch.setattr(ser, "_WARNED_NO_TORCH", False)
        path = str(tmp_path / "epoch1_dora_params.pth")
        flat = {"a.m": np.arange(4, dtype=np.float32),
                "a.delta_D_A": np.ones((2, 3), np.float32)}
        ser.save_torch(path, flat)
        back = ser.load_flat(path)
        assert set(back) == set(flat)
        for k in flat:
            np.testing.assert_array_equal(back[k], flat[k])

    def test_load_flat_corrupt_file_diagnosis(self, tmp_path):
        """A truncated/corrupt checkpoint reports itself as such instead of
        an opaque torch error (or ModuleNotFoundError on torch-less hosts)."""
        from vit_project_tpu.ckpt import serialization as ser

        bad = tmp_path / "epoch3_dora_params.pth"
        bad.write_bytes(b"\x80\x04garbage-truncated")
        with pytest.raises(ValueError, match="truncated or corrupt"):
            ser.load_flat(str(bad))

    def test_load_flat_bare_array_pickle_diagnosis(self, tmp_path):
        """A pickle whose top-level object is an ndarray must reach the
        flat-dict TypeError diagnosis — comparing it against the legacy
        torch magic with == would raise an ambiguous-truth ValueError."""
        import pickle
        from vit_project_tpu.ckpt import serialization as ser

        bad = tmp_path / "array.pth"
        with open(bad, "wb") as f:
            pickle.dump(np.arange(5), f)
        with pytest.raises(TypeError, match="expected a flat dict"):
            ser.load_flat(str(bad))

    def test_load_flat_legacy_torch_without_torch(self, tmp_path,
                                                  monkeypatch):
        """A legacy pre-1.6 torch archive on a torch-less host names the
        file and the remedy instead of a raw ModuleNotFoundError."""
        import pickle
        import sys
        from vit_project_tpu.ckpt import serialization as ser

        legacy = tmp_path / "legacy.pth"
        with open(legacy, "wb") as f:
            pickle.dump(ser._TORCH_LEGACY_MAGIC, f)
        monkeypatch.setitem(sys.modules, "torch", None)
        with pytest.raises(ValueError, match="legacy.*torch archive"):
            ser.load_flat(str(legacy))

    def test_load_flat_reads_both_containers(self, tmp_path):
        """The torch archive (zip) and the pickle container round-trip the
        same flat mapping through load_flat."""
        from vit_project_tpu.ckpt import serialization as ser

        flat = {"x": np.arange(6, dtype=np.float32).reshape(2, 3)}
        p1 = str(tmp_path / "torch_container.pth")
        p2 = str(tmp_path / "pickle_container.pth")
        ser.save_torch(p1, flat)
        ser.save(p2, flat)
        import zipfile
        assert zipfile.is_zipfile(p1) and not zipfile.is_zipfile(p2)
        for p in (p1, p2):
            np.testing.assert_array_equal(ser.load_flat(p)["x"], flat["x"])
