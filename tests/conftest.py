"""Test env: fake an 8-device CPU mesh so pjit sharding paths run without TPUs.

This is the TPU-native analogue of a fake backend (SURVEY.md section 4): the same
jit/sharding code that runs on a v5e-8 executes against 8 virtual CPU devices.

Note: this image pre-imports jax at interpreter startup (axon plugin), so plain env
vars are too late — we must go through jax.config.update before the backend
initializes (backends initialize lazily on first device access, which no plugin does
at import time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# tests compare against numpy/scipy/torch oracles, so force exact f32 matmuls
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}")
