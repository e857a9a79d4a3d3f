"""AOT serving artifacts: export the bucketed serving programs to
StableHLO (jax.export) and serve from the artifact with no model code.

The reference deploys nothing — its eval forwards are rebuilt from Python
source on every run. A production TPU serving fleet wants the opposite: the
model traced ONCE, the compiled programs pinned as versioned artifacts, and
the serving binary reduced to "deserialize + feed buckets". This module
gives the InferenceEngine (serve/engine.py) that form:

- `export_serving(engine, ...)` serializes one `jax.export.Exported` per
  batch bucket (params stay an ARGUMENT, so the weights are stored once in
  `params.pth`, not baked into every bucket's module) plus a manifest.
- `load_serving(dir)` rebuilds an engine-compatible object (`AotEngine`)
  whose bucket programs come from the artifact: no Python model tracing at
  startup, and the artifact is stable across framework-code changes (the
  jax.export calling convention is versioned; the manifest pins platform,
  shapes, and dtype and the loader validates all three).

The artifact is platform-bound (StableHLO lowered for the exporting
backend — TPU artifacts contain the Pallas tpu_custom_calls); the loader
refuses a mismatched backend up front instead of failing inside XLA.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..ckpt import serialization as ser
from .engine import InferenceEngine

_MANIFEST = "manifest.json"
_PARAMS = "params.pth"


def _bucket_file(b: int) -> str:
    return f"bucket_{b:05d}.jaxexp"


def export_serving(engine: InferenceEngine, example_shape: tuple,
                   out_dir: str, *, input_dtype=np.float32,
                   extra: dict | None = None) -> dict:
    """Serialize `engine`'s per-bucket programs + params to `out_dir`.

    example_shape is ONE example's shape, e.g. (224, 224, 3); every bucket
    B is exported at input [B, *example_shape] of `input_dtype` (the dtype
    requests will arrive in — fixed at export, validated at load).

    Engines built over a mesh are refused: the exported module would pin
    this host's device assignment; multi-chip serving should build the live
    engine (the jit cache + persistent compile cache already amortize it).
    """
    if engine.mesh is not None:
        raise ValueError("AOT export supports single-device engines only "
                         "(a meshed export pins the exporting host's device "
                         "assignment into the artifact)")
    import jax
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), engine.params)
    dtype = np.dtype(input_dtype)
    for b in engine.buckets:
        spec = jax.ShapeDtypeStruct((b,) + tuple(example_shape), dtype)
        exp = jexport.export(engine._fn)(params_spec, spec)
        with open(os.path.join(out_dir, _bucket_file(b)), "wb") as f:
            f.write(exp.serialize())
    ser.save(os.path.join(out_dir, _PARAMS), engine.params)
    manifest = {
        "format": "vit_project_tpu.aot_serving/1",
        "buckets": list(engine.buckets),
        "example_shape": list(example_shape),
        "input_dtype": dtype.name,
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
    }
    manifest.update(extra or {})  # caller metadata (e.g. host-side
    # preprocessing contract: normalize constants, output mode, model name)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class AotEngine(InferenceEngine):
    """InferenceEngine whose bucket programs are deserialized Exporteds.

    Shares every serving surface (__call__, map_stream, warmup) with the
    live engine — only the program source differs, so the daemon/CLI code
    paths are identical either way."""

    def __init__(self, exports: dict, params, manifest: dict):
        import jax
        # deliberately NOT calling super().__init__: there is no apply_fn
        # to trace — that is the point of the artifact
        self.buckets = tuple(sorted(exports))
        self.mesh = None
        self.params = jax.device_put(params)
        self._in_shard = None
        self._dtype = np.dtype(manifest["input_dtype"])
        self._example_shape = tuple(manifest["example_shape"])
        self.manifest = dict(manifest)
        # jit each Exported.call so repeat buckets hit the executable cache
        self._calls = {b: jax.jit(e.call) for b, e in exports.items()}

    def _place(self, chunk: np.ndarray):
        import jax
        if chunk.shape[1:] != self._example_shape:
            raise ValueError(f"request shape {chunk.shape[1:]} != exported "
                             f"example shape {self._example_shape}")
        return jax.device_put(np.ascontiguousarray(chunk, self._dtype))

    def _fn(self, params, chunk):
        return self._calls[int(chunk.shape[0])](params, chunk)


def load_serving(out_dir: str) -> AotEngine:
    """Deserialize an `export_serving` artifact into a serving engine."""
    import jax
    from jax import export as jexport

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    fmt = manifest.get("format", "")
    if not fmt.startswith("vit_project_tpu.aot_serving/"):
        raise ValueError(f"{out_dir}: not an AOT serving artifact ({fmt!r})")
    backend = jax.default_backend().lower()
    # jax.default_backend() reports the generic 'gpu' while Exported.platforms
    # records the PJRT lowering name ('cuda'/'rocm') — accept either spelling
    names = {backend} | ({"cuda", "rocm"} if backend == "gpu" else set())
    plats = [p.lower() for p in manifest["platforms"]]
    if not names & set(plats):
        raise ValueError(
            f"artifact was exported for platform(s) {plats}, but this "
            f"process's backend is {backend!r} — re-export on the serving "
            "platform (StableHLO custom-calls are platform-bound)")
    exports = {}
    for b in manifest["buckets"]:
        with open(os.path.join(out_dir, _bucket_file(b)), "rb") as f:
            exports[int(b)] = jexport.deserialize(f.read())
    params = ser.load(os.path.join(out_dir, _PARAMS))
    return AotEngine(exports, params, manifest)
