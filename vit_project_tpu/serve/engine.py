"""TPU-native inference/serving engine.

The reference pipeline has no serving surface — its closest analogue is the
measurement eval forward (measure_single_epoch_perturbation_effect.py's
eval loops), which runs dynamic batch shapes and recomputes the DoRA-adapted
weight on every forward even in eval (new_cvpr..._pipeline.py:447-470). This
module is the production-serving counterpart a TPU deployment wants:

- FIXED SHAPES: requests are padded up to a small ladder of batch buckets, so
  XLA compiles each bucket once and every later request hits the jit cache
  (a dynamic batch dimension would recompile per size).
- ONE params placement: weights are device_put (or mesh-replicated) once at
  engine build; per-request transfers are the image batch only.
- bf16 compute by default (MXU-native; reductions inside ops stay f32), with
  an optional bf16 PARAM cast that halves weight HBM traffic for the
  memory-bound small-batch regime.
- dp serving over a `jax.sharding.Mesh`: the batch is sharded on the 'data'
  axis, params replicated; buckets must be multiples of the data-axis size.
  For models too big for one chip, `shard_params=` swaps replication for a
  caller-supplied placement (e.g. shard_vit_params_tp for 2-D dp x tp).
- double-buffered streaming: `map_stream` keeps `depth` dispatched batches in
  flight, so batch k+1's h2d transfer and dispatch overlap batch k's compute
  (the same overlap design as the training loop's device-prefetch feeder).
- zero-overhead adapters: `clip_hba_engine` bakes trained DoRA adapters into
  the frozen weights (adapters.dora.bake) so serving runs a plain CLIP
  forward with no adapter math at all.
"""
from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ..adapters import dora as adora
from ..models import clip as vclip
from ..models import vit as vvit
from ..ops import quant as vquant
from ..parallel import mesh as vmesh

# Smallest-first ladder: tiny interactive requests compile/run the small
# buckets, bulk requests chunk through the largest. Powers of two keep the
# padded-work overhead of any batch size under 2x worst-case, <~15% amortized.
DEFAULT_BUCKETS = (8, 32, 128, 256)


def _cast_float_leaves(tree, dtype):
    """Cast floating-point leaves to `dtype`, leave ints/bools alone."""
    def _cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return jax.tree_util.tree_map(_cast, tree)


class InferenceEngine:
    """Bucketed, jit-cached batch inference over a pure apply function.

    apply_fn(params, images[B, ...]) -> array whose leading axis is B.
    Padding rows are zeros; their outputs are sliced off before returning,
    so apply_fn must be row-independent (true of every model forward here —
    no cross-batch normalization).
    """

    def __init__(self, apply_fn, params, *, buckets=DEFAULT_BUCKETS,
                 mesh=None, param_dtype=None, shard_params=None):
        """shard_params: optional (mesh, params) -> sharded tree, replacing
        the default full replication — e.g. parallel.mesh.shard_vit_params_tp
        for tensor-parallel serving of models too big for one chip (use a
        ('data','model') mesh; the batch still shards over 'data' only, and
        the model forward must take the XLA attention path — see
        shard_vit_params_tp's docstring)."""
        buckets = tuple(sorted({int(b) for b in buckets}))
        if not buckets or buckets[0] <= 0:
            raise ValueError(f"buckets must be positive ints, got {buckets}")
        if shard_params is not None and mesh is None:
            raise ValueError("shard_params requires a mesh")
        if mesh is not None:
            nd = mesh.shape["data"]
            bad = [b for b in buckets if b % nd]
            if bad:
                raise ValueError(
                    f"buckets {bad} are not multiples of the mesh data-axis "
                    f"size {nd}; padded batches could not be sharded evenly")
        self.buckets = buckets
        self.mesh = mesh
        if param_dtype is not None:
            params = _cast_float_leaves(params, param_dtype)
        if mesh is not None:
            self.params = (shard_params(mesh, params) if shard_params
                           else vmesh.replicate(mesh, params))
            self._in_shard = vmesh.data_sharding(mesh)
        else:
            self.params = jax.device_put(params)
            self._in_shard = None
        # params go in as an explicit jit argument — closing over the tree
        # would bake ViT-L-sized constants into the jaxpr (minutes of trace
        # time) and re-transfer them per compile.
        self._fn = jax.jit(apply_fn)

    # -- shape plumbing ------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _chunk_iter(self, batches):
        """(batch_idx, valid_rows, is_last_chunk_of_batch, padded_chunk)."""
        maxb = self.buckets[-1]
        for bi, images in enumerate(batches):
            images = np.asarray(images)
            n = images.shape[0]
            if n == 0:
                raise ValueError("empty batch")
            for s in range(0, n, maxb):
                chunk = images[s:s + maxb]
                m = chunk.shape[0]
                b = self._bucket_for(m)
                if b > m:
                    pad = np.zeros((b - m,) + chunk.shape[1:], chunk.dtype)
                    chunk = np.concatenate([chunk, pad])
                yield bi, m, s + maxb >= n, chunk

    def _place(self, chunk: np.ndarray):
        if self._in_shard is not None:
            return jax.device_put(chunk, self._in_shard)
        return jax.device_put(chunk)

    # -- serving surfaces ----------------------------------------------

    def warmup(self, example_shape: tuple, dtype=np.float32) -> None:
        """Compile every bucket up front (first request then never waits).

        example_shape is ONE example's shape, e.g. (224, 224, 3)."""
        for b in self.buckets:
            x = self._place(np.zeros((b,) + tuple(example_shape), dtype))
            jax.block_until_ready(self._fn(self.params, x))

    def __call__(self, images) -> np.ndarray:
        """Inference on one batch of any size; returns host outputs [B, ...].

        Sizes above the largest bucket are chunked through it; sizes between
        buckets are padded up to the next one."""
        parts = [np.asarray(self._fn(self.params, self._place(chunk)))[:m]
                 for _, m, _, chunk in self._chunk_iter([images])]
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def map_stream(self, batches, depth: int = 2):
        """Yield outputs for an iterable of batches, in order, keeping up to
        `depth` dispatched chunks in flight so transfer overlaps compute."""
        if depth < 1:
            raise ValueError("depth must be >= 1")
        pending = deque()  # (batch_idx, valid_rows, is_last, device_out)
        parts: dict[int, list] = {}

        def _drain_one():
            bi, m, last, out = pending.popleft()
            parts.setdefault(bi, []).append(np.asarray(out)[:m])
            if not last:
                return None
            ps = parts.pop(bi)
            return ps[0] if len(ps) == 1 else np.concatenate(ps)

        for bi, m, last, chunk in self._chunk_iter(batches):
            pending.append(
                (bi, m, last, self._fn(self.params, self._place(chunk))))
            while len(pending) > depth:
                done = _drain_one()
                if done is not None:
                    yield done
        while pending:
            done = _drain_one()
            if done is not None:
                yield done


def _maybe_quantize(params, quantize, param_dtype, quant_fn):
    """Apply the optional serving quantization. The float cast (if any) runs
    FIRST so the int8 scales stay f32 — a bf16 scale would stack a second
    rounding on top of the int8 one."""
    if quantize is None:
        return params, param_dtype
    if quantize != "int8":
        raise ValueError(f"unknown quantize mode {quantize!r} (only 'int8')")
    if param_dtype is not None:
        params = _cast_float_leaves(params, param_dtype)
    return quant_fn(params), None


# -- model-specific constructors ----------------------------------------

def vit_classifier_engine(params: dict, cfg: vvit.ViTConfig, *,
                          compute_dtype=jnp.bfloat16, use_pallas=None,
                          input_norm=None, buckets=DEFAULT_BUCKETS,
                          mesh=None, param_dtype=None,
                          quantize: str | None = None,
                          shard_params=None) -> InferenceEngine:
    """Serve ViT classifier logits [B, num_classes] (models.vit.vit_classify).

    quantize="int8" rewrites every block's dense weights to int8
    (ops.quant) — the MXU's 2x-rate path for the ~98% of forward FLOPs that
    live in those matmuls."""
    params, param_dtype = _maybe_quantize(params, quantize, param_dtype,
                                          vquant.quantize_vit_blocks)
    def apply_fn(p, images):
        return vvit.vit_classify(p, images, cfg, use_pallas=use_pallas,
                                 input_norm=input_norm,
                                 compute_dtype=compute_dtype)
    return InferenceEngine(apply_fn, params, buckets=buckets, mesh=mesh,
                           param_dtype=param_dtype,
                           shard_params=shard_params)


def vit_features_engine(params: dict, cfg: vvit.ViTConfig, *,
                        pool: str = "token", compute_dtype=jnp.bfloat16,
                        use_pallas=None, input_norm=None,
                        buckets=DEFAULT_BUCKETS, mesh=None,
                        param_dtype=None,
                        quantize: str | None = None,
                        shard_params=None) -> InferenceEngine:
    """Serve pooled ViT embeddings [B, width] (models.vit.forward_features).
    quantize as in vit_classifier_engine."""
    params, param_dtype = _maybe_quantize(params, quantize, param_dtype,
                                          vquant.quantize_vit_blocks)
    def apply_fn(p, images):
        return vvit.forward_features(p, images, cfg, pool=pool,
                                     use_pallas=use_pallas,
                                     input_norm=input_norm,
                                     compute_dtype=compute_dtype)
    return InferenceEngine(apply_fn, params, buckets=buckets, mesh=mesh,
                           param_dtype=param_dtype,
                           shard_params=shard_params)


def clip_hba_engine(clip_params: dict, prompt_tokens, cfg: vclip.CLIPConfig,
                    *, trainable=None, static=None, alpha: int = 16,
                    r: int = 8, compute_dtype=jnp.bfloat16, use_pallas=None,
                    use_pos_embedding: bool = True, buckets=DEFAULT_BUCKETS,
                    mesh=None, param_dtype=None,
                    quantize: str | None = None,
                    shard_params=None) -> InferenceEngine:
    """Serve CLIP-HBA behavioral scores [B, n_prompts].

    When a trained adapter tree is given (trainable+static from
    adapters.dora.apply_dora / a loaded checkpoint), it is BAKED into the
    frozen weights first (adapters.dora.bake), so the served forward is a
    plain CLIP pass — zero adapter overhead per request, unlike the
    reference's eval path which rebuilds the DoRA weight every forward.
    prompt_tokens [n_prompts, context] are fixed at build (the 66 SPoSE
    prompts) and embedded as a jaxpr constant (~20 KB — intentionally tiny).
    """
    if (trainable is None) != (static is None):
        raise ValueError("pass both trainable and static, or neither")
    if trainable is not None:
        clip_params = adora.bake(clip_params, trainable, static,
                                 alpha=alpha, r=r)
    # bake BEFORE quantizing: the adapted out_w must be the tensor that gets
    # the int8 treatment, and quantized weights cannot host live adapters.
    clip_params, param_dtype = _maybe_quantize(
        clip_params, quantize, param_dtype, vquant.quantize_clip_blocks)
    tok = jnp.asarray(prompt_tokens)

    def apply_fn(p, images):
        return vclip.clip_hba_forward(p, images, tok, cfg,
                                      deterministic=True,
                                      use_pallas=use_pallas,
                                      use_pos_embedding=use_pos_embedding,
                                      compute_dtype=compute_dtype)
    return InferenceEngine(apply_fn, clip_params, buckets=buckets, mesh=mesh,
                           param_dtype=param_dtype,
                           shard_params=shard_params)
