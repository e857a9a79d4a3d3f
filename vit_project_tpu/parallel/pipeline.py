"""GPipe-style pipeline parallelism for the ViT trunk over a 'stage' mesh axis.

The reference scales by data parallelism only (DDP over 2 GPUs,
train_vit_sgd.py:13-27); dp replicates every parameter on every chip. On a
TPU slice the transformer's depth is a second partitionable axis: stage s of
an S-stage pipeline holds layers [s*L/S, (s+1)*L/S) and activations hop
stage -> stage+1 over ICI. This module implements the microbatched (GPipe)
schedule as ONE jitted program:

- the local batch is split into M microbatches; a single `lax.scan` runs
  T = M + S - 1 lock-step ticks inside `jax.shard_map`;
- at tick t, stage s runs its block stack on microbatch t-s; activations
  move with ONE `lax.ppermute` per tick (a ring shift over the 'stage'
  axis, riding ICI); stage 0 injects microbatch t, the last stage pools its
  finished microbatch (final LayerNorm + CLS/avg) so only a [mb, width]
  slice — not the full token stream — is accumulated and broadcast;
- every stage executes the same code every tick (SPMD): the schedule is
  expressed with `where`-gates on `lax.axis_index('stage')`, not Python
  branches, so XLA compiles one program for the whole pipeline;
- the pipeline bubble is the standard (S-1)/(M+S-1) fraction: pick
  n_micro >= 4*n_stages to keep it under ~20%.

Composes with data parallelism on a ('data', 'stage') mesh: the batch axis
is sharded over 'data' (XLA inserts the gradient all-reduce exactly as in
the dp-only path), block parameters over 'stage'. Differentiation goes
straight through `shard_map` (ppermute transposes to the inverse ring
shift), so `jax.grad` of a pipelined loss yields stage-sharded block
gradients with no extra code; train/vit_loop.py's ViTTrainer is the
training surface (`pp_stages`/`pp_micro` config, `cli.vit_train` flags).

This is forward-looking capability beyond the reference (which has no
model parallelism of any kind) for trunks whose parameters or activations
outgrow one chip's HBM; for ViT-B/16-sized models plain dp is faster (no
bubble). The embedding stem and the pooled head are replicated and
recomputed per stage — they are O(B*S*D) FLOPs next to the trunk's
O(B*S*D^2) and keeping them SPMD avoids a separate stem stage.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models import vit as vvit
from ..ops import nn as vnn


def stage_blocks(params: dict, n_stages: int):
    """Split a ViT param tree into (rest, blocks_st).

    `blocks_st` stacks the per-layer block dicts into one pytree whose
    leaves carry leading axes [n_stages, layers_per_stage, ...] — the layout
    `shard_params_pp` partitions over the 'stage' mesh axis and the stage
    body `lax.scan`s over. `rest` is the param tree without "blocks"
    (embedding stem, final norm, head/proj), which stays replicated."""
    blocks = params["blocks"]
    L = len(blocks)
    if L % n_stages != 0:
        raise ValueError(f"layers ({L}) must divide by n_stages ({n_stages})")
    lp = L // n_stages
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    blocks_st = jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, lp) + x.shape[1:]), stacked)
    rest = {k: v for k, v in params.items() if k != "blocks"}
    return rest, blocks_st


def unstage_blocks(rest: dict, blocks_st) -> dict:
    """Inverse of `stage_blocks`: rebuild the flat param tree (host-side
    helper for checkpointing a pipelined state in the solo layout)."""
    leaves = jax.tree_util.tree_leaves(blocks_st)
    n_stages, lp = leaves[0].shape[0], leaves[0].shape[1]
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages * lp,) + x.shape[2:]), blocks_st)
    blocks = [jax.tree_util.tree_map(lambda x: x[i], flat)
              for i in range(n_stages * lp)]
    return {**rest, "blocks": blocks}


def shard_params_pp(mesh, params: dict, n_stages: int | None = None):
    """Place (rest, blocks_st) on a mesh with a 'stage' axis: block stacks
    sharded P('stage') on their leading axis, everything else replicated."""
    if "stage" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'stage' axis")
    n_stages = n_stages if n_stages is not None else mesh.shape["stage"]
    if n_stages != mesh.shape["stage"]:
        raise ValueError(f"n_stages ({n_stages}) != mesh 'stage' size "
                         f"({mesh.shape['stage']})")
    rest, blocks_st = stage_blocks(params, n_stages)
    from jax.sharding import NamedSharding
    rest = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        if x is not None else None, rest)
    blocks_st = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("stage"))),
        blocks_st)
    return rest, blocks_st


def _embed(rest: dict, images, cfg: vvit.ViTConfig, input_norm,
           compute_dtype):
    """The encoder stem on a local batch — the SAME implementation the dp
    trunk runs (models/vit.py vit_embed), so the pipelined forward cannot
    drift from it."""
    return vvit.vit_embed(rest, images, cfg, input_norm=input_norm,
                          compute_dtype=compute_dtype)


def pipeline_features(rest: dict, blocks_st, images, cfg: vvit.ViTConfig,
                      mesh, *, n_micro: int, pool: str = "token",
                      input_norm: tuple | None = None,
                      compute_dtype=jnp.float32,
                      use_pallas: bool | None = None,
                      remat: bool = False):
    """Pipelined trunk: images [B, H, W, 3] -> pooled features [B, width]
    (final LayerNorm applied; pool='token' -> CLS, 'avg' -> patch mean,
    the forward_features contract of models/vit.py:264-275).

    `blocks_st` must be stage-stacked ([n_stages, lp, ...] leaves, see
    stage_blocks); on a multi-device mesh use shard_params_pp so the stage
    axis is partitioned. `n_micro` microbatches must divide the per-'data'-
    shard batch. `remat=True` checkpoints each block call (backward replays
    each stage's forward per tick — the GPipe activation-memory trade)."""
    n_stages = mesh.shape["stage"]
    n_data = mesh.shape.get("data", 1)
    B = images.shape[0]
    if B % (n_data * n_micro) != 0:
        raise ValueError(f"batch {B} must divide by n_data*n_micro = "
                         f"{n_data}*{n_micro}")
    st = jax.tree_util.tree_leaves(blocks_st)[0].shape[0]
    if st != n_stages:
        # a larger multiple would pass the in_specs divisibility check but
        # the per-device [k, lp, ...] slice is squeezed to its FIRST stage —
        # silently skipping blocks — so reject any mismatch loudly
        raise ValueError(f"blocks_st has {st} stages but the mesh 'stage' "
                         f"axis is {n_stages} (use shard_params_pp)")
    has_data = "data" in mesh.axis_names

    blk = vvit._block_fn(cfg, None, True, use_pallas, remat)

    def run_stage(blocks_lp, x):
        def body(h, bp):
            return blk(bp, h, None, None), None
        x, _ = jax.lax.scan(body, x, blocks_lp)
        return x

    # `rest` goes through in_specs (replicated), not closure: shard_map does
    # not differentiate closed-over tracers, and the pipelined train step needs
    # d(loss)/d(rest) to flow through the stem and the final norm
    def body(blocks_local, images_local, rest):
        # blocks_local: this stage's [1, lp, ...] slice; images_local: this
        # data-shard's [B/n_data, ...] rows (replicated over 'stage')
        def pool_fn(x):
            t = vnn.layer_norm(x, rest["norm"]["scale"],
                               rest["norm"]["bias"])
            return t[:, 1:].mean(axis=1) if pool == "avg" else t[:, 0]

        blocks_lp = jax.tree_util.tree_map(lambda x: x[0], blocks_local)
        x = _embed(rest, images_local, cfg, input_norm, compute_dtype)
        bd = x.shape[0]
        mb = bd // n_micro
        x_mb = x.reshape(n_micro, mb, x.shape[1], x.shape[2])
        stage = jax.lax.axis_index("stage")
        is_last = stage == n_stages - 1

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t (rides its current buf otherwise)
            inj = x_mb[jnp.minimum(t, n_micro - 1)]
            buf = jnp.where((stage == 0) & (t < n_micro), inj, buf)
            buf = run_stage(blocks_lp, buf)
            # the last stage finished microbatch o = t-(S-1): pool + store.
            # Non-last stages store zeros so the closing psum broadcasts the
            # true rows (their buf holds an in-flight microbatch, not junk)
            o = t - (n_stages - 1)
            oc = jnp.clip(o, 0, n_micro - 1)
            pooled = jnp.where(is_last & (o >= 0), pool_fn(buf), 0.0)
            cur = jax.lax.dynamic_index_in_dim(outs, oc, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(is_last & (o >= 0), pooled, cur), oc, 0)
            # ring shift: stage s's activation becomes stage s+1's input
            buf = jax.lax.ppermute(
                buf, "stage",
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (buf, outs), None

        buf0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)
        outs0 = jnp.zeros((n_micro, mb, cfg.width), x.dtype)
        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(n_micro + n_stages - 1))
        # only the last stage wrote non-zero rows -> psum replicates them
        outs = jax.lax.psum(outs, "stage")
        return outs.reshape(bd, cfg.width)

    img_spec = P("data") if has_data else P()
    out_spec = P("data") if has_data else P()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("stage"), img_spec, P()),
        out_specs=out_spec,
        check_vma=False,  # the psum-of-masked-writes replication pattern
    )(blocks_st, images, rest)


def pipeline_classify(rest: dict, blocks_st, images, cfg: vvit.ViTConfig,
                      mesh, *, n_micro: int,
                      input_norm: tuple | None = None,
                      compute_dtype=jnp.float32,
                      use_pallas: bool | None = None,
                      remat: bool = False):
    """Pipelined ViT classifier logits [B, num_classes] (vit_classify
    contract, models/vit.py:251-261): pipelined trunk -> CLS -> head."""
    feats = pipeline_features(rest, blocks_st, images, cfg, mesh,
                              n_micro=n_micro, pool="token",
                              input_norm=input_norm,
                              compute_dtype=compute_dtype,
                              use_pallas=use_pallas, remat=remat)
    logits = vnn.dense(feats, rest["head_w"], rest["head_b"])
    return logits.astype(jnp.float32)


# Training over the pipelined forward lives in train/vit_loop.py:
# ViTTrainer routes its train/eval/feature steps through pipeline_classify /
# pipeline_features when its config sets pp_stages > 1 (ONE implementation
# of the SGD update for dp and pp; block gradients come back stage-sharded
# from the shard_map transpose, the data-axis gradient all-reduce is
# inserted by XLA from the sharded loss).
