"""Device mesh + sharding utilities.

TPU-native replacement for the reference's NCCL/DDP machinery (setup_distributed +
DistributedSampler + all_reduce, train_vit_sgd.py:13-27,125-204; SURVEY.md
section 2.2): a 1-D data mesh over ICI (optionally 2-D with a model axis for
future tensor parallelism), batches sharded over the 'data' axis with pjit, and
gradient/metric reductions inserted by XLA from the sharded loss — no hand-written
collectives.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              n_stage: int = 1, n_expert: int = 1, devices=None) -> Mesh:
    """1-D ('data',) mesh by default; ('data','model') if n_model > 1
    (tensor parallelism shard_vit_params_tp, and/or sequence parallelism
    seq_sharding — both ride the 'model' axis, Megatron-style);
    ('data','stage') if n_stage > 1 (GPipe pipeline, parallel/pipeline.py);
    ('data','expert') if n_expert > 1 (MoE expert parallelism,
    shard_vit_params_ep)."""
    extra = [(a, s) for a, s in (("model", n_model), ("stage", n_stage),
                                 ("expert", n_expert)) if s > 1]
    if len(extra) > 1:
        raise ValueError("at most one of n_model/n_stage/n_expert may be > 1 "
                         f"(got {[a for a, _ in extra]})")
    devices = devices if devices is not None else jax.devices()
    n = (len(devices) if n_data is None
         else n_data * n_model * n_stage * n_expert)
    devices = devices[:n]
    for axis, size in extra:
        if n % size != 0:
            raise ValueError(f"{axis} axis ({size}) must divide the "
                             f"device count ({n})")
        arr = mesh_utils.create_device_mesh((n // size, size),
                                            devices=devices)
        return Mesh(arr, ("data", axis))
    arr = mesh_utils.create_device_mesh((len(devices),), devices=devices)
    return Mesh(arr, ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host batch onto the mesh, leading axis split over 'data'.

    Single-process: plain device_put with a data-sharded layout. Multi-host
    (TPU pod, one process per host): the argument is this PROCESS'S shard of
    the global batch (see ImageFolderLoader num_shards/shard_id) and is
    assembled into the global array across hosts — the jax equivalent of the
    reference feeding each DDP rank its DistributedSampler shard
    (train_vit_sgd.py:58-66)."""
    s = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_vit_params_tp(mesh: Mesh, params: dict,
                        heads: int | None = None) -> dict:
    """Megatron-style tensor-parallel placement of ViT block weights over the
    'model' axis of a ('data', 'model') mesh.

    fc1 is column-sharded (out dim), fc2 / out_proj row-sharded (in dim): the
    contraction pattern XLA resolves with one all-reduce per block, riding
    ICI. The packed qkv weight [D, 3D] is stored **head-aligned** as [D, 3, D]
    with the trailing D (= heads*dh, head-major) sharded over 'model', so each
    model-shard holds WHOLE heads of q, k, AND v — sharding a flat [D, 3D]
    column axis instead puts all of q on shard 0 and forces GSPMD to
    re-gather it (block_forward slices w3[:, 0]). The forward's
    `qkv_w.reshape(D, 3, D)` is a no-op on this layout, and the reshape
    [D, D] -> [D, heads, dh] propagates the shard cleanly because the chunk
    boundary falls on a head boundary (requires n_model | heads — pass
    `heads` to assert it). Everything else (LN, embeddings, head) is
    replicated. The reference has no TP (SURVEY.md section 2.2) — this is
    forward-looking capability for models whose activations outgrow one
    chip's HBM. Compiled-HLO check: tests/test_data_perturb.py
    test_tp_forward_hlo_has_no_gather.

    TP-sharded params MUST run the forward with use_pallas=False: the flash
    attention pallas_call has no GSPMD partitioning rule for a model-sharded
    qkv, and block_forward's pallas branch flattens qkv_w back to [D, 3D]
    (merging a sharded minor axis), both of which would force re-gathers.
    The XLA attention path propagates the head-aligned sharding cleanly.
    """
    if "model" not in mesh.axis_names:
        return replicate(mesh, params)
    n_model = mesh.shape["model"]
    if heads is not None and heads % n_model != 0:
        raise ValueError(f"model axis ({n_model}) must divide heads ({heads}) "
                         "for head-aligned qkv sharding")

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    col = P(None, "model")   # [in, out] sharded on out
    row = P("model", None)   # [in, out] sharded on in
    rep = P()

    def shard_block(bp: dict) -> dict:
        out = {}
        for k, v in bp.items():
            if k == "qkv_w":
                D = v.shape[0]
                out[k] = put(v.reshape(D, 3, D), P(None, None, "model"))
            elif k == "qkv_b":
                out[k] = put(v.reshape(3, -1), P(None, "model"))
            elif k == "fc1_w":
                out[k] = put(v, col)
            elif k == "fc1_b":
                out[k] = put(v, P("model"))
            elif k in ("out_w", "fc2_w"):
                out[k] = put(v, row)
            else:
                out[k] = jax.tree_util.tree_map(lambda a: put(a, rep), v)
        return out

    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = [shard_block(bp) for bp in v]
        else:
            out[k] = jax.tree_util.tree_map(
                lambda a: put(a, rep) if a is not None else None, v)
    return out


def unshard_vit_params_tp(params: dict) -> dict:
    """Inverse of shard_vit_params_tp's LAYOUT change: reshape the
    head-aligned qkv leaves ([D, 3, D] weight, [3, D] bias) back to the flat
    solo layout ([D, 3D] / [3D]) so a tp run's checkpoints are
    byte-compatible with dp/pp runs (same contract as pipeline.
    unstage_blocks). Pure tree transform — placement is untouched; callers
    persisting the result fetch to host anyway (the reshape merges the
    model-sharded minor axis, i.e. the save pays tp's one gather)."""
    def unshard_block(bp: dict) -> dict:
        out = dict(bp)
        w = bp["qkv_w"]
        if getattr(w, "ndim", 2) == 3:
            out["qkv_w"] = w.reshape(w.shape[0], -1)
            out["qkv_b"] = bp["qkv_b"].reshape(-1)
        return out

    out = dict(params)
    out["blocks"] = [unshard_block(bp) for bp in params["blocks"]]
    return out


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence-parallel constraint for [B, S, D] activations: batch over
    'data', TOKENS over 'model' (Megatron-SP rides the tensor-parallel axis).
    Pass as vit_encode/vit_classify's `seq_shard`: LayerNorm/MLP/projections
    then run on 1/N of the tokens per device and GSPMD inserts the k/v
    gathers attention needs — per-device activation memory drops ~Nx. S need
    not divide the axis (GSPMD pads the ragged shard internally)."""
    if "model" not in mesh.axis_names:
        raise ValueError("sequence parallelism needs a ('data','model') mesh "
                         f"(make_mesh(n_model=...)); got {mesh.axis_names}")
    return NamedSharding(mesh, P("data", "model", None))


def head_sharding(mesh: Mesh) -> NamedSharding:
    """Tensor-parallel constraint for [B, S, H, dh] attention activations:
    batch over 'data', HEADS over 'model' (the Megatron attention layout the
    head-aligned qkv weights of shard_vit_params_tp produce). Pass as
    vit_encode/vit_classify's `head_shard`: it pins q/k/v and the attention
    output so GSPMD keeps the whole softmax chain heads-sharded instead of
    falling back to replicate-then-repartition ("Involuntary full
    rematerialization") when batch and head shardings meet."""
    if "model" not in mesh.axis_names:
        raise ValueError("tensor parallelism needs a ('data','model') mesh "
                         f"(make_mesh(n_model=...)); got {mesh.axis_names}")
    return NamedSharding(mesh, P("data", None, "model", None))


def batch_head_sharding(mesh: Mesh) -> NamedSharding:
    """Data-parallel constraint for [B, S, H, dh] attention activations:
    batch over 'data', everything else replicated. Under FSDP the weight
    shardings (input-dim 1/N) otherwise leak through the attention
    backward's reshapes as a bogus heads-sharding on the softmax chain, and
    GSPMD falls back to replicate-then-repartition ("Involuntary full
    rematerialization"); pinning q/k/v and the attention output to the
    plain dp layout keeps activations batch-sharded end to end."""
    return NamedSharding(mesh, P("data", None, None, None))


def shard_vit_params_ep(mesh: Mesh, params: dict) -> dict:
    """Expert-parallel placement of a MoE ViT param tree (ops/moe.py) over
    the 'expert' axis of a ('data','expert') mesh: each stacked expert-FFN
    tensor ([E, ...]) is sharded on E so every device group holds only its
    experts, and GSPMD lowers the dispatch/combine einsums to the
    expert-parallel all-to-all. Routers and all dense weights replicate.
    The reference has no MoE (SURVEY.md section 2) — forward-looking
    capability, like TP."""
    if "expert" not in mesh.axis_names:
        return replicate(mesh, params)
    n_expert = mesh.shape["expert"]

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def shard_block(bp: dict) -> dict:
        out = {}
        for k, v in bp.items():
            if k == "moe":
                moe = {}
                for mk, mv in v.items():
                    if mk == "router_w":
                        moe[mk] = put(mv, P())
                    else:
                        if mv.shape[0] % n_expert != 0:
                            raise ValueError(
                                f"expert axis ({n_expert}) must divide the "
                                f"expert count ({mv.shape[0]})")
                        moe[mk] = put(mv, P(*(("expert",)
                                              + (None,) * (mv.ndim - 1))))
                out[k] = moe
            else:
                out[k] = jax.tree_util.tree_map(lambda a: put(a, P()), v)
        return out

    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = [shard_block(bp) for bp in v]
        else:
            out[k] = jax.tree_util.tree_map(
                lambda a: put(a, P()) if a is not None else None, v)
    return out


def zero1_sharding(mesh: Mesh, x) -> NamedSharding:
    """ZeRO-1 placement for one optimizer-state leaf: leading axis sharded
    over 'data' when it divides (each chip stores 1/N of the buffer),
    replicated otherwise (tiny biases/scales — not worth a ragged split)."""
    if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.shape["data"] == 0:
        return NamedSharding(mesh, P("data"))
    return NamedSharding(mesh, P())


def shard_opt_state(mesh: Mesh, tree):
    """Place an optimizer-state pytree with ZeRO-1 shardings (see
    zero1_sharding). The reference replicates optimizer state per GPU (DDP);
    sharding it over the data axis cuts per-chip state memory ~Nx for one
    all-gather's worth of traffic per step (inserted by XLA from the
    sharding constraint in the train step)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, zero1_sharding(mesh, x)), tree)


def fsdp_sharding(mesh: Mesh, x) -> NamedSharding:
    """FSDP placement for one MODEL param leaf: matrices (ndim >= 2) shard
    their leading (input) dim over 'data' when it divides; 1-D leaves
    (biases, LayerNorm scales) REPLICATE even when they would divide.

    The 1-D exception differs from zero1_sharding deliberately: these leaves
    participate in the forward, and a sharded bias that gets reshaped (e.g.
    qkv_b [3D] -> [heads, dh] in the head-aligned attention path) hands
    GSPMD a flat 8-way sharding over a folded (heads x lane) axis — the
    propagated heads-sharding then collides with the batch-sharded softmax
    chain and XLA falls back to replicate-then-repartition ("Involuntary
    full rematerialization", a real HBM tax at production shapes). The
    memory cost of replicating them is negligible: 1-D leaves are ~1/3000th
    of a ViT's parameters."""
    if getattr(x, "ndim", 0) >= 2 and x.shape[0] % mesh.shape["data"] == 0:
        return NamedSharding(mesh, P("data"))
    return NamedSharding(mesh, P())


def shard_params_fsdp(mesh: Mesh, tree):
    """FSDP / ZeRO-3 placement for a MODEL param tree: every matrix leaf
    whose leading axis divides the 'data' axis is stored 1/N per chip; 1-D
    leaves replicate (see fsdp_sharding — momentum trees passed here follow
    the same rule so params and their momentum stay layout-aligned). The
    train step pins params, grads, and momentum to this layout (ViTTrainer
    fsdp=True): XLA then all-gathers each weight just before its matmuls
    (forward and backward) and reduce-scatters its grad — per-chip param +
    optimizer memory drops ~Nx for two gathers and one reduce-scatter of
    ICI traffic per weight per step, the standard GSPMD FSDP recipe. The
    reference has no sharded-parameter mode (DDP fully replicates the
    model, train_vit_sgd.py:287)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, fsdp_sharding(mesh, x)), tree)


def pad_to_multiple(batch_tree, multiple: int):
    """Pad the leading axis to a multiple (for even data sharding); returns
    (padded_tree, real_count). Loss/metric code weights by real_count."""
    leaves = jax.tree_util.tree_leaves(batch_tree)
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch_tree, n
    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)
    return jax.tree_util.tree_map(_pad, batch_tree), n
