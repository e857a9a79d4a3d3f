"""Config surface.

Mirrors the reference's plain-dict config contract (reference
clip_train_behavior_baseline.py:11-33, clip_train_behavior_sweep.py:118-147,
clip_train_behavior_lengths.py:94-134) so drivers can be written the same way, while
giving the framework a typed dataclass internally.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class ClipRunConfig:
    """One CLIP-HBA behavioral training run (baseline, sweep fork, or lengths fork)."""

    # data
    csv_file: str = ""
    img_dir: str = ""
    inference_csv_file: str = ""
    RDM48_triplet_dir: str = ""

    # model
    backbone: str = "ViT-L/14"
    clip_weights: Optional[str] = None     # path to converted (or OpenAI .pt) weights
    bpe_vocab: Optional[str] = None        # path to the CLIP BPE vocab (gz or txt)
    allow_hash_tokenizer: bool = False     # escape hatch: permit pretrained
                                           # weights with the hash tokenizer
                                           # (RSA will be scientifically void)
    vision_layers: int = 2                 # last-n visual blocks that get DoRA
    transformer_layers: int = 1            # last-n text blocks that get DoRA
    rank: int = 32
    dora_alpha: int = 16
    dora_dropout: float = 0.1

    # optimization
    epochs: int = 500
    batch_size: int = 64
    train_portion: float = 0.8
    lr: float = 3e-4
    criterion: str = "mse"
    early_stopping_patience: int = 20
    random_seed: int = 1
    compute_dtype: str = "bfloat16"        # frozen-tower compute dtype on TPU
    remat: bool = False                    # jax.checkpoint each visual block
                                           # (memory lever for big backbones)
    sp_devices: int = 1                    # >1: visual-tower sequence
                                           # parallelism over the 'model'
                                           # axis of a (data, sp) mesh
    sp_ring: bool = False                  # with sp_devices: ring attention
                                           # (parallel/ring.py) instead of
                                           # the k/v all-gather
    host_prefetch: bool = True             # async d2h of the per-epoch
                                           # checkpoint trees (core/hostcopy);
                                           # measured -19% steady per-epoch
                                           # on-chip (BENCHLOG round 3)
    preempt_save: bool = True              # stop cleanly at the next epoch
                                           # boundary on SIGTERM (the epoch
                                           # is ONE scan dispatch; per-epoch
                                           # checkpoints make the stop
                                           # exactly resumable in place)
    frozen_cache: bool = False             # cache the frozen tower prefixes
                                           # once and train only the adapted
                                           # suffix blocks (~92% fwd FLOPs
                                           # removed at the reference config;
                                           # costs ~[N,S,width] HBM — see
                                           # ClipHBATrainer.build_prefix_cache)

    # perturbation
    perturb_type: str = "baseline"         # random_target | label_shuffle |
                                           # uniform_images | image_noise | baseline
    perturb_length: int = 0
    perturb_distribution: str = "target"   # normal | target
    perturb_seed: int = 42
    training_run: int = 0                  # 1-indexed epoch the perturbation starts at

    # resume / fork
    resume_from_epoch: int = 0
    baseline_dora_directory: Optional[str] = None
    baseline_random_state_path: Optional[str] = None
    baseline_split_indices_path: Optional[str] = None
    resume_dora_parameters_path: Optional[str] = None
    resume_random_state_path: Optional[str] = None
    previous_training_res_path: Optional[str] = None

    # outputs
    checkpoint_path: str = "clip_hba_model.ckpt"
    training_res_path: str = "training_res.csv"
    dora_parameters_path: str = "./dora_params"
    random_state_path: str = "./random_states"

    # optional per-epoch inference-embedding dumps (reference runs produced
    # things_48_embeddings_epochN.csv files; see SURVEY.md section 0)
    dump_inference_embeddings: bool = False
    inference_dump_dir: Optional[str] = None
    # optional second per-epoch inference set (nod_embeddings_epochN.csv dumps)
    nod_csv_file: Optional[str] = None
    nod_img_dir: Optional[str] = None
    nod_dump_dir: Optional[str] = None

    # misc knobs kept for dict-compat with the reference config surface
    logger: Any = None
    cuda: int = 0
    output_base_directory: Optional[str] = None
    output_directory: Optional[str] = None
    output_dir: Optional[str] = None
    perturb_epoch: int = 0
    model: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict) -> "ClipRunConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in names:
                continue
            if k == "criterion" and not isinstance(v, str):
                v = "mse"  # reference passes nn.MSELoss(); we key on a string
            kwargs[k] = v
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class ViTTrainConfig:
    """ViT-B/16 ImageNet supervised training (reference train_vit_sgd.py:246-257)."""

    data_path: str = ""
    output_dir: str = "./vit_out"
    batch_size: int = 256          # per process (sharded over the mesh inside the step)
    epochs: int = 100
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1e-4
    num_workers: int = 8
    warmup_epochs: int = 5
    num_classes: int = 1000
    random_seed: int = 0
    compute_dtype: str = "bfloat16"  # AMP-equivalent; bf16 needs no GradScaler
    image_size: int = 224
    profile_dir: Optional[str] = None  # jax.profiler trace of the first epoch
    use_native_loader: bool = False    # C++ decode core (native/fastimage.cpp)
    data_echo: int = 1                 # yield each decoded train batch N times
                                       # (mitigation when host decode cannot
                                       # feed the device step rate)
    remat: bool = False  # jax.checkpoint each block: O(1)-block activation
                         # memory for ~1/3 extra FLOPs (big-batch/model lever)
    fused_dw: bool = False  # route dense backward through the streaming
                            # Pallas dW+bias-grad kernel (ops/fused_dw.py);
                            # trace-time toggle, single-chip experiments
    pp_stages: int = 1   # >1: GPipe pipeline over a ('data','stage') mesh —
                         # block depth partitioned over pp_stages devices
                         # (parallel/pipeline.py; single-process only)
    pp_micro: int = 1    # microbatches per pipelined step (bubble fraction
                         # (S-1)/(M+S-1); use >= 4*pp_stages in production)
    grad_accum: int = 1  # >1: split each batch into N grad microbatches
                         # inside ONE jitted step (lax.scan) — peak activation
                         # memory drops to one microbatch's; numerically equal
                         # to the unsplit step (CE is a mean over the batch)
    device_prefetch: int = 2  # h2d lookahead: a feeder thread device-places
                              # batch k+1 while batch k trains (transfers are
                              # host-synchronous on remote backends); 0 = off.
                              # Same batches in the same order either way.
    zero1: bool = False  # shard the SGD momentum over the 'data' axis
                         # (ZeRO-1): per-chip optimizer state drops ~Nx for
                         # one all-gather per step; numbers unchanged.
                         # dp-only (not with pp_stages).
    fsdp: bool = False  # shard the PARAMS (and momentum) over the 'data'
                        # axis (FSDP / ZeRO-3, parallel/mesh.
                        # shard_params_fsdp): per-chip param + optimizer
                        # memory drops ~Nx; XLA inserts the per-weight
                        # all-gathers and grad reduce-scatters. Numbers
                        # unchanged. dp-only (not with pp/ep); subsumes
                        # zero1.
    tp_devices: int = 1  # >1: Megatron-style tensor parallelism — block
                         # weights sharded over the 'model' axis of a
                         # ('data','model') mesh (parallel/mesh.
                         # shard_vit_params_tp: head-aligned [D,3,D] qkv,
                         # col/row-split MLP; one all-reduce per block).
                         # Checkpoints stay in the flat solo layout, so dp
                         # and tp runs resume each other. Must divide
                         # model heads; exclusive with sp/pp/ep/zero1/fsdp.
    sp_devices: int = 1  # >1: sequence parallelism — activations token-
                         # sharded over the 'model' axis of a
                         # ('data','model') mesh (parallel/mesh.seq_sharding)
                         # — per-device activation memory drops ~Nx; math
                         # unchanged. Not with pp_stages/ep_devices.
    sp_ring: bool = False  # with sp_devices > 1: route attention through
                           # RING attention (parallel/ring.py) — k/v rotate
                           # over ICI via ppermute instead of all-gathering;
                           # peak per-device k/v = one block. Same numbers.
    ep_devices: int = 1  # >1: expert parallelism — MoE expert FFNs sharded
                         # over the 'expert' axis of a ('data','expert')
                         # mesh (needs moe_experts > 0). Not with
                         # pp_stages/sp_devices.
    moe_experts: int = 0  # >0: replace every other block's MLP with a
                          # MoE of this many experts (ops/moe.py;
                          # beyond-reference capability)
    moe_topk: int = 1     # 1 = Switch top-1 routing, 2 = GShard top-2
    moe_capacity: float = 1.25  # per-expert capacity factor (scaled by
                                # topk inside ops/moe.py, GShard-style)
    moe_aux_weight: float = 0.01  # weight of the MoE load-balance loss
                                  # added to the CE (Switch default)
    host_prefetch: bool = False  # async d2h of the per-epoch checkpoint
                                 # trees (core/hostcopy.py); opt-in until
                                 # measured on-chip
    preempt_save: bool = True  # catch SIGTERM mid-epoch, write
                               # checkpoint_preempt.pth, exit resumable
                               # (core/preempt.py; single-process — pods
                               # fall back to the per-epoch cadence)
    keep_last: int = 0  # >0: delete per-epoch checkpoints older than the
                        # last N after each save (~350 MB each at ViT-B
                        # scale). Keep-all default: the measurement grid
                        # and sweep forks restore arbitrary epochs.

    @classmethod
    def from_dict(cls, d: dict) -> "ViTTrainConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


# Normalization constants (exact values from the reference).
THINGS_MEAN = (0.52997664, 0.48070561, 0.41943838)
THINGS_STD = (0.27608301, 0.26593025, 0.28238822)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
