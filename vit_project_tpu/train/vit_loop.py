"""ViT-B/16 ImageNet supervised training, data-parallel over the TPU mesh.

Faithful port of the reference DDP pipeline (train_vit_sgd.py): SGD with momentum
and torch-style decoupled-into-gradient weight decay, warmup-cosine schedule
stepped per epoch, per-epoch full-state checkpoints + training_metrics.csv,
auto-resume from checkpoint_latest.pth.

TPU-native differences (SURVEY.md sections 2.2, 0-defects):
- AMP/GradScaler is replaced by bf16 compute (no scaler state needed);
- DDP/NCCL is replaced by a pjit-sharded batch on a ('data',) mesh — XLA inserts
  the gradient all-reduce from the sharded loss;
- validation aggregates counts globally and divides once, fixing the reference's
  unnormalized all_reduce(SUM) of per-rank average losses (train_vit_sgd.py:193-196);
- RSA embeddings are gathered in dataset order, fixing the interleaved-row defect
  of the reference all_gather (measure...effect.py:327-334).
"""
from __future__ import annotations

import contextlib
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import hostcopy
from ..core.configs import ViTTrainConfig
from ..data import imagenet as dimg
from ..models import vit as vvit
from ..ops import rsa as vrsa
from ..parallel import mesh as vmesh
from ..perturb import injectors


def sgd_init(params):
    """Momentum buffers (torch SGD: buf_0 = g_0, i.e. no decay on first step —
    optax.trace matches)."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def _device_prefetch(batches, shard_fn, depth: int):
    """Overlap the h2d transfer of batch k+1 with the device step on batch k.

    The loader's own feeder thread overlaps DECODE with training; this
    second stage moves the device placement (`shard_fn` = device_put /
    global-array assembly, which is synchronous on the host for remote or
    tunneled backends) off the consumer thread too, so the chip never waits
    on a transfer that could have happened during the previous step.
    core/feeder.py holds the shared thread discipline (stop-aware puts,
    exception delivery, join on abandonment)."""
    from ..core.feeder import feed
    return feed((shard_fn(images_u8, labels)
                 for images_u8, labels in batches), depth)


class ViTTrainer:
    """Jitted ViT train/eval/feature steps over a device mesh.

    Two parallel modes share every step's signature and the epoch loops:
    - dp (default): params replicated, batch sharded over 'data';
    - pp (train_cfg.pp_stages > 1, mesh has a 'stage' axis): params are the
      (rest, blocks_st) stage-stacked pair from parallel/pipeline.py and the
      forward is the GPipe microbatch schedule — same math, so metrics and
      checkpoints (converted back to the flat layout) match the dp run.
    """

    def __init__(self, vit_cfg: vvit.ViTConfig, train_cfg: ViTTrainConfig,
                 mesh=None):
        self.vit_cfg = vit_cfg
        self.cfg = train_cfg
        self.pp = getattr(train_cfg, "pp_stages", 1) > 1
        self.n_micro = getattr(train_cfg, "pp_micro", 1)
        self.sp = getattr(train_cfg, "sp_devices", 1) > 1
        self.ep = getattr(train_cfg, "ep_devices", 1) > 1
        self.tp = getattr(train_cfg, "tp_devices", 1) > 1
        self.moe = getattr(vit_cfg, "moe_experts", 0) > 0
        if sum((self.pp, self.sp, self.ep, self.tp)) > 1:
            raise ValueError("pp_stages / sp_devices / ep_devices / "
                             "tp_devices each need the whole second mesh "
                             "axis; enable at most one")
        if self.tp and self.moe:
            raise ValueError("tp_devices does not compose with MoE blocks: "
                             "the expert FFNs shard over 'expert', not "
                             "'model' (use ep_devices)")
        if self.tp and vit_cfg.heads % train_cfg.tp_devices != 0:
            raise ValueError(f"tp_devices ({train_cfg.tp_devices}) must "
                             f"divide the model heads ({vit_cfg.heads}) for "
                             "head-aligned qkv sharding")
        if self.ep and not self.moe:
            raise ValueError("ep_devices > 1 needs a MoE model "
                             "(vit_cfg.moe_experts > 0)")
        if self.pp and self.moe:
            raise ValueError("MoE blocks are not supported on the pipeline "
                             "path (the GPipe schedule drops the aux loss)")
        self.ring = getattr(train_cfg, "sp_ring", False)
        if self.ring and not self.sp:
            raise ValueError("sp_ring needs sp_devices > 1 (ring attention "
                             "rotates k/v around the sequence shards)")
        if self.ring and self.moe:
            raise ValueError(
                "sp_ring does not compose with MoE blocks: the ring pads the "
                "token stream, and padded tokens would compete for expert "
                "capacity and pollute the aux loss (a second token-mixing "
                "channel) — use the gather sp path (sp_ring=False), which "
                "never pads")
        self.mesh = mesh if mesh is not None else vmesh.make_mesh(
            n_stage=train_cfg.pp_stages if self.pp else 1,
            n_model=(train_cfg.sp_devices if self.sp
                     else train_cfg.tp_devices if self.tp else 1),
            n_expert=train_cfg.ep_devices if self.ep else 1)
        if self.pp and "stage" not in self.mesh.axis_names:
            raise ValueError("pp_stages > 1 needs a mesh with a 'stage' "
                             f"axis, got {self.mesh.axis_names}")
        if self.ep and "expert" not in self.mesh.axis_names:
            # shard_vit_params_ep silently replicates without the axis —
            # the run would quietly provide none of ep's memory reduction
            raise ValueError("ep_devices > 1 needs a mesh with an 'expert' "
                             f"axis, got {self.mesh.axis_names}")
        if self.tp and "model" not in self.mesh.axis_names:
            # same trap as ep: shard_vit_params_tp replicates without it
            raise ValueError("tp_devices > 1 needs a mesh with a 'model' "
                             f"axis, got {self.mesh.axis_names}")
        self._seq_shard = vmesh.seq_sharding(self.mesh) if self.sp else None
        self.zero1 = getattr(train_cfg, "zero1", False)
        self.fsdp = getattr(train_cfg, "fsdp", False)
        if self.fsdp:
            self.zero1 = False  # fsdp's constraints shard the momentum too
        # Attention-activation pins that keep GSPMD from involuntarily
        # rematerializing the softmax chain: heads-over-'model' under tp
        # (the Megatron layout the head-aligned qkv weights imply), plain
        # batch-over-'data' under fsdp (where the sharded weights would
        # otherwise leak a bogus heads-sharding through the backward's
        # reshapes) — see parallel/mesh.{head,batch_head}_sharding.
        self._head_shard = (vmesh.head_sharding(self.mesh) if self.tp
                            else vmesh.batch_head_sharding(self.mesh)
                            if self.fsdp else None)
        if (self.zero1 or self.fsdp) and self.pp:
            raise ValueError("zero1/fsdp shard over the 'data' axis of the "
                             "dp mesh; they do not compose with pp_stages")
        if (self.zero1 or self.fsdp) and self.ep:
            raise ValueError(
                "zero1/fsdp do not compose with ep_devices: their step "
                "constraints would pin the expert-sharded FFN weights "
                "to the 'data' layout (defeating expert parallelism) and "
                "reshard the momentum between 'expert' and 'data' every "
                "step")
        if (self.zero1 or self.fsdp) and self.tp:
            raise ValueError(
                "zero1/fsdp do not compose with tp_devices: their "
                "zero1_sharding constraints would re-layout the "
                "model-sharded block weights to the 'data' axis every step")
        if self.fsdp and self.sp:
            # the batch_head pin above constrains q/k/v and the attention
            # output sequence-REPLICATED; wrapped around the
            # sequence-sharded attention paths (ring_attention_bshd needs S
            # over 'model'; the gather-sp einsums likewise) GSPMD would
            # materialize full-sequence [B,S,H,dh] activations per block —
            # exactly the memory bound sp exists to break — and insert
            # gather/rescatter pairs around every block
            raise ValueError(
                "fsdp does not compose with sp_devices: fsdp's attention "
                "pin is sequence-replicated and defeats the "
                "sequence-sharded attention path")
        self.compute_dtype = (jnp.bfloat16
                              if train_cfg.compute_dtype == "bfloat16"
                              else jnp.float32)
        if getattr(train_cfg, "fused_dw", False) \
                and self.mesh.devices.size > 1:
            # the kernel has no GSPMD rule: under a sharded mesh XLA
            # would all-gather its operands to one device
            raise ValueError("fused_dw is a single-chip path; disable "
                             "it on multi-device meshes")
        # trace-time toggle for the streaming Pallas dW+db kernel
        # (ops/fused_dw.py). Assigned UNCONDITIONALLY so a fused trainer
        # cannot leak the flag into later trainers in the same process
        # (which would silently fuse an A/B baseline, or route a sharded
        # mesh's dense layers through the kernel the guard above blocks).
        from ..ops import nn as _vnn
        _vnn.set_dense_dw_fused(bool(getattr(train_cfg, "fused_dw", False)))
        self._train_steps: dict = {}

    def _classify(self, params, images, *, input_norm, with_aux=False):
        """vit_classify in dp mode (token-sharded under sp, MoE aux under
        with_aux); the pipelined schedule in pp mode."""
        if self.pp:
            from ..parallel import pipeline as vpp
            return vpp.pipeline_classify(
                params[0], params[1], images, self.vit_cfg, self.mesh,
                n_micro=self.n_micro, input_norm=input_norm,
                compute_dtype=self.compute_dtype, remat=self.cfg.remat)
        return vvit.vit_classify(params, images, self.vit_cfg,
                                 input_norm=input_norm,
                                 compute_dtype=self.compute_dtype,
                                 remat=self.cfg.remat,
                                 seq_shard=self._seq_shard,
                                 with_aux=with_aux,
                                 ring_attn=self.ring,
                                 head_shard=self._head_shard)

    # -- jitted steps -------------------------------------------------------

    def _make_train_step(self, perturbation_type: str | None):
        key = perturbation_type or "none"
        if key not in self._train_steps:
            momentum = self.cfg.momentum
            wd = self.cfg.weight_decay
            epsilon_default = 0.1

            image_perturb = perturbation_type in ("gaussian", "uniform_gray")

            moe = self.moe
            aux_w = getattr(self.cfg, "moe_aux_weight", 0.01)

            def loss_fn(params, images, labels, *, input_norm):
                out = self._classify(params, images, input_norm=input_norm,
                                     with_aux=moe)
                logits, aux = out if moe else (out, None)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32))
                ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
                loss = jnp.mean(ce)
                if moe:  # Switch load-balance term (ops/moe.py aux loss)
                    loss = loss + aux_w * aux
                return loss

            G = getattr(self.cfg, "grad_accum", 1)

            def batch_grads(params, images, labels, *, input_norm):
                """value_and_grad of the batch loss; with grad_accum > 1 the
                batch is split into G microbatches and a lax.scan sums their
                grads — peak activation memory drops to one microbatch's
                (the backward of microbatch g replays before g+1's forward
                starts), and the result is numerically the unsplit step's
                (CE is a mean over equal-sized microbatches). MoE models are
                the one exception: routing capacity and the load-balance aux
                term are computed per forward, so with G > 1 they apply per
                MICROBATCH — a (standard) slightly different regularizer,
                not a numerical error."""
                if G == 1:
                    return jax.value_and_grad(loss_fn)(
                        params, images, labels, input_norm=input_norm)
                B = images.shape[0]
                if B % G != 0:
                    raise ValueError(f"grad_accum ({G}) must divide the "
                                     f"global batch ({B})")
                xs = (images.reshape((G, B // G) + images.shape[1:]),
                      labels.reshape(G, B // G))

                def body(acc, xs_g):
                    imgs_g, lbls_g = xs_g
                    l, g = jax.value_and_grad(loss_fn)(
                        params, imgs_g, lbls_g, input_norm=input_norm)
                    acc_l, acc_g = acc
                    return (acc_l + l, jax.tree_util.tree_map(
                        jnp.add, acc_g, g)), None

                zero = (jnp.zeros((), jnp.float32),
                        jax.tree_util.tree_map(
                            lambda p: jnp.zeros(p.shape, jnp.float32),
                            params))
                (loss, grads), _ = jax.lax.scan(body, zero, xs)
                return loss / G, jax.tree_util.tree_map(
                    lambda g: g / G, grads)

            def step(params, momentum_buf, images_u8, labels, lr, pkey,
                     epsilon=epsilon_default):
                if image_perturb:
                    # image injectors are defined in NORMALIZED space
                    # (reference GaussianNoiseTransform / UniformGrayTransform,
                    # measure...effect.py:36-60) — keep the explicit
                    # normalize pass so their semantics are byte-identical.
                    # Perturbation covers the WHOLE loader batch (one pkey per
                    # batch, reference semantics) before any accum split.
                    images = dimg.normalize_imagenet(images_u8)
                    images, labels2 = injectors.apply_vit_perturbation(
                        perturbation_type, pkey, images, labels,
                        epsilon=epsilon)
                    loss, grads = batch_grads(params, images, labels2,
                                              input_norm=None)
                else:
                    # hot path: normalization folded into the patch matrix
                    loss, grads = batch_grads(
                        params, images_u8, labels,
                        input_norm=(dimg.IMAGENET_MEAN, dimg.IMAGENET_STD))
                # torch SGD: g += wd*p ; buf = m*buf + g ; p -= lr*buf
                new_buf = jax.tree_util.tree_map(
                    lambda p, g, b: momentum * b + (g + wd * p),
                    params, grads, momentum_buf)
                if self.zero1 or self.fsdp:
                    # pin the buffer SHARDED: under zero1 this makes the
                    # p - lr*buf contraction lower to exactly ZeRO-1's
                    # per-step all-gather of the update; under fsdp the
                    # grads feeding it reduce-scatter instead (params stay
                    # sharded below, so nothing re-gathers here). Each chip
                    # keeps only its 1/N momentum slice between steps.
                    # fsdp momentum follows the param rule (1-D leaves
                    # replicated) so the buffers stay layout-aligned with
                    # the params they update.
                    _bs = (vmesh.fsdp_sharding if self.fsdp
                           else vmesh.zero1_sharding)
                    new_buf = jax.tree_util.tree_map(
                        lambda x: jax.lax.with_sharding_constraint(
                            x, _bs(self.mesh, x)), new_buf)
                new_params = jax.tree_util.tree_map(
                    lambda p, b: p - lr * b, params, new_buf)
                if self.zero1:
                    rep = vmesh.replicated(self.mesh)
                    new_params = jax.tree_util.tree_map(
                        lambda x: jax.lax.with_sharding_constraint(x, rep),
                        new_params)
                elif self.fsdp:
                    # FSDP: params LIVE sharded — the next step's forward
                    # all-gathers each weight right before its matmuls
                    # (fsdp_sharding: 1-D leaves replicated, see mesh.py)
                    new_params = jax.tree_util.tree_map(
                        lambda x: jax.lax.with_sharding_constraint(
                            x, vmesh.fsdp_sharding(self.mesh, x)),
                        new_params)
                return new_params, new_buf, loss

            self._train_steps[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._train_steps[key]

    @functools.cached_property
    def _eval_step(self):
        def step(params, images_u8, labels, valid):
            logits = self._classify(
                params, images_u8,
                input_norm=(dimg.IMAGENET_MEAN, dimg.IMAGENET_STD))
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            pred = jnp.argmax(logits, axis=-1)
            correct = jnp.sum((pred == labels) * valid)
            return jnp.sum(ce * valid), correct, jnp.sum(valid)

        return jax.jit(step)

    @functools.cached_property
    def _feature_step(self):
        vit_cfg, cdt = self.vit_cfg, self.compute_dtype
        norm = (dimg.IMAGENET_MEAN, dimg.IMAGENET_STD)

        if self.pp:
            from ..parallel import pipeline as vpp
            mesh, n_micro = self.mesh, self.n_micro

            def step(params, images_u8):
                return vpp.pipeline_features(
                    params[0], params[1], images_u8, vit_cfg, mesh,
                    n_micro=n_micro, pool="token", input_norm=norm,
                    compute_dtype=cdt)
        else:
            ss, ring = self._seq_shard, self.ring

            def step(params, images_u8):
                return vvit.forward_features(
                    params, images_u8, vit_cfg, pool="token",
                    input_norm=norm, compute_dtype=cdt,
                    seq_shard=ss, ring_attn=ring)

        return jax.jit(step)

    # -- epoch-level --------------------------------------------------------

    def shard(self, images_u8: np.ndarray, labels: np.ndarray):
        batch = vmesh.shard_batch(self.mesh, {"images": images_u8,
                                              "labels": labels})
        return batch["images"], batch["labels"]

    def train_one_epoch(self, params, momentum_buf, loader, epoch: int,
                        lr: float, *, perturbation_type: str | None = None,
                        epsilon: float = 0.1, perturb_seed: int = 42,
                        log_every: int = 100, logger=None,
                        guard=None, start_batch: int = 0,
                        loss_carry: tuple | None = None) -> tuple:
        """One epoch. `guard` (core/preempt.py) is polled at batch
        boundaries; on a stop request the loop finishes its current step
        and returns early with `guard.mid_state` set to the loop position
        (batch index to resume at + the running loss accumulator). A later
        call with `start_batch`/`loss_carry` from that state replays the
        deterministic loader past the trained prefix and continues the
        epoch bit-exactly (per-batch perturb keys depend only on
        (seed, epoch, batch_idx))."""
        log = logger.info if logger else print
        step = self._make_train_step(perturbation_type)
        # Loss accumulates ON DEVICE; the host only syncs every `log_every`
        # steps (matching the reference's per-100-batch print cadence,
        # train_vit_sgd.py:146-150). A per-step float(loss) would force a
        # device round-trip per batch (~4-5 ms each on this backend).
        carry_l, carry_n = loss_carry if loss_carry else (0.0, 0)
        total_loss = jnp.asarray(carry_l, jnp.float32)
        num_batches = carry_n
        t0 = time.time()
        n_batches = len(loader)
        raw = loader.epoch(epoch)
        if start_batch:
            # mid-epoch resume: decode-and-discard the already-trained
            # prefix BEFORE the device-placement stage (the skip costs host
            # decode only, no h2d transfers)
            raw = (b for i, b in enumerate(raw) if i >= start_batch)
        depth = getattr(self.cfg, "device_prefetch", 2)
        if depth > 0:
            batches = _device_prefetch(raw, self.shard, depth)
        else:
            batches = (self.shard(i, l) for i, l in raw)
        preempted = False
        for off, (images_u8, labels) in enumerate(batches):
            batch_idx = start_batch + off
            pkey = injectors.batch_perturb_key(perturb_seed, epoch, batch_idx)
            params, momentum_buf, loss = step(params, momentum_buf, images_u8,
                                              labels, lr, pkey, epsilon)
            total_loss = total_loss + loss
            num_batches += 1
            if batch_idx % log_every == 0:
                log(f"  Epoch {epoch} [{batch_idx:4d}/{n_batches}] "
                    f"Loss: {float(loss):.4f} LR: {lr:.6f}")
            if guard is not None and guard.should_stop():
                guard.mid_state = {
                    "epoch": epoch,
                    "batch_idx": batch_idx + 1,
                    "total_loss": float(total_loss),
                    "num_batches": num_batches,
                }
                log(f"  Preemption requested - stopping epoch {epoch} after "
                    f"batch {batch_idx} ({num_batches}/{n_batches} done)")
                preempted = True
                break
        avg_loss = float(total_loss) / max(num_batches, 1)
        if preempted:
            return params, momentum_buf, avg_loss
        # loader.batch_size is the per-process shard; report GLOBAL throughput
        n_images = num_batches * loader.batch_size * jax.process_count()
        dt = time.time() - t0
        log(f"Epoch {epoch} training completed in {dt / 60:.2f} minutes. "
            f"Avg Train Loss: {avg_loss:.4f} "
            f"[images_per_sec={n_images / max(dt, 1e-9):.1f}]")
        return params, momentum_buf, avg_loss

    def validate(self, params, loader, logger=None) -> tuple[float, float]:
        log = logger.info if logger else print
        # device-side accumulators: one host sync for the whole validation
        # pass instead of three float() round trips per batch
        tot_loss = jnp.zeros((), jnp.float32)
        tot_correct = jnp.zeros((), jnp.float32)
        tot_n = jnp.zeros((), jnp.float32)
        # each process pads its LOCAL shard to its local device count; the
        # assembled global batch is then exactly a multiple of the global
        # device count (padding to the global count here would multiply the
        # all-padding rows by the process count)
        n_dev = max(self.mesh.devices.size // jax.process_count(), 1)
        if self.pp:  # pipelined batches split further into n_micro microbatches
            n_dev = self.mesh.shape["data"] * self.n_micro
        for images_u8, labels in loader.epoch(0):
            (images_u8, labels), real = vmesh.pad_to_multiple(
                (images_u8, labels), n_dev)
            valid = (np.arange(len(labels)) < real).astype(np.float32)
            valid_arr = vmesh.shard_batch(self.mesh, valid)
            images_u8, labels = self.shard(images_u8, labels)
            ls, c, n = self._eval_step(params, images_u8, labels, valid_arr)
            # ONE global sum / ONE global count for BOTH metrics (the
            # reference's per-rank average + unnormalized SUM all_reduce
            # defect, train_vit_sgd.py:193-196, is fixed here; averaging
            # per-batch means would overweight a partial final batch)
            tot_loss = tot_loss + ls
            tot_correct = tot_correct + c
            tot_n = tot_n + n
        val_loss = float(tot_loss) / max(float(tot_n), 1.0)
        val_acc = 100.0 * float(tot_correct) / max(float(tot_n), 1.0)
        log(f"Validation - Loss: {val_loss:.4f}, Accuracy: {val_acc:.2f}%")
        return val_loss, val_acc

    def compute_rsa_score(self, params, things_images_u8: np.ndarray,
                          reference_rdm: np.ndarray,
                          batch_size: int = 8) -> tuple[float, float]:
        """forward_features CLS embeddings in dataset order -> RDM -> Spearman
        (reference compute_rsa_score, measure...effect.py:298-355).

        Multi-host: each process embeds its strided shard (indices p::P,
        wrap-padded to equal counts) and the shards are gathered back into
        dataset order — fixing the reference's rank-order concatenation
        defect (measure...effect.py:327-334, SURVEY.md section 0)."""
        from ..parallel import dist
        n = len(things_images_u8)
        P_ = jax.process_count()
        if P_ > 1:
            per = (n + P_ - 1) // P_
            idx = np.arange(jax.process_index(), P_ * per, P_) % n
            my_images = things_images_u8[idx]
        else:
            my_images = things_images_u8
        if self.pp:
            # the pipelined step needs every chunk to divide into its fixed
            # (data-shard x microbatch) split — round the chunk size UP to
            # the unit (batch_size itself may not be a multiple of it)
            unit = self.mesh.shape["data"] * self.n_micro
            batch_size = ((batch_size + unit - 1) // unit) * unit
        embs = []
        for s in range(0, len(my_images), batch_size):
            chunk = my_images[s:s + batch_size]
            real = len(chunk)
            if self.pp and real < batch_size:
                # pad the ragged tail; padded rows are dropped after
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - real,) + chunk.shape[1:],
                                     chunk.dtype)])
            embs.append(np.asarray(self._feature_step(
                params, jnp.asarray(chunk)))[:real])
        emb = dist.ordered_allgather_strided(np.concatenate(embs), n)
        rho, p, _ = vrsa.behavioral_rsa(jnp.asarray(emb),
                                        jnp.asarray(reference_rdm))
        return float(rho), float(p)


def run_vit_training(cfg: ViTTrainConfig, logger=None,
                     vit_cfg: vvit.ViTConfig | None = None,
                     preempt_guard=None) -> dict:
    """Full ViT-B/16 ImageNet training with auto-resume (reference main,
    train_vit_sgd.py:246-371).

    Preemption (cfg.preempt_save, beyond-reference): a SIGTERM mid-epoch
    checkpoints {params, momentum, scheduler, epoch, batch_idx, running
    loss} to checkpoint_preempt.pth and returns {"preempted": True}; the
    next invocation resumes INSIDE that epoch and reproduces the
    uninterrupted run bit-exactly. `preempt_guard` injects a prebuilt
    core.preempt.PreemptionGuard (tests use a stub that trips after N
    batches)."""
    from ..ckpt import vit_ckpt
    from ..ckpt import serialization as ser
    from ..train.schedules import CosineAnnealingLRWithWarmup
    from ..parallel import dist

    log = logger.info if logger else print
    if vit_cfg is not None and cfg.moe_experts and \
            vit_cfg.moe_experts != cfg.moe_experts:
        # the two config surfaces can otherwise silently disagree (the model
        # config wins inside ViTTrainer) — make the caller pick one
        raise ValueError(
            f"moe_experts disagrees between ViTTrainConfig "
            f"({cfg.moe_experts}) and the explicit vit_cfg "
            f"({vit_cfg.moe_experts}); set it on the vit_cfg (or pass "
            f"vit_cfg=None to build one from the train config)")
    vit_cfg = vit_cfg or vvit.ViTConfig(
        patch=16, width=768, layers=12, heads=12,
        image_size=cfg.image_size, num_classes=cfg.num_classes,
        moe_experts=cfg.moe_experts, moe_topk=cfg.moe_topk,
        moe_capacity=cfg.moe_capacity)

    proc_id, proc_count = dist.setup_distributed()
    pp = cfg.pp_stages > 1
    sp, ep = cfg.sp_devices > 1, cfg.ep_devices > 1
    tp = getattr(cfg, "tp_devices", 1) > 1
    if (pp or sp or ep or tp) and proc_count > 1:
        raise ValueError("pp/sp/ep/tp meshes are single-process: one host "
                         "drives the second mesh axis")
    mesh = vmesh.make_mesh(n_stage=cfg.pp_stages if pp else 1,
                           n_model=(cfg.sp_devices if sp
                                    else cfg.tp_devices if tp else 1),
                           n_expert=cfg.ep_devices if ep else 1)
    n_dev = mesh.devices.size
    log("=" * 60)
    log("ViT-Base ImageNet Training (SGD)")
    log("=" * 60)
    log(f"Devices (data mesh): {n_dev}  processes: {proc_count}")
    if pp:
        log(f"Pipeline: {cfg.pp_stages} stages x "
            f"{mesh.shape['data']} data shards, {cfg.pp_micro} microbatches "
            f"(bubble {(cfg.pp_stages - 1)}/"
            f"{cfg.pp_micro + cfg.pp_stages - 1})")
        if cfg.batch_size % cfg.grad_accum != 0:
            raise ValueError(f"global batch {cfg.batch_size} must divide by "
                             f"grad_accum = {cfg.grad_accum}")
        unit = mesh.shape["data"] * cfg.pp_micro
        # grad_accum splits the batch BEFORE it reaches the pipeline, so the
        # per-accum-microbatch size is what the pipeline's split must divide
        if (cfg.batch_size // cfg.grad_accum) % unit != 0:
            raise ValueError(
                f"per-grad-accum batch {cfg.batch_size}//{cfg.grad_accum} = "
                f"{cfg.batch_size // cfg.grad_accum} must divide by "
                f"data_shards*pp_micro = {unit}")
    log(f"Global batch size: {cfg.batch_size}")
    log(f"Total epochs: {cfg.epochs}")
    log(f"Optimizer: SGD lr={cfg.lr} momentum={cfg.momentum} "
        f"wd={cfg.weight_decay} warmup={cfg.warmup_epochs}")
    log(f"Output directory: {cfg.output_dir}")

    trainer = ViTTrainer(vit_cfg, cfg, mesh)
    params = vvit.init_vit_params(jax.random.PRNGKey(cfg.random_seed), vit_cfg)
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"Model created. Parameters: {total / 1e6:.1f}M")

    momentum_buf = sgd_init(params)
    scheduler = CosineAnnealingLRWithWarmup(cfg.lr, cfg.warmup_epochs,
                                            cfg.epochs)

    # Each process loads only its strided shard and feeds its local batch
    # (cfg.batch_size is GLOBAL); shard_batch assembles the global array
    # (reference DistributedSampler + per-rank loaders, train_vit_sgd.py:58-66)
    if cfg.batch_size % proc_count != 0:  # not an assert: must survive -O
        raise ValueError(f"global batch {cfg.batch_size} must divide by "
                         f"{proc_count} processes")
    local_bs = cfg.batch_size // proc_count
    # make_loader routes each split to PackedLoader when it is a packed
    # (fipack) directory — cli.pack converts an ImageFolder tree once and
    # training becomes source-agnostic (identical batches either way)
    from ..data.packed import make_loader
    train_loader = make_loader(
        f"{cfg.data_path}/train", local_bs, train=True,
        seed=cfg.random_seed, size=cfg.image_size, workers=cfg.num_workers,
        drop_last=True, use_native=cfg.use_native_loader,
        num_shards=proc_count, shard_id=proc_id, echo=cfg.data_echo)
    val_loader = make_loader(
        f"{cfg.data_path}/val", local_bs, train=False,
        size=cfg.image_size, workers=cfg.num_workers,
        use_native=cfg.use_native_loader,
        num_shards=proc_count, shard_id=proc_id)
    log(f"Data loaded. Train batches: {len(train_loader)}, "
        f"Val batches: {len(val_loader)}")

    start_epoch = 0
    latest = vit_ckpt.latest_checkpoint(cfg.output_dir)
    if latest:
        ckpt = vit_ckpt.load_checkpoint(latest)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        momentum_buf = jax.tree_util.tree_map(jnp.asarray, ckpt["opt_state"])
        scheduler.load_state_dict(ckpt["scheduler_state"])
        start_epoch = ckpt["epoch"] + 1
        log(f"Resumed from epoch {ckpt['epoch']}")

    # mid-epoch preemption checkpoint: valid only if it continues exactly
    # the NEXT epoch (start_epoch); anything older is superseded by the
    # per-epoch checkpoint above and is deleted, anything newer means a
    # torn tree (an epoch checkpoint vanished) and is ignored loudly
    mid_resume = None
    preempt_path = os.path.join(cfg.output_dir, "checkpoint_preempt.pth")
    if proc_count == 1 and os.path.exists(preempt_path):
        pc = ser.load(preempt_path)
        if pc["epoch"] == start_epoch:
            params = jax.tree_util.tree_map(jnp.asarray, pc["params"])
            momentum_buf = jax.tree_util.tree_map(jnp.asarray,
                                                  pc["opt_state"])
            scheduler.load_state_dict(pc["scheduler_state"])
            mid_resume = {k: pc[k] for k in (
                "epoch", "batch_idx", "total_loss", "num_batches")}
            log(f"Resuming mid-epoch {pc['epoch']} at batch "
                f"{pc['batch_idx']} (preemption checkpoint)")
            del pc  # drop the host param trees (device copies made above)
        elif pc["epoch"] < start_epoch:
            os.unlink(preempt_path)
        else:
            log(f"WARNING: ignoring checkpoint_preempt.pth for epoch "
                f"{pc['epoch']} > next epoch {start_epoch} (torn tree?)")

    if pp:
        from ..parallel import pipeline as vpp
        # (rest, blocks_st) stage-stacked state; checkpoints stay in the
        # flat reference layout via unstage_blocks below
        params = vpp.shard_params_pp(mesh, params)
        momentum_buf = vpp.shard_params_pp(mesh, momentum_buf)
    elif ep:
        # expert FFNs (and their momentum) live sharded over 'expert'
        params = vmesh.shard_vit_params_ep(mesh, params)
        momentum_buf = vmesh.shard_vit_params_ep(mesh, momentum_buf)
    elif tp:
        # Megatron tp: block weights (and their momentum) live sharded over
        # 'model' in the head-aligned [D,3,D] layout; every update is
        # elementwise in that layout, so XLA keeps it across steps.
        # Checkpoints flatten back via unshard_vit_params_tp below.
        params = vmesh.shard_vit_params_tp(mesh, params,
                                           heads=trainer.vit_cfg.heads)
        momentum_buf = vmesh.shard_vit_params_tp(mesh, momentum_buf,
                                                 heads=trainer.vit_cfg.heads)
    elif cfg.fsdp:
        # FSDP: params AND momentum live 1/N per chip; the step's sharding
        # constraints keep them there (XLA gathers weights on use)
        params = vmesh.shard_params_fsdp(mesh, params)
        momentum_buf = vmesh.shard_params_fsdp(mesh, momentum_buf)
    else:
        params = vmesh.replicate(mesh, params)
        momentum_buf = (vmesh.shard_opt_state(mesh, momentum_buf)
                        if cfg.zero1
                        else vmesh.replicate(mesh, momentum_buf))

    from ..core.profiling import trace
    from ..core.preempt import PreemptionGuard
    guard = preempt_guard
    if guard is None and cfg.preempt_save:
        guard = PreemptionGuard()
    guard_cm = guard if (guard is not None and preempt_guard is None) \
        else contextlib.nullcontext()
    with guard_cm:
        for epoch in range(start_epoch, cfg.epochs):
            log(f"Epoch {epoch}/{cfg.epochs - 1}")
            lr = scheduler.peek()
            mid_kw = {}
            if mid_resume is not None and epoch == start_epoch:
                mid_kw = dict(start_batch=mid_resume["batch_idx"],
                              loss_carry=(mid_resume["total_loss"],
                                          mid_resume["num_batches"]))
            with trace(cfg.profile_dir if epoch == start_epoch else None):
                params, momentum_buf, train_loss = trainer.train_one_epoch(
                    params, momentum_buf, train_loader, epoch, lr,
                    logger=logger, guard=guard, **mid_kw)
            if guard is not None and getattr(guard, "mid_state", None):
                # the scheduler state saved here is the epoch-START state
                # (step() has not run), so the resume's peek() re-derives
                # the same lr this partial epoch trained with
                ms = guard.mid_state
                if pp:
                    save_p = vpp.unstage_blocks(*params)
                    save_m = vpp.unstage_blocks(*momentum_buf)
                elif tp:
                    save_p = vmesh.unshard_vit_params_tp(params)
                    save_m = vmesh.unshard_vit_params_tp(momentum_buf)
                else:
                    save_p, save_m = params, momentum_buf
                ser.save(preempt_path, {
                    "epoch": ms["epoch"], "batch_idx": ms["batch_idx"],
                    "total_loss": ms["total_loss"],
                    "num_batches": ms["num_batches"],
                    "params": save_p, "opt_state": save_m,
                    "scheduler_state": scheduler.state_dict()})
                log(f"Preempted: saved {preempt_path} (epoch {ms['epoch']}, "
                    f"next batch {ms['batch_idx']}); exiting resumable")
                return {"preempted": True, "params": params,
                        "momentum_buf": momentum_buf, "scheduler": scheduler}
            scheduler.step()
            if cfg.host_prefetch and not (pp or tp):
                # start the checkpoint trees' d2h now so the transfer
                # overlaps the validation dispatches below (core/hostcopy.py;
                # pp/tp excluded — their save trees are rebuilt into the
                # flat layout after validate)
                hostcopy.prefetch_to_host(params, momentum_buf)
            val_loss, val_acc = trainer.validate(params, val_loader,
                                                 logger=logger)
            # EVERY process calls save_checkpoint: the pod-sharded orbax
            # writer is a collective (each host writes its own shards +
            # global barrier) and would deadlock behind a primary-only gate;
            # the single-host pickle path gates non-primary writes
            # internally.
            if pp:  # persist in the flat solo layout (dp runs can resume it)
                save_p = vpp.unstage_blocks(*params)
                save_m = vpp.unstage_blocks(*momentum_buf)
            elif tp:  # same contract: flatten the head-aligned qkv leaves
                save_p = vmesh.unshard_vit_params_tp(params)
                save_m = vmesh.unshard_vit_params_tp(momentum_buf)
            else:
                save_p, save_m = params, momentum_buf
            vit_ckpt.save_checkpoint(
                epoch, save_p, save_m, scheduler.state_dict(), train_loss,
                val_loss, val_acc, cfg.output_dir,
                logger=logger if dist.is_primary() else None)
            if cfg.keep_last > 0:
                vit_ckpt.prune_checkpoints(cfg.output_dir, cfg.keep_last,
                                           epoch, logger=logger)
            if mid_resume is not None and epoch == start_epoch:
                # this epoch completed past its preemption point; the
                # mid-epoch checkpoint is superseded by the full one above
                try:
                    os.unlink(preempt_path)
                except OSError:
                    pass
            # epoch-boundary poll in the COLLECTIVE form: on pods the
            # mid-epoch (local) poll always answers False, so this is where
            # a pod run stops — after the collective save above, with every
            # host at the same loop point (a notice seen by any host stops
            # all of them). Skipped on the last epoch (loop exits anyway)
            # and for duck-typed test guards without the collective method.
            coll = getattr(guard, "should_stop_collective", None)
            if coll is not None and epoch + 1 < cfg.epochs and coll():
                log(f"Preemption requested - stopped cleanly after epoch "
                    f"{epoch} (checkpoint saved; auto-resume continues at "
                    f"epoch {epoch + 1})")
                return {"preempted": True, "params": params,
                        "momentum_buf": momentum_buf, "scheduler": scheduler}
    log("Training Complete!")
    return {"params": params, "momentum_buf": momentum_buf,
            "scheduler": scheduler}
