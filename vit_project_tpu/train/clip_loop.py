"""CLIP-HBA behavioral training loop.

Faithful port of the reference semantics (train_model + run_behavioral_training,
new_cvpr_train_behavior_things_pipeline.py:782-1227) onto jitted TPU steps:

- per-epoch: train over shuffled batches -> eval on test split -> behavioral RSA on
  the 48 inference images -> CSV row -> DoRA checkpoint -> random-state checkpoint
  -> early stopping (patience paused inside the perturbation window, ref
  :1043-1056);
- perturbation window [training_run-1, training_run-1+perturb_length-1] 0-indexed,
  per-batch injector keys from perturb_seed + training_run*1000 + batch_idx;
- NaN guards: a batch whose targets/predictions/loss are non-finite is skipped
  without an optimizer update (ref :929-998 `continue`);
- resume: CSV pre-population, DoRA + optimizer-state restore, replayable data order.

Throughput design: batches are uint8 host slices; normalization, perturbation,
forward, backward, and the AdamW update are ONE jitted call with donated
(trainable, opt_state). Eval and the 48-image RSA are jitted too, so a full epoch
is ~25 device calls with zero host-side math.
"""
from __future__ import annotations

import functools
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..adapters import dora as adora
from ..ckpt import clip_ckpt, serialization as ser
from ..core import csvio, hostcopy
from ..core.configs import ClipRunConfig
from ..core.logs import setup_logger
from ..core.prng import batch_perturb_key, perturb_base_key
from ..data import things as dthings
from ..data.spose66 import classnames66
from ..models import clip as vclip
from ..models import tokenizer as vtok
from ..models import vit as vvit
from ..ops import rsa as vrsa
from ..parallel import dist
from ..perturb import injectors, windows


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """torch AdamW defaults (reference uses AdamW(params, lr=lr), ref :1181):
    betas (0.9, 0.999), eps 1e-8, decoupled weight decay 0.01."""
    return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)


class ClipHBATrainer:
    """Bundles model config, jitted step builders, and checkpoint plumbing."""

    def __init__(self, clip_cfg: vclip.CLIPConfig, params: dict,
                 adapter_cfg: dict, static: dict, prompt_tokens: np.ndarray,
                 lr: float, compute_dtype=jnp.bfloat16,
                 perturb_distribution: str = "target",
                 dist_mean: float = 0.0, dist_std: float = 1.0, mesh=None,
                 remat: bool = False, sp: bool = False,
                 sp_ring: bool = False):
        """`mesh` (a ('data',) jax Mesh) enables data-parallel batches — the
        TPU-native equivalent of the reference's cuda==-1 nn.DataParallel wrap
        (run_behavioral_training :1174-1176); partial batches are padded to the
        device count and masked out of the loss."""
        from ..parallel import mesh as vmesh
        self.cfg = clip_cfg
        self.mesh = mesh
        self.n_dev = mesh.devices.size if mesh is not None else 1
        if mesh is not None:
            params = vmesh.replicate(mesh, params)
            static = vmesh.replicate(mesh, static)
        self.params = params
        self.acfg = adapter_cfg
        self.static = static
        self.prompts = jnp.asarray(prompt_tokens)
        self.optimizer = make_optimizer(lr)
        self.compute_dtype = compute_dtype
        self.perturb_distribution = perturb_distribution
        self.dist_mean = dist_mean
        self.dist_std = dist_std
        # per-block jax.checkpoint on the visual tower (models/vit.py
        # _block_fn): the memory lever for backbones whose activations
        # outgrow HBM at the training batch size
        self.remat = remat
        # sequence parallelism for the VISUAL tower (gather form; sp_ring
        # upgrades to ring attention): needs a ('data','model') mesh
        if sp_ring and not sp:
            raise ValueError("sp_ring needs sp=True")
        if sp and mesh is None:
            raise ValueError("sp=True needs a ('data','model') mesh "
                             "(make_mesh(n_model=...)); got mesh=None")
        self.seq_shard = vmesh.seq_sharding(mesh) if sp else None
        self.sp_ring = sp_ring
        self._steps: dict = {}

    def init_opt_state(self, trainable):
        return self.optimizer.init(trainable)

    def prepare_state(self, tree):
        """Replicate trainable/optimizer state onto the mesh (no-op without)."""
        if self.mesh is None:
            return tree
        from ..parallel import mesh as vmesh
        return vmesh.replicate(self.mesh, tree)

    def _prep_batch(self, images_u8, targets=None, pad_to: int | None = None):
        """Host batch -> device batch (+ valid mask), padded to the device
        count when data-parallel.

        `pad_to` pads the leading axis to a FIXED size (the configured batch
        size): streaming callers that see a trailing partial batch then keep
        one compiled step shape instead of recompiling per distinct size."""
        from ..parallel import mesh as vmesh
        n = len(images_u8)
        if pad_to is not None and n < pad_to:
            pad = pad_to - n
            images_u8 = np.pad(np.asarray(images_u8),
                               [(0, pad)] + [(0, 0)] * (images_u8.ndim - 1))
            if targets is not None:
                targets = np.pad(np.asarray(targets),
                                 [(0, pad)] + [(0, 0)] * (targets.ndim - 1))
        if self.mesh is None:
            valid = (jnp.arange(len(images_u8)) < n).astype(jnp.float32)
            if targets is None:
                return jnp.asarray(images_u8), None, valid
            return jnp.asarray(images_u8), jnp.asarray(targets), valid
        tree = (np.asarray(images_u8),) if targets is None else (
            np.asarray(images_u8), np.asarray(targets))
        tree, _ = vmesh.pad_to_multiple(tree, self.n_dev)
        valid = (np.arange(len(tree[0])) < n).astype(np.float32)
        # Multi-host: every CLIP process builds the SAME global batch (the
        # THINGS dataset is replicated, unlike the sharded ImageFolder path),
        # but shard_batch's multihost branch expects each process's LOCAL
        # shard — slice this process's contiguous block or the global batch
        # would contain P duplicate copies (inflating eval sums P-fold).
        tree = jax.tree_util.tree_map(self._local_rows, tree + (valid,))
        sharded = vmesh.shard_batch(self.mesh, tree)
        if targets is None:
            return sharded[0], None, sharded[1]
        return sharded[0], sharded[1], sharded[2]

    def _local_rows(self, x):
        """This process's contiguous block of a globally-replicated batch
        (P('data') row ownership order of a multihost mesh)."""
        P = jax.process_count()
        if P == 1:
            return x
        if len(x) % P != 0:
            # a silent floor-division here would DROP the remainder rows
            # from the assembled global batch (torn data, no error)
            raise ValueError(f"global batch width {len(x)} must divide by "
                             f"{P} processes")
        per = len(x) // P
        k = jax.process_index()
        return x[k * per:(k + 1) * per]

    # -- device-resident dataset path ----------------------------------------
    # The decode-once uint8 cache (data/things.py) is small enough to live in
    # HBM (1,806 train images = 217 MB), so the whole dataset is uploaded ONCE
    # and per-batch slices are gathered on device by index. This removes the
    # per-batch host->device transfer from the epoch entirely (on this round's
    # tunneled chip that transfer is ~6-8 MB/s and would dominate; on any real
    # TPU VM it still saves PCIe traffic and host work).

    def upload_dataset(self, images_u8: np.ndarray,
                       targets: np.ndarray | None = None):
        """Upload a full dataset to device (replicated over the mesh)."""
        img = jnp.asarray(images_u8)
        tgt = jnp.asarray(targets) if targets is not None else None
        if self.mesh is not None:
            from ..parallel import mesh as vmesh
            img = vmesh.replicate(self.mesh, img)
            if tgt is not None:
                tgt = vmesh.replicate(self.mesh, tgt)
        return img, tgt

    # -- frozen-prefix activation cache --------------------------------------
    # DoRA adapts only the LAST vision_layers/transformer_layers blocks and
    # the THINGS pipeline has no random augmentation, so the activations at
    # the adapter split are a pure per-image constant for the whole run.
    # Computing them once turns every train/eval/RSA step into a 2-block
    # (+1 text block) suffix instead of a 24-block tower — ~92% of the
    # forward FLOPs removed at the reference configuration. Costs HBM:
    # [N, S, width] in the compute dtype (1,806 ViT-L/14 images ~ 950 MB
    # bf16). Opt-in via config frozen_cache (numerically equivalent but not
    # bit-identical to the full tower: the prefix runs in its own program,
    # so XLA may fuse/round differently at the program boundary).

    def _suffix_sizes(self) -> tuple[int, int]:
        """(n_visual_suffix, n_text_suffix): how many trailing blocks of each
        tower carry adapters (derived from the DoRA static tree so any
        vision_layers/transformer_layers configuration splits correctly)."""
        vcfg = self.cfg.visual
        if not isinstance(vcfg, vvit.ViTConfig):
            raise ValueError("frozen-prefix caching needs a transformer "
                             "visual tower; the RN trunk has no block split")
        vis = [int(i) for i in self.static.get("visual", {})]
        txt = [int(i) for i in self.static.get("text", {})]
        n_vis = vcfg.layers - min(vis) if vis else 0
        n_txt = self.cfg.text.layers - min(txt) if txt else 0
        return n_vis, n_txt

    @functools.cached_property
    def _prefix_step(self):
        cfg, cdt = self.cfg, self.compute_dtype
        n_vis, _ = self._suffix_sizes()

        def step(params, images_u8):
            images = dthings.normalize_uint8(images_u8)
            return vvit.clip_visual_prefix(params["visual"], images,
                                           cfg.visual, n_suffix=n_vis,
                                           compute_dtype=cdt)

        return jax.jit(step)

    def _device_chunks(self, src, chunk: int):
        """Yield fixed-shape slices of `src`: chunk width rounded up to the
        device count, tail zero-padded — every yielded array has ONE compiled
        shape. Shared by build_prefix_cache and infer_in_chunks so the
        device-multiple rounding and tail-padding invariants live once."""
        chunk = -(-chunk // self.n_dev) * self.n_dev
        for s in range(0, src.shape[0], chunk):
            part = src[s:s + chunk]
            short = chunk - part.shape[0]
            if short > 0:
                part = jnp.pad(part,
                               ((0, short),) + ((0, 0),) * (part.ndim - 1))
            yield part

    def build_prefix_cache(self, imgs_dev, chunk: int = 256) -> jax.Array:
        """Frozen-prefix activations [N, S, width] for a resident uint8 image
        set, computed in fixed-shape chunks (one compiled shape; bounds the
        build's activation memory the way infer_in_chunks does)."""
        if self.seq_shard is not None or self.sp_ring:
            raise ValueError(
                "frozen_cache is incompatible with sequence parallelism: "
                "the cache holds full-S activations, which defeats sp's "
                "token sharding (and the sp forward has no prefix split)")
        n = imgs_dev.shape[0]
        outs = [self._prefix_step(self.params, part)
                for part in self._device_chunks(imgs_dev, chunk)]
        cache = jnp.concatenate(outs)[:n] if len(outs) > 1 else outs[0][:n]
        if self.mesh is not None:
            from ..parallel import mesh as vmesh
            cache = vmesh.replicate(self.mesh, cache)
        return cache

    @functools.cached_property
    def text_prefix_cache(self):
        """(hidden [n_prompts, context, width], eot [n_prompts]) — the
        prompts' frozen text prefix, computed once per trainer."""
        cfg, cdt = self.cfg, self.compute_dtype
        _, n_txt = self._suffix_sizes()
        fn = jax.jit(lambda p, t: vclip.encode_text_prefix(
            p, t, cfg, n_suffix=n_txt, compute_dtype=cdt))
        hidden, eot = fn(self.params, self.prompts)
        if self.mesh is not None:
            from ..parallel import mesh as vmesh
            hidden = vmesh.replicate(self.mesh, hidden)
            eot = vmesh.replicate(self.mesh, eot)
        return hidden, eot

    def _prep_idx(self, idx: np.ndarray, batch_size: int):
        """Index batch -> (device idx padded, valid mask).

        Padding to the FULL batch size (not just the device count) keeps one
        compiled step shape for every batch including the final partial one;
        the width is additionally rounded up to a multiple of the device
        count so a batch_size that does not divide the mesh still shards
        (same convention as _prep_idx_mat / pad_to_multiple).
        """
        n = len(idx)
        width = batch_size
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            width = ((batch_size + n_dev - 1) // n_dev) * n_dev
        idx_p = np.pad(np.asarray(idx, np.int32), (0, width - n))
        valid = (np.arange(width) < n).astype(np.float32)
        if self.mesh is not None:
            from ..parallel import mesh as vmesh
            # multihost: pass only this process's block (see _prep_batch)
            idx_p, valid = vmesh.shard_batch(
                self.mesh, (self._local_rows(idx_p), self._local_rows(valid)))
        return jnp.asarray(idx_p), jnp.asarray(valid)

    def _step_core(self, perturb_type: str, gated: bool = False,
                   cached: bool = False):
        """Shared body of both train-step variants: perturb -> masked-MSE
        forward -> grads -> AdamW update with the NaN batch-skip guard
        (reference train_model 'continue' on non-finite batches, ref :929-998).

        gated=True returns a core taking a trailing `in_win` bool that
        selects perturbed vs clean inputs per call — one compiled program
        serves every epoch of a perturbation window (the batched multi-fork
        runner vmaps the flag over forks with different windows). The
        injector always runs; its cost is noise next to the tower fwd+bwd.

        cached=True builds the frozen-prefix-cache core: `images` carries the
        cached [B, S, width] prefix activations (build_prefix_cache) instead
        of uint8 images, the forward runs only the adapted suffix blocks
        (clip_hba_suffix_forward), and a trailing `txt_cache=(hidden, eot)`
        supplies the prompts' cached text prefix. Image-perturbing kinds are
        rejected — they change the tower INPUT, so those epochs must run the
        full-tower core (train_model routes them there)."""
        if cached and perturb_type in injectors.IMAGE_KINDS:
            raise ValueError(
                f"perturb_type={perturb_type!r} replaces the input images; "
                "the frozen-prefix cache is stale under it — use the "
                "full-tower step for in-window epochs of image kinds")
        optimizer = self.optimizer
        cfg, acfg, prompts = self.cfg, self.acfg, self.prompts
        cdt, rm = self.compute_dtype, self.remat
        dist_kind = self.perturb_distribution
        dmean, dstd = self.dist_mean, self.dist_std
        ss, sr = self.seq_shard, self.sp_ring
        if cached:
            nv, nt = self._suffix_sizes()

        def loss_fn(trainable, params, static, images, targets, valid,
                    dropout_key, txt_cache=None):
            ad = adora.assemble(trainable, static)
            if cached:
                preds = vclip.clip_hba_suffix_forward(
                    params, images, txt_cache[0], txt_cache[1], cfg,
                    n_vis_suffix=nv, n_txt_suffix=nt, adapters=ad,
                    adapter_cfg=acfg, dropout_key=dropout_key,
                    deterministic=False, remat=rm)
            else:
                preds = vclip.clip_hba_forward(
                    params, images, prompts, cfg, adapters=ad,
                    adapter_cfg=acfg, dropout_key=dropout_key,
                    deterministic=False, compute_dtype=cdt, remat=rm,
                    seq_shard=ss, ring_attn=sr)
            row_mse = jnp.mean((preds - targets) ** 2, axis=-1)
            loss = jnp.sum(row_mse * valid) / jnp.sum(valid)
            return loss, preds

        def core(trainable, opt_state, params, static, images, targets,
                 valid, perturb_key, dropout_key, in_win=None,
                 txt_cache=None):
            p_images, p_targets = injectors.apply_clip_perturbation(
                perturb_type, perturb_key, images, targets,
                distribution=dist_kind, mean=dmean, std=dstd, valid=valid)
            if gated:
                images = jnp.where(in_win, p_images, images)
                targets = jnp.where(in_win, p_targets, targets)
            else:
                images, targets = p_images, p_targets
            (loss, preds), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, params, static, images,
                                       targets, valid, dropout_key, txt_cache)
            ok = (jnp.isfinite(loss)
                  & jnp.all(jnp.isfinite(targets))
                  & jnp.all(jnp.isfinite(preds)))
            updates, new_opt = optimizer.update(grads, opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            return (keep(new_trainable, trainable), keep(new_opt, opt_state),
                    loss, ok)

        return core

    def _train_step_resident(self, perturb_type: str):
        key = ("resident", perturb_type)
        if key not in self._steps:
            core = self._step_core(perturb_type)

            def step(trainable, opt_state, params, static, all_images_u8,
                     all_targets, idx, valid, perturb_key, dropout_key):
                images = dthings.normalize_uint8(all_images_u8[idx])
                return core(trainable, opt_state, params, static, images,
                            all_targets[idx], valid, perturb_key, dropout_key)

            self._steps[key] = jax.jit(step, donate_argnums=(0, 1))
        return self._steps[key]

    def _prep_idx_mat(self, batch_list, batch_size: int):
        """[n_batches, padded_width] index + valid matrices for the epoch
        scan. Data-parallel: the width is padded to a multiple of the device
        count and the trailing axis is sharded over 'data', so each scan step
        gathers/computes only its shard (GSPMD propagates the placement
        through the whole scanned program — grad/metric reductions become
        psums over ICI)."""
        width = batch_size
        if self.mesh is not None:
            width = -(-batch_size // self.n_dev) * self.n_dev
        idx_mat = np.zeros((len(batch_list), width), np.int32)
        valid_mat = np.zeros((len(batch_list), width), np.float32)
        for i, b in enumerate(batch_list):
            idx_mat[i, :len(b)] = b
            valid_mat[i, :len(b)] = 1.0
        if self.mesh is None:
            return jnp.asarray(idx_mat), jnp.asarray(valid_mat)
        from jax.sharding import NamedSharding, PartitionSpec as P
        s = NamedSharding(self.mesh, P(None, "data"))
        nproc = jax.process_count()
        if nproc > 1:
            # every process builds the same global matrices (THINGS is
            # replicated); hand the assembly only this process's contiguous
            # column block (same ownership order as _local_rows)
            w_loc = width // nproc
            k = jax.process_index()
            return tuple(jax.make_array_from_process_local_data(
                s, m[:, k * w_loc:(k + 1) * w_loc])
                for m in (idx_mat, valid_mat))
        return jax.device_put(idx_mat, s), jax.device_put(valid_mat, s)

    def _epoch_scan(self, perturb_type: str, cached: bool = False):
        """One compiled program for a WHOLE training epoch.

        cached=True: the scanned step is the frozen-prefix-cache core (see
        _step_core) — feed the prefix cache where the uint8 dataset would go,
        plus txt_cache=self.text_prefix_cache.

        With the dataset resident in HBM, the epoch is a lax.scan over the
        per-batch index matrix: zero host round-trips between batches (each
        dispatch costs ~5-10 ms over this round's tunnel, x23 batches/epoch).
        Per-batch perturbation keys fold the traced batch index into the
        (perturb_seed + training_run*1000) base, so the stream is identical to
        the per-step path and to the reference's seed arithmetic.
        Mesh-ready: with a data mesh, feed idx/valid matrices sharded
        P(None, 'data') (see _prep_idx_mat) — the batch axis of every step in
        the scan is then partitioned over devices and XLA inserts the gradient
        all-reduces, same as the per-step dp path.
        """
        key = ("epoch_cached" if cached else "epoch", perturb_type)
        if key not in self._steps:
            core = self._step_core(perturb_type, cached=cached)

            def epoch_fn(trainable, opt_state, params, static, all_images_u8,
                         all_targets, idx_mat, valid_mat, dropout_epoch_key,
                         base_pkey, txt_cache=None):
                def body(carry, xs):
                    trainable, opt_state = carry
                    batch_i, idx, valid = xs
                    pkey = jax.random.fold_in(base_pkey, batch_i)
                    dkey = jax.random.fold_in(dropout_epoch_key, batch_i)
                    if cached:
                        # all_images_u8 carries the prefix-activation cache
                        images = all_images_u8[idx]
                    else:
                        images = dthings.normalize_uint8(all_images_u8[idx])
                    trainable, opt_state, loss, ok = core(
                        trainable, opt_state, params, static, images,
                        all_targets[idx], valid, pkey, dkey,
                        txt_cache=txt_cache)
                    return (trainable, opt_state), (loss, ok)

                n_b = idx_mat.shape[0]
                (trainable, opt_state), (losses, oks) = jax.lax.scan(
                    body, (trainable, opt_state),
                    (jnp.arange(n_b), idx_mat, valid_mat))
                return trainable, opt_state, losses, oks

            self._steps[key] = jax.jit(epoch_fn, donate_argnums=(0, 1))
        return self._steps[key]

    @functools.cached_property
    def _eval_scan(self):
        return self._make_eval_scan(cached=False)

    @functools.cached_property
    def _eval_scan_cached(self):
        return self._make_eval_scan(cached=True)

    def _make_eval_scan(self, cached: bool):
        """Whole-eval-set program: lax.scan over the batch index matrix
        accumulating the dataset-weighted MSE sum on device — ONE dispatch
        and ONE host sync per eval instead of one of each per batch (the
        per-batch float() round trips cost more than the forwards at ~6
        batches/epoch over this round's tunnel; see BENCHLOG.md).

        cached=True takes the frozen-prefix cache in place of the uint8
        image set plus a trailing txt_cache (see _step_core)."""
        cfg, acfg, prompts, cdt = self.cfg, self.acfg, self.prompts, \
            self.compute_dtype
        if cached:
            n_vis, n_txt = self._suffix_sizes()

        def eval_fn(trainable, params, static, all_images_u8, all_targets,
                    idx_mat, valid_mat, txt_cache=None):
            ad = adora.assemble(trainable, static)

            def body(total, xs):
                idx, valid = xs
                if cached:
                    preds = vclip.clip_hba_suffix_forward(
                        params, all_images_u8[idx], txt_cache[0],
                        txt_cache[1], cfg, n_vis_suffix=n_vis,
                        n_txt_suffix=n_txt, adapters=ad, adapter_cfg=acfg,
                        deterministic=True)
                else:
                    images = dthings.normalize_uint8(all_images_u8[idx])
                    preds = vclip.clip_hba_forward(
                        params, images, prompts, cfg,
                        adapters=ad, adapter_cfg=acfg,
                        deterministic=True,
                        compute_dtype=cdt,
                        seq_shard=self.seq_shard,
                        ring_attn=self.sp_ring)
                row_mse = jnp.mean((preds - all_targets[idx]) ** 2, axis=-1)
                return total + jnp.sum(row_mse * valid), None

            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    (idx_mat, valid_mat))
            return total

        return jax.jit(eval_fn)

    def evaluate_resident(self, trainable, imgs_dev, tgts_dev, n: int,
                          batch_size: int, whole_set: bool = True,
                          cache=None) -> float:
        # Eval has no cross-batch dependence (unlike training, whose batch
        # size is fixed by reference optimizer-update parity), so run the
        # whole set as ONE batch when it fits: zero tail padding, one scan
        # step instead of six, and the [B*S, D] matmuls run at ~150 TF/s vs
        # ~94 at b64 rows (BENCHLOG.md dense-rate table). Wall-time-neutral
        # over this round's sync-bound tunnel (0.50 s either way); strictly
        # fewer dispatches on a directly-attached TPU. The loss is sum/n
        # either way. The cap is in TOKENS so it adapts to image_size/patch
        # (512 ViT-L/14@224 images = ~132k tokens ~= 1 GB of activations at
        # width 1024). whole_set=False makes the explicit batch_size a hard
        # memory bound (the widening would otherwise override it).
        idx_mat, valid_mat = self.eval_idx_mats(n, batch_size, whole_set)
        if cache is not None:
            # `cache` = the eval set's frozen-prefix activations
            # (build_prefix_cache) — the scan runs only the adapted suffix
            total = float(self._eval_scan_cached(
                trainable, self.params, self.static, cache, tgts_dev,
                idx_mat, valid_mat, self.text_prefix_cache))
        else:
            total = float(self._eval_scan(
                trainable, self.params, self.static, imgs_dev, tgts_dev,
                idx_mat, valid_mat))
        return total / n

    def eval_idx_mats(self, n: int, batch_size: int, whole_set: bool = True,
                      vmap_factor: int = 1):
        """The deterministic eval index/valid matrices, widened to one
        whole-set batch under the 132k-token cap above (single source of
        the heuristic — the batched multi-fork eval reuses these).

        `vmap_factor` is the number of forward passes one program dispatch
        materializes concurrently (the batched multi-fork eval vmaps this
        forward over its per-chip fork count): the activation cap is
        per-dispatch, so the token budget divides by it."""
        if whole_set and n * self.cfg.visual.seq_len * vmap_factor <= 132_000:
            batch_size = n
        batch_list = [np.arange(s, min(s + batch_size, n))
                      for s in range(0, n, batch_size)]
        return self._prep_idx_mat(batch_list, batch_size)

    # -- jitted steps -------------------------------------------------------

    def _train_step(self, perturb_type: str):
        """Streaming variant (host batch shipped per step) — used when the
        dataset does not fit in HBM; the resident variant above is the default."""
        if perturb_type not in self._steps:
            core = self._step_core(perturb_type)

            def step(trainable, opt_state, params, static, images_u8,
                     targets, valid, perturb_key, dropout_key):
                images = dthings.normalize_uint8(images_u8)
                return core(trainable, opt_state, params, static, images,
                            targets, valid, perturb_key, dropout_key)

            self._steps[perturb_type] = jax.jit(step, donate_argnums=(0, 1))
        return self._steps[perturb_type]

    @functools.cached_property
    def _eval_step(self):
        cfg, acfg, prompts, cdt = self.cfg, self.acfg, self.prompts, \
            self.compute_dtype

        def step(trainable, params, static, images_u8, targets, valid):
            images = dthings.normalize_uint8(images_u8)
            ad = adora.assemble(trainable, static)
            preds = vclip.clip_hba_forward(params, images, prompts, cfg,
                                           adapters=ad, adapter_cfg=acfg,
                                           deterministic=True,
                                           compute_dtype=cdt,
                                           seq_shard=self.seq_shard,
                                           ring_attn=self.sp_ring)
            # dataset-weighted MSE sum (reference evaluate_model :584-602
            # accumulates loss * batch_size and divides by len(dataset))
            row_mse = jnp.mean((preds - targets) ** 2, axis=-1)
            return jnp.sum(row_mse * valid)

        return jax.jit(step)

    @functools.cached_property
    def _infer_step(self):
        return self._make_infer_step(cached=False)

    @functools.cached_property
    def _infer_step_cached(self):
        return self._make_infer_step(cached=True)

    def _make_infer_step(self, cached: bool):
        cfg, acfg, prompts, cdt = self.cfg, self.acfg, self.prompts, \
            self.compute_dtype
        if cached:
            n_vis, n_txt = self._suffix_sizes()

        def step(trainable, params, static, images_u8, txt_cache=None):
            ad = adora.assemble(trainable, static)
            if cached:
                # images_u8 carries the prefix-activation cache rows
                return vclip.clip_hba_suffix_forward(
                    params, images_u8, txt_cache[0], txt_cache[1], cfg,
                    n_vis_suffix=n_vis, n_txt_suffix=n_txt, adapters=ad,
                    adapter_cfg=acfg, deterministic=True)
            images = dthings.normalize_uint8(images_u8)
            return vclip.clip_hba_forward(params, images, prompts, cfg,
                                          adapters=ad, adapter_cfg=acfg,
                                          deterministic=True,
                                          compute_dtype=cdt,
                                          seq_shard=self.seq_shard,
                                          ring_attn=self.sp_ring)

        return jax.jit(step)

    # -- epoch-level operations --------------------------------------------

    def evaluate(self, trainable, images_u8: np.ndarray, targets: np.ndarray,
                 batch_size: int) -> float:
        # accumulate the per-batch sums ON DEVICE: one host sync for the
        # whole eval set instead of one float() round trip per batch
        total, n = jnp.zeros((), jnp.float32), len(images_u8)
        for s in range(0, n, batch_size):
            bi, bt, valid = self._prep_batch(images_u8[s:s + batch_size],
                                             targets[s:s + batch_size],
                                             pad_to=batch_size)
            total = total + self._eval_step(trainable, self.params,
                                            self.static, bi, bt, valid)
        return float(total) / n

    def infer_in_chunks(self, trainable, imgs_dev, n_real: int,
                        chunk: int = 256, cache=None) -> np.ndarray:
        """Embed a possibly-large resident image set in fixed-size chunks of
        `_infer_step` — bounds activation memory the way eval_idx_mats caps
        the eval scan (a single whole-set forward of an arbitrary-size NOD
        set would OOM HBM at ViT-L activation scale). The chunk width is
        rounded up to the device count and the last chunk padded, so every
        call shares ONE compiled shape.

        `cache` = the set's frozen-prefix activations (build_prefix_cache):
        chunks are sliced from it instead of imgs_dev and only the adapted
        suffix blocks run per chunk."""
        src = cache if cache is not None else imgs_dev
        outs = []
        for part in self._device_chunks(src, chunk):
            if cache is not None:
                outs.append(np.asarray(self._infer_step_cached(
                    trainable, self.params, self.static, part,
                    self.text_prefix_cache)))
            else:
                outs.append(np.asarray(self._infer_step(
                    trainable, self.params, self.static, part)))
        return np.concatenate(outs)[:n_real]

    def behavioral_rsa(self, trainable, inference_images_u8,
                       reference_rdm, cache=None):
        """One device call: 48-image inference + RDM + Spearman (reference
        behavioral_RSA :605-654 runs this on host numpy/scipy).

        Accepts host arrays or device-resident handles (upload the images once
        with upload_dataset to avoid a per-epoch transfer). With `cache`
        (the set's frozen-prefix activations) only the adapted suffix runs."""
        if cache is not None:
            n = cache.shape[0]
            emb = self._infer_step_cached(trainable, self.params, self.static,
                                          cache, self.text_prefix_cache)[:n]
            rho, p, model_rdm = vrsa.behavioral_rsa(
                emb, jnp.asarray(reference_rdm))
            return float(rho), float(p), np.asarray(model_rdm), np.asarray(emb)
        n = len(inference_images_u8)
        if isinstance(inference_images_u8, jax.Array):
            bi = inference_images_u8
        else:
            bi, _, _ = self._prep_batch(inference_images_u8)
        emb = self._infer_step(trainable, self.params, self.static, bi)[:n]
        rho, p, model_rdm = vrsa.behavioral_rsa(emb, jnp.asarray(reference_rdm))
        return float(rho), float(p), np.asarray(model_rdm), np.asarray(emb)


def train_model(trainer: ClipHBATrainer, trainable, opt_state, *,
                train_images, train_targets, test_images, test_targets,
                inference_images, reference_rdm, shuffler: dthings.EpochShuffler,
                epochs: int, batch_size: int, training_res_path: str,
                training_run: int, perturb_length: int, perturb_seed: int,
                perturb_type: str, logger=None, early_stopping_patience: int = 5,
                dora_parameters_path: str = "./dora_params",
                random_state_path: str = "./random_states",
                dropout_seed: int = 0, data_seed: int = 0,
                resume_from_epoch: int = 0,
                previous_training_res_path: str | None = None,
                dump_dir: str | None = None, inference_names=None,
                nod_images=None, nod_names=None, nod_dump_dir=None,
                host_prefetch: bool = False, preempt_guard=None,
                frozen_cache: bool = False):
    """The per-epoch loop (reference train_model :782-1063). Returns the final
    (trainable, opt_state, last_epoch0).

    `preempt_guard` (core/preempt.py) is polled at EPOCH boundaries — a
    CLIP epoch is one whole-epoch scan dispatch (~seconds), so an epoch
    boundary is always inside a preemption notice window; the per-epoch
    artifacts written just above the poll make the stop exactly resumable
    (resume_from_epoch = the stopped epoch). Sets
    `preempt_guard.stopped_at_epoch` when it stops."""
    log = logger.info if logger else print
    best_test_loss = 500000.0  # reference initializes to 500000 (ref :790)
    epochs_no_improve = 0

    os.makedirs(dora_parameters_path, exist_ok=True)
    if dist.is_primary():  # shared-FS file setup: one writer
        csvio.init_clip_csv(training_res_path, resume_from_epoch,
                            previous_training_res_path, logger)

    dropout_root = jax.random.PRNGKey(dropout_seed)
    n_train = len(train_images)
    n_test = len(test_images)
    last_epoch0 = resume_from_epoch - 1

    # datasets live in HBM for the whole run; batches are gathered on device
    train_imgs_dev, train_tgts_dev = trainer.upload_dataset(train_images,
                                                            train_targets)
    test_imgs_dev, test_tgts_dev = trainer.upload_dataset(test_images,
                                                          test_targets)
    inf_imgs_dev, _ = trainer.upload_dataset(inference_images)
    nod_imgs_dev = None
    if nod_images is not None:
        nod_imgs_dev, _ = trainer.upload_dataset(nod_images)

    # frozen-prefix activation caches: the towers below the adapter split are
    # frozen and THINGS has no random augmentation, so each set's prefix
    # activations are computed ONCE here and every train/eval/RSA step below
    # runs only the adapted suffix blocks (see ClipHBATrainer docs; epochs
    # where an image-perturbing kind is ACTIVE fall back to the full tower —
    # those epochs change the tower input)
    train_cache = test_cache = inf_cache = nod_cache = None
    if frozen_cache:
        import time as _time
        t0 = _time.perf_counter()
        train_cache = trainer.build_prefix_cache(train_imgs_dev)
        test_cache = trainer.build_prefix_cache(test_imgs_dev)
        inf_cache = trainer.build_prefix_cache(inf_imgs_dev)
        if nod_imgs_dev is not None:
            nod_cache = trainer.build_prefix_cache(nod_imgs_dev)
        jax.block_until_ready(train_cache)
        nbytes = sum(c.nbytes for c in
                     (train_cache, test_cache, inf_cache)
                     ) + (nod_cache.nbytes if nod_cache is not None else 0)
        log(f"Frozen-prefix cache built in {_time.perf_counter() - t0:.1f}s "
            f"({nbytes / 2**20:.0f} MB HBM); train/eval/RSA steps run only "
            f"the adapted suffix blocks")

    if resume_from_epoch == 0:
        # initial (pre-training) eval + RSA, logged but not written to the CSV
        # (reference baseline pipeline cvpr...baseline.py:623-624)
        init_loss = trainer.evaluate_resident(trainable, test_imgs_dev,
                                              test_tgts_dev, n_test, batch_size,
                                              cache=test_cache)
        init_rho, init_p, _, _ = trainer.behavioral_rsa(trainable, inf_imgs_dev,
                                                        reference_rdm,
                                                        cache=inf_cache)
        log(f"Initial (epoch 0) Validation Loss: {init_loss:.4f}, "
            f"Behavioral RSA: {init_rho:.4f} (p={init_p:.4f})")

    for epoch in range(resume_from_epoch, epochs):
        flags = windows.epoch_flags(epoch, training_run, perturb_length,
                                    perturb_type)
        active = any(flags.values())
        kind = perturb_type if active else "none"
        if active:
            ws, we = windows.window_bounds(training_run, perturb_length)
            log("=" * 80)
            log(f"*** PERTURBATION '{perturb_type}' ACTIVE FOR EPOCH "
                f"{epoch + 1} (window: epochs {ws + 1}-{we + 1}) ***")
            log(f"Perturbation seed: {perturb_seed}")
            log("=" * 80)
            # first-batch injector evidence (the reference's debug-print
            # verification, ref :886-982: stats proving the injector acted)
            first_idx = next(iter(shuffler.batches(epoch)))
            bidx0, valid0 = trainer._prep_idx(first_idx, batch_size)
            img0 = dthings.normalize_uint8(train_imgs_dev[bidx0])
            tgt0 = train_tgts_dev[bidx0]
            pk0 = batch_perturb_key(perturb_seed, training_run, 0)
            pi, pt = injectors.apply_clip_perturbation(
                perturb_type, pk0, img0, tgt0,
                distribution=trainer.perturb_distribution,
                mean=trainer.dist_mean, std=trainer.dist_std, valid=valid0)
            log(f"Batch 0 after injection - images: min={float(pi.min()):.3f} "
                f"max={float(pi.max()):.3f} mean={float(pi.mean()):.3f}; "
                f"targets: min={float(pt.min()):.3f} "
                f"max={float(pt.max()):.3f} mean={float(pt.mean()):.3f}; "
                f"targets changed: "
                f"{not bool(jnp.array_equal(pt, tgt0))}, "
                f"images changed: {not bool(jnp.array_equal(pi, img0))}")

        from ..core.profiling import EpochTimer
        timer = EpochTimer()
        batch_list = list(shuffler.batches(epoch))
        sizes = np.array([len(b) for b in batch_list])
        dropout_epoch_key = jax.random.fold_in(dropout_root, epoch)
        # whole epoch as ONE compiled scan (see _epoch_scan); with a data
        # mesh the idx/valid matrices arrive sharded P(None, 'data') so the
        # scanned program is itself data-parallel, and on a multi-host pod
        # _prep_idx_mat assembles each process's column block (driven against
        # a per-step oracle by examples/multihost_cpu_demo.py section 5).
        idx_mat, valid_mat = trainer._prep_idx_mat(batch_list, batch_size)
        # image-perturbing kinds replace the tower INPUT while active, so
        # those epochs run the full tower; target-only kinds (and clean
        # epochs) train from the prefix cache
        use_cache = frozen_cache and kind not in injectors.IMAGE_KINDS
        epoch_fn = trainer._epoch_scan(kind, cached=use_cache)
        base_pkey = perturb_base_key(perturb_seed, training_run)
        if use_cache:
            trainable, opt_state, losses, oks = epoch_fn(
                trainable, opt_state, trainer.params, trainer.static,
                train_cache, train_tgts_dev, idx_mat,
                valid_mat, dropout_epoch_key, base_pkey,
                trainer.text_prefix_cache)
        else:
            trainable, opt_state, losses, oks = epoch_fn(
                trainable, opt_state, trainer.params, trainer.static,
                train_imgs_dev, train_tgts_dev, idx_mat,
                valid_mat, dropout_epoch_key, base_pkey)
        if host_prefetch and dist.is_primary():
            # start the checkpoint trees' d2h now so it overlaps the
            # eval/RSA dispatches below (core/hostcopy.py; opt-in until
            # measured on the chip)
            hostcopy.prefetch_to_host(trainable, opt_state)
        losses = np.asarray(losses)
        oks = np.asarray(oks)
        for bi in np.nonzero(~oks)[0]:
            log(f"WARNING: non-finite batch {bi} skipped "
                f"(epoch {epoch + 1})")
        # mask BEFORE multiplying: a skipped batch's loss is NaN/inf, and
        # NaN * 0 = NaN would poison the sum the ok-mask exists to protect
        total_loss = float(np.sum(np.where(oks, losses, 0.0) * sizes))
        # reference divides by the full dataset size regardless of skips
        avg_train_loss = total_loss / n_train

        train_timing = timer.finish(images=n_train)
        avg_test_loss = trainer.evaluate_resident(
            trainable, test_imgs_dev, test_tgts_dev, n_test, batch_size,
            cache=test_cache)
        log(f"Epoch {epoch + 1}: Training Loss: {avg_train_loss:.4f}, "
            f"Validation Loss: {avg_test_loss:.4f} [{train_timing}]")

        rho, p_value, _, emb = trainer.behavioral_rsa(
            trainable, inf_imgs_dev, reference_rdm, cache=inf_cache)
        log(f"Behavioral RSA Correlation & p-value: {rho:.4f}, {p_value:.4f}")

        nod_emb = None
        if nod_imgs_dev is not None and nod_dump_dir is not None:
            # second per-epoch inference set (the reference runs produced
            # nod_embeddings_epochN.csv dumps; SURVEY.md section 0). The
            # device computation runs on EVERY process (the jit spans the
            # pod mesh — gating it would deadlock the SPMD program); only
            # the file write below is process-0.
            nod_emb = trainer.infer_in_chunks(trainable, nod_imgs_dev,
                                              len(nod_images),
                                              cache=nod_cache)

        # host-side artifacts (CSV rows, pickles, dumps) are written by
        # process 0 only: on a pod every process holds the same replicated
        # state, and P concurrent writers to one shared-FS file would race
        # (the reference is single-process here; its ViT path rank-gates the
        # same way, train_vit_sgd.py:92)
        if dist.is_primary():
            if dump_dir is not None:
                _dump_embeddings(dump_dir, epoch + 1, emb, inference_names,
                                 prefix="things_48")
            if nod_emb is not None:
                _dump_embeddings(nod_dump_dir, epoch + 1, nod_emb, nod_names,
                                 prefix="nod")

            # checkpoints BEFORE the CSV row: a crash between the two then
            # leaves "checkpoint without row" (the epoch is retrained
            # benignly on resume) instead of "row without checkpoint" (a
            # torn tree whose in-place resume cannot find its state)
            clip_ckpt.save_dora_parameters(trainable, dora_parameters_path,
                                           epoch, logger=logger)
            log(f"DoRA parameters saved for epoch {epoch + 1}")
            clip_ckpt.save_random_states(opt_state, epoch, random_state_path,
                                         data_seed,
                                         {"dropout_seed": dropout_seed},
                                         logger=logger)
            csvio.append_clip_row(training_res_path, epoch + 1,
                                  avg_train_loss, avg_test_loss, rho, p_value,
                                  **flags)

        # patience freezes on PURE window arithmetic (reference :1044-1056
        # checks only the epoch range, not whether the type actually
        # injects) — the injection gate itself stays type-checked
        in_win = windows.in_window(epoch, training_run, perturb_length)
        if avg_test_loss < best_test_loss:
            best_test_loss = avg_test_loss
            epochs_no_improve = 0
        elif not in_win:
            # patience frozen inside the perturbation window (ref :1049-1056)
            epochs_no_improve += 1
        last_epoch0 = epoch
        if epochs_no_improve == early_stopping_patience:
            log(f"Early stopping triggered at epoch {epoch + 1}")
            break
        # epoch-boundary preemption poll: collective form so a notice seen
        # by ANY pod host stops all of them in lockstep (every process is at
        # this same loop point). Skipped on the final epoch — the loop is
        # about to exit anyway and flagging a COMPLETED run as preempted
        # would make the CLI exit 143 and orchestration re-queue it.
        if preempt_guard is not None and epoch + 1 < epochs:
            poll = getattr(preempt_guard, "should_stop_collective",
                           preempt_guard.should_stop)
            if poll():
                log(f"Preemption requested - stopped cleanly after epoch "
                    f"{epoch + 1} (its checkpoints are saved; resume with "
                    f"resume_from_epoch={epoch + 1})")
                preempt_guard.stopped_at_epoch = epoch + 1
                break

    return trainable, opt_state, last_epoch0


def _dump_embeddings(dump_dir: str, epoch1: int, emb: np.ndarray, names,
                     prefix: str = "things_48"):
    """Optional per-epoch inference-embedding dumps
    ({prefix}_embeddings_epochN.csv artifacts; SURVEY.md section 0)."""
    import pandas as pd
    os.makedirs(dump_dir, exist_ok=True)
    df = pd.DataFrame(emb)
    if names is not None:
        df.insert(0, "image_name", list(names))
    df.to_csv(os.path.join(dump_dir,
                           f"{prefix}_embeddings_epoch{epoch1}.csv"),
              index=False)


def build_run_assets(cfg: ClipRunConfig, logger):
    """Everything a CLIP-HBA run needs BEFORE any training state exists:
    model params/config, decoded datasets, split indices, inference set +
    reference RDM, tokenized prompts, perturbation stats, and the
    DoRA-surgered (trainable, static) trees.

    Extracted from run_behavioral_training so the batched multi-fork sweep
    (train/multi_fork.py) can pay this setup ONCE for a whole group of forks
    — the assets are identical across sweep runs (same backbone, same
    baseline split, same prompts); only per-fork checkpoints differ.
    Returns a SimpleNamespace; field names match the local variables the
    solo path uses."""
    from types import SimpleNamespace

    # model config first: the datasets decode at the tower's native input
    # resolution (224 for every reference run; converted checkpoints such as
    # ViT-L/14@336px carry their own size in the inferred config)
    if cfg.clip_weights and not os.path.exists(cfg.clip_weights):
        # a mistyped/unmounted weights path must not silently degrade into
        # random towers (which would also skip the HashTokenizer guard and
        # let a multi-hour run produce scientifically void RSA)
        raise FileNotFoundError(
            f"clip_weights path does not exist: {cfg.clip_weights}")
    loaded_pretrained = bool(cfg.clip_weights)
    if loaded_pretrained:
        from ..models import convert
        sd = convert.load_torch_state_dict(cfg.clip_weights)
        params, clip_cfg = convert.clip_params_from_state_dict(sd)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        logger.info(f"Loaded CLIP weights from {cfg.clip_weights}")
    else:
        if cfg.backbone not in vclip.CLIP_CONFIGS:
            raise ValueError(
                f"unsupported backbone {cfg.backbone!r}; supported: "
                f"{sorted(vclip.CLIP_CONFIGS)}")
        clip_cfg = vclip.CLIP_CONFIGS[cfg.backbone]
        params = vclip.init_clip_params(
            jax.random.PRNGKey(cfg.random_seed), clip_cfg)
        logger.info("WARNING: no clip_weights provided - using random "
                    "initialization (testing only)")
    from ..models.resnet import ResNetConfig
    if isinstance(clip_cfg.visual, ResNetConfig):
        # The DoRA fine-tuning pipeline is ViT-only BY REFERENCE SEMANTICS:
        # every shipped pipeline applies DoRA to visual.transformer.resblocks
        # (new_cvpr…pipeline.py:491-496, cvpr_…_baseline.py:776), which an RN
        # tower does not have — the reference's own RN50 default crashes
        # there. RN towers are fully supported for conversion, forward/eval,
        # serving (cli.serve), and the finetune unfreezer splits
        # (adapters/finetune.py); fail loudly here instead of deep inside
        # the adapter surgery.
        raise ValueError(
            f"backbone {cfg.backbone!r} resolves to a ModifiedResNet visual "
            "tower; the CLIP-HBA DoRA training pipeline is ViT-only (so is "
            "the reference's — apply_dora_to_ViT targets "
            "visual.transformer.resblocks). Use cli.serve / encode paths "
            "for RN towers.")

    # dataset + perturbation distribution stats (ref :1096-1105)
    dataset = dthings.ThingsDataset(cfg.csv_file, cfg.img_dir,
                                    size=clip_cfg.visual.image_size)
    mean, std = injectors.perturb_distribution_stats(
        dataset.targets, cfg.perturb_distribution)

    # split: replay the baseline split if provided, else fresh + persist
    if cfg.baseline_split_indices_path and \
            os.path.exists(cfg.baseline_split_indices_path):
        info = dthings.load_split_indices(cfg.baseline_split_indices_path,
                                          logger)
        train_idx = info["train_indices"]
        test_idx = info["test_indices"]
        logger.info("Using baseline dataset split")
    else:
        train_idx, test_idx = dthings.random_split_indices(
            len(dataset), cfg.train_portion, cfg.random_seed)
        split_path = os.path.join(cfg.random_state_path,
                                  "dataset_split_indices.pth")
        # every process derives the identical split from the seed; one writer
        if dist.is_primary():
            dthings.save_split_indices(split_path, train_idx, test_idx,
                                       cfg.random_seed)
            logger.info(f"Saved fresh dataset split to {split_path}")

    inference = dthings.ThingsInferenceDataset(
        cfg.inference_csv_file, cfg.img_dir, cfg.RDM48_triplet_dir,
        size=clip_cfg.visual.image_size)
    reference_rdm = inference.load_reference_rdm()

    # (the reference's pos_embedding=False case is RN50-only, which the
    # ResNet guard above rejects from this DoRA pipeline — ViT towers always
    # use it, so the knob is not plumbed through ClipHBATrainer; the serving
    # engine plumbs it for RN towers, serve/engine.py clip_hba_engine)

    tok = vtok.default_tokenizer(cfg.bpe_vocab)
    if loaded_pretrained and isinstance(tok, vtok.HashTokenizer):
        # Guardrail: hash-tokenized prompts are meaningless to a pretrained
        # text tower and would silently destroy behavioral RSA (the [B,66]
        # scores come from prompt/image cosine similarity, ref
        # new_cvpr…pipeline.py:287-304). A warning in a 118-epoch log is easy
        # to miss, so this is a hard error with an explicit escape hatch.
        msg = (
            "Pretrained CLIP weights loaded but no BPE vocab found — the "
            "HashTokenizer fallback would feed the 66 SPoSE prompts to the "
            "pretrained text tower in the wrong token space and behavioral "
            "RSA would be near zero. Pass bpe_vocab=<path to "
            "bpe_simple_vocab_16e6.txt.gz> or set CLIP_BPE_PATH (see "
            "examples/validate_pretrained.py); set allow_hash_tokenizer=True "
            "to proceed anyway (testing only).")
        if not cfg.allow_hash_tokenizer:
            logger.error(msg)
            raise ValueError(msg)
        logger.warning("allow_hash_tokenizer=True: " + msg)
    # BPE prompts keep clip.tokenize's loud over-length failure; hash tokens
    # are meaningless placeholders (tiny-context test configs), so truncating
    # them loses nothing and keeps small fixtures runnable.
    prompts = vtok.tokenize(classnames66, tokenizer=tok,
                            context_length=clip_cfg.text.context_length,
                            truncate=isinstance(tok, vtok.HashTokenizer))
    prompts = np.minimum(prompts, clip_cfg.text.vocab_size - 1)

    # DoRA surgery (ref :1147-1152) — the init key is derived from random_seed so
    # a fresh sweep-fork model reproduces the baseline's adapter init
    spec = adora.dora_spec(clip_cfg.visual.layers, clip_cfg.text.layers,
                           cfg.vision_layers, cfg.transformer_layers)
    trainable, static, acfg = adora.apply_dora(
        params, spec, r=cfg.rank, alpha=cfg.dora_alpha,
        dropout=cfg.dora_dropout, key=jax.random.PRNGKey(cfg.random_seed + 123))

    return SimpleNamespace(
        loaded_pretrained=loaded_pretrained, params=params, clip_cfg=clip_cfg,
        dataset=dataset, mean=mean, std=std, train_idx=train_idx,
        test_idx=test_idx, inference=inference, reference_rdm=reference_rdm,
        prompts=prompts, spec=spec, trainable=trainable, static=static,
        acfg=acfg)


def run_behavioral_training(config, preempt_guard=None) -> dict:
    """Config-dict entry point (reference run_behavioral_training :1066-1227).

    Accepts the reference's dict config surface or a ClipRunConfig. Returns a
    summary dict {last_epoch0, training_res_path, preempted, ...}.

    With cfg.preempt_save (default) a SIGTERM stops the run cleanly at the
    next epoch boundary and the summary carries `preempted=True` — CLIs
    translate that into exit 143 so orchestration re-queues instead of
    treating the run as finished. `preempt_guard` injects a prebuilt guard
    (the sweep driver shares one across runs; tests use stubs).
    """
    cfg = (config if isinstance(config, ClipRunConfig)
           else ClipRunConfig.from_dict(config))

    log_dir = os.path.dirname(cfg.checkpoint_path) or "."
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    logger = setup_logger(os.path.join(log_dir,
                                       f"training_log_{timestamp}.txt"))
    logger.info("=" * 80)
    logger.info("Starting Training Run")
    logger.info("=" * 80)

    a = build_run_assets(cfg, logger)
    params, clip_cfg, dataset = a.params, a.clip_cfg, a.dataset
    mean, std = a.mean, a.std
    train_idx, test_idx = a.train_idx, a.test_idx
    inference, reference_rdm, prompts = a.inference, a.reference_rdm, a.prompts
    spec, trainable, static, acfg = a.spec, a.trainable, a.static, a.acfg

    training_run = cfg.training_run

    # DoRA checkpoint to fork from (ref :1156-1171)
    dora_path = None
    if cfg.resume_from_epoch > 0 and cfg.resume_dora_parameters_path:
        dora_path = os.path.join(cfg.resume_dora_parameters_path,
                                 f"epoch{cfg.resume_from_epoch}_dora_params.pth")
    elif cfg.baseline_dora_directory:
        dora_path = os.path.join(cfg.baseline_dora_directory,
                                 f"epoch{training_run - 1}_dora_params.pth")
    # The reference gates the load on training_run >= 1 only
    # (new_cvpr...pipeline.py:1166) — which silently skips an EXPLICIT
    # in-place resume of a baseline run (training_run == 0, e.g.
    # cli.lengths --perturb_type baseline after a crash): the run would
    # continue the same CSV with a fresh adapter. An explicit resume
    # source must always load (SURVEY §0-style defect fix; fork
    # semantics at training_run >= 1 are unchanged).
    explicit_resume = (cfg.resume_from_epoch > 0
                       and bool(cfg.resume_dora_parameters_path))
    if dora_path and os.path.exists(dora_path) and (training_run >= 1
                                                    or explicit_resume):
        trainable = clip_ckpt.load_dora_parameters(dora_path, trainable, spec,
                                                   logger)
        logger.info(f"Loaded DoRA parameters from {dora_path}")
    else:
        if explicit_resume and dora_path:
            # pointing a strict resume at a missing checkpoint must not
            # silently restart the adapter mid-CSV (the resume drivers
            # anchor on existing files; anything else is caller error)
            raise FileNotFoundError(
                f"resume_from_epoch={cfg.resume_from_epoch} requested but "
                f"the DoRA checkpoint does not exist: {dora_path}")
        logger.info("Using original DoRA parameters from model initialization")

    # data-parallel over all local devices when more than one is present —
    # the reference's cuda==-1 DataParallel path (ref :1174-1176). sp_devices
    # > 1 carves a 'model' axis out of them for visual-tower sequence
    # parallelism (gather form, or ring with sp_ring).
    mesh = None
    sp = cfg.sp_devices > 1
    if sp:
        from ..parallel import mesh as vmesh
        if jax.device_count() % cfg.sp_devices != 0:
            raise ValueError(f"sp_devices ({cfg.sp_devices}) must divide the "
                             f"device count ({jax.device_count()})")
        mesh = vmesh.make_mesh(n_data=jax.device_count() // cfg.sp_devices,
                               n_model=cfg.sp_devices)
        logger.info(f"Using {mesh.shape['data']}x{cfg.sp_devices} "
                    f"(data x sequence) mesh"
                    + (" with ring attention" if cfg.sp_ring else ""))
    elif jax.device_count() > 1:
        from ..parallel import mesh as vmesh
        mesh = vmesh.make_mesh()
        logger.info(f"Using {mesh.devices.size} devices (data-parallel mesh)")

    trainer = ClipHBATrainer(
        clip_cfg, params, acfg, static, prompts, lr=cfg.lr,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32,
        perturb_distribution=cfg.perturb_distribution,
        dist_mean=mean, dist_std=std, mesh=mesh, remat=cfg.remat,
        sp=sp, sp_ring=cfg.sp_ring)
    trainable = trainer.prepare_state(trainable)
    opt_state = trainer.init_opt_state(trainable)

    # random-state restore (ref :1184-1201)
    data_seed = cfg.random_seed
    if cfg.resume_from_epoch > 0:
        prior = cfg.resume_random_state_path or cfg.baseline_random_state_path
        if prior:
            state = clip_ckpt.load_random_states(prior, cfg.resume_from_epoch,
                                                 logger)
            if state is not None:
                restored = jax.tree_util.tree_map(jnp.asarray,
                                                  state["optimizer_state"])
                fresh_struct = jax.tree_util.tree_structure(opt_state)
                if jax.tree_util.tree_structure(restored) == fresh_struct:
                    opt_state = trainer.prepare_state(restored)
                else:
                    logger.warning(
                        "Restored optimizer state does not match this run's "
                        "adapter config (vision_layers/transformer_layers/"
                        "rank differ from the checkpoint's) - keeping a fresh "
                        "optimizer state")
                data_seed = state["data_seed"]
                logger.info(f"Successfully restored all random states from "
                            f"epoch {cfg.resume_from_epoch}")
            else:
                logger.warning("Could not load random states - starting with "
                               "fresh random state")
        else:
            logger.warning("baseline_random_state_path not provided in config, "
                           "cannot restore random states")

    logger.info("\nModel Configuration:")
    logger.info("-------------------")
    for k, v in cfg.to_dict().items():
        logger.info(f"{k}: {v}")
    logger.info(f"\nNumber of trainable parameters: "
                f"{adora.count_trainable_parameters(trainable)}\n")

    train_images = dataset.images_u8[train_idx]
    train_targets = dataset.targets[train_idx]
    test_images = dataset.images_u8[test_idx]
    test_targets = dataset.targets[test_idx]
    shuffler = dthings.EpochShuffler(len(train_idx), cfg.batch_size, data_seed)

    dump_dir = cfg.inference_dump_dir if cfg.dump_inference_embeddings else None

    nod_images = nod_names = None
    if cfg.nod_csv_file and os.path.exists(cfg.nod_csv_file):
        import pandas as pd
        nod_ann = pd.read_csv(cfg.nod_csv_file)
        col = "image_name" if "image_name" in nod_ann.columns else \
            nod_ann.columns[0]
        nod_names = nod_ann[col].tolist()
        nod_images = dthings.decode_images(
            cfg.nod_img_dir or cfg.img_dir, nod_names,
            clip_cfg.visual.image_size)
        logger.info(f"Loaded NOD inference set: {len(nod_names)} images")

    guard = preempt_guard
    own_guard = False
    if guard is None and getattr(cfg, "preempt_save", True):
        from ..core.preempt import PreemptionGuard
        guard = PreemptionGuard()
        own_guard = True  # install/restore signal handlers only for a
        #                   guard this run owns (injected guards may be
        #                   shared across sweep runs or be test stubs)
    import contextlib
    guard_cm = guard if own_guard else contextlib.nullcontext()
    with guard_cm:
        trainable, opt_state, last_epoch0 = train_model(
            trainer, trainable, opt_state, preempt_guard=guard,
            train_images=train_images, train_targets=train_targets,
            test_images=test_images, test_targets=test_targets,
            inference_images=inference.images_u8, reference_rdm=reference_rdm,
            shuffler=shuffler, epochs=cfg.epochs, batch_size=cfg.batch_size,
            training_res_path=cfg.training_res_path, training_run=training_run,
            perturb_length=cfg.perturb_length, perturb_seed=cfg.perturb_seed,
            perturb_type=cfg.perturb_type, logger=logger,
            early_stopping_patience=cfg.early_stopping_patience,
            dora_parameters_path=cfg.dora_parameters_path,
            random_state_path=cfg.random_state_path,
            dropout_seed=cfg.random_seed, data_seed=data_seed,
            resume_from_epoch=cfg.resume_from_epoch,
            previous_training_res_path=cfg.previous_training_res_path,
            dump_dir=dump_dir, inference_names=inference.names,
            nod_images=nod_images, nod_names=nod_names,
            nod_dump_dir=cfg.nod_dump_dir, host_prefetch=cfg.host_prefetch,
            frozen_cache=cfg.frozen_cache)

    if cfg.nod_dump_dir and nod_names is not None \
            and dist.is_primary():  # reads proc-0's dumps; one writer
        # per-epoch category-RDM archive (the reference runs shipped
        # hba_nod_category_rdms_dict.npz with no producing script —
        # SURVEY.md section 0; schema defined in analysis/category_rdms.py)
        from ..analysis import category_rdms
        arc = category_rdms.save_category_rdms(
            cfg.nod_dump_dir,
            os.path.join(os.path.dirname(cfg.nod_dump_dir.rstrip("/")) or ".",
                         "hba_nod_category_rdms_dict.npz"))
        if arc:
            logger.info(f"Wrote NOD category-RDM archive: {arc}")

    return {"last_epoch0": last_epoch0,
            "training_res_path": cfg.training_res_path,
            "trainable": trainable,
            "preempted": bool(getattr(guard, "stopped_at_epoch", None)
                              if guard is not None else False)}
