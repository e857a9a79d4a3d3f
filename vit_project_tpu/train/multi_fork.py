"""Batched multi-fork sweep training: R independent sweep forks in ONE
compiled program.

The reference's single-epoch sweep (clip_train_behavior_sweep.py) trains its
98 forks strictly sequentially — each fork is a full process-level run at
batch 64, which leaves most of a TPU chip idle (ViT-L/14 b64 is far below the
MXU's saturation batch) and pays model init + dataset upload + compile once
per fork. On a TPU the forks are a *batch dimension*:

- every fork shares the frozen CLIP towers, the decoded THINGS dataset, the
  baseline split, and the prompt tokens — only the (tiny) DoRA trees, AdamW
  states, index matrices, and PRNG keys differ;
- `jax.vmap` over the fork axis turns the per-fork dense layers into one
  [R*B*S, D] matmul against shared weights (XLA collapses the batched matmul
  when the weights are unmapped) — exactly the MXU-utilization recovery the
  b64 shape leaves on the table;
- sweep forks all use `perturb_length == 1` and perturb exactly their first
  trained epoch (window [run-1, run-1], perturb/windows.py), so in RELATIVE
  time every fork runs the same program: step t=0 is the perturbed epoch,
  t>=1 are clean epochs. Lock-stepping forks on relative epoch t therefore
  needs exactly two compiled epoch programs, identical to the solo path's.

Artifacts are written per fork in the exact solo/reference layout
(training_run{N}/training_res_run{N}.csv, per-epoch DoRA + random-state
checkpoints), so the fig2/fig3 readers parse a batched sweep tree unchanged.
Numerics: each fork computes the same math as its solo run; bf16 reduction
order inside the batched matmuls may differ from the solo program's, so
trajectories match to float tolerance, not bit-exactly (the equivalence test
pins this down in float32).

Early stopping is per fork (patience frozen during the t=0 window, reference
:1043-1056): a stopped fork keeps riding the batched program (its updates are
discarded) until the whole group finishes; groups are built from the
training order sorted ascending so co-grouped forks have similar remaining
spans and the ride-along waste stays small.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..adapters import dora as adora
from ..ckpt import clip_ckpt
from ..core import csvio
from ..core.configs import ClipRunConfig
from ..core.prng import batch_perturb_key
from ..data import things as dthings
from ..models import clip as vclip
from ..ops import rsa as vrsa
from ..perturb import injectors, windows
from .clip_loop import ClipHBATrainer, build_run_assets


def _stack(trees):
    """Stack a list of identically-structured pytrees along a new axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _pad_forks(tree, r_pad: int):
    """Repeat the last fork slice r_pad times so the fork axis divides the
    mesh. Padded rows are pure compute ballast: they train on duplicated
    state, and the host loop never reads them back."""
    if r_pad == 0:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jnp.concatenate(
            [x, jnp.repeat(x[-1:], r_pad, axis=0)], axis=0), tree)


def _shard_forks(mesh, tree):
    """Partition the fork axis (axis 0 of every leaf) over the mesh's 'data'
    axis. The forks are embarrassingly parallel — the vmapped programs have
    no cross-fork contractions — so GSPMD partitions every batched matmul
    block-diagonally and inserts ZERO collectives; fork parallelism rides the
    mesh the way --workers rides processes, but inside one program."""
    if mesh is None:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec
    s = NamedSharding(mesh, PartitionSpec("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def _slice_fork(tree, i: int):
    """Fork i's slice of a stacked pytree (host copy for checkpointing)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x[i]), tree)


def _build_batched_programs(trainer: ClipHBATrainer, perturb_type: str):
    """The three vmapped-over-forks jitted programs: perturbed epoch, clean
    epoch, eval+RSA. Mirrors ClipHBATrainer._epoch_scan / _eval_scan /
    _infer_step with a leading fork axis on (trainable, opt_state, idx/valid
    matrices, keys); params/static/datasets are unmapped so XLA sees shared
    weights (in_axes=None, passed as explicit jit args — never closures)."""
    cfg, acfg, prompts = trainer.cfg, trainer.acfg, trainer.prompts
    cdt, rm = trainer.compute_dtype, trainer.remat

    def epoch_for(kind: str):
        core = trainer._step_core(kind)

        def one_fork(trainable, opt_state, params, static, all_images_u8,
                     all_targets, idx_mat, valid_mat, dropout_epoch_key,
                     base_pkey):
            def body(carry, xs):
                trainable, opt_state = carry
                batch_i, idx, valid = xs
                pkey = jax.random.fold_in(base_pkey, batch_i)
                dkey = jax.random.fold_in(dropout_epoch_key, batch_i)
                images = dthings.normalize_uint8(all_images_u8[idx])
                trainable, opt_state, loss, ok = core(
                    trainable, opt_state, params, static, images,
                    all_targets[idx], valid, pkey, dkey)
                return (trainable, opt_state), (loss, ok)

            n_b = idx_mat.shape[0]
            (trainable, opt_state), (losses, oks) = jax.lax.scan(
                body, (trainable, opt_state),
                (jnp.arange(n_b), idx_mat, valid_mat))
            return trainable, opt_state, losses, oks

        return jax.jit(
            jax.vmap(one_fork,
                     in_axes=(0, 0, None, None, None, None, 0, 0, 0, 0)),
            donate_argnums=(0, 1))

    def eval_one(trainable, params, static, all_images_u8, all_targets,
                 idx_mat, valid_mat):
        ad = adora.assemble(trainable, static)

        def body(total, xs):
            idx, valid = xs
            images = dthings.normalize_uint8(all_images_u8[idx])
            preds = vclip.clip_hba_forward(params, images, prompts, cfg,
                                           adapters=ad, adapter_cfg=acfg,
                                           deterministic=True,
                                           compute_dtype=cdt)
            row_mse = jnp.mean((preds - all_targets[idx]) ** 2, axis=-1)
            return total + jnp.sum(row_mse * valid), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                (idx_mat, valid_mat))
        return total

    def rsa_one(trainable, params, static, inf_images_u8, reference_rdm):
        ad = adora.assemble(trainable, static)
        images = dthings.normalize_uint8(inf_images_u8)
        emb = vclip.clip_hba_forward(params, images, prompts, cfg,
                                     adapters=ad, adapter_cfg=acfg,
                                     deterministic=True, compute_dtype=cdt)
        rho, p, _ = vrsa.behavioral_rsa(emb, reference_rdm)
        return rho, p

    return {
        "perturbed": epoch_for(perturb_type),
        "clean": epoch_for("none"),
        "eval": jax.jit(jax.vmap(
            eval_one, in_axes=(0, None, None, None, None, None, None))),
        "rsa": jax.jit(jax.vmap(
            rsa_one, in_axes=(0, None, None, None, None))),
    }


class _ForkState:
    """Host-side per-fork bookkeeping (paths, early-stop counters)."""

    def __init__(self, run: int, run_dir: str):
        self.run = run                      # 1-indexed fork/perturb epoch N
        self.start_epoch0 = run - 1         # first trained epoch, 0-indexed
        self.dir = run_dir
        self.res_path = os.path.join(run_dir, f"training_res_run{run}.csv")
        self.dora_path = os.path.join(run_dir, f"dora_params_run{run}")
        self.state_path = os.path.join(run_dir, f"random_states_run{run}")
        self.best_test_loss = 500000.0      # reference init (ref :790)
        self.no_improve = 0
        self.stopped = False

    def epoch0_at(self, t: int) -> int:
        return self.start_epoch0 + t


def run_batched_sweep(base_config: dict, training_order: list[int], *,
                      group_size: int = 8, logger=None,
                      mesh=None) -> list[int]:
    """Train the sweep's forks in vmapped groups of `group_size`.

    `base_config` is the sweep CLI's per-run config template WITHOUT the
    run-specific paths (they are derived here, reference layout
    `{output_base_directory}/training_run{N}/...`). Returns the list of
    failed runs, like the sequential driver loop.

    `mesh`: optional 1-D ('data',) device mesh; the FORK axis is then
    sharded over it — each chip trains group_size/n_devices forks of the
    same compiled program with no collectives (see _shard_forks). Groups
    whose fork count does not divide the mesh are padded with ballast
    copies of the last fork."""
    log = logger.info if logger else print
    cfg = ClipRunConfig.from_dict({
        **base_config, "training_run": 0,
        "checkpoint_path": os.path.join(
            base_config["output_base_directory"], "unused.ckpt"),
        "training_res_path": "unused.csv",
        "dora_parameters_path": "unused",
        "random_state_path": os.path.join(
            base_config["output_base_directory"], "random_states_unused"),
    })
    if cfg.perturb_length != 1:
        raise ValueError(
            "batched fork mode requires perturb_length == 1 (the sweep's "
            "contract; forks then align on relative epochs — see module "
            "docstring). Use the sequential driver for longer windows.")

    assets = build_run_assets(cfg, logger or _PrintLogger())
    trainer = ClipHBATrainer(
        assets.clip_cfg, assets.params, assets.acfg, assets.static,
        assets.prompts, lr=cfg.lr,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32,
        perturb_distribution=cfg.perturb_distribution,
        dist_mean=assets.mean, dist_std=assets.std, mesh=None,
        remat=cfg.remat)

    train_images = assets.dataset.images_u8[assets.train_idx]
    train_targets = assets.dataset.targets[assets.train_idx]
    test_images = assets.dataset.images_u8[assets.test_idx]
    test_targets = assets.dataset.targets[assets.test_idx]
    train_imgs_dev, train_tgts_dev = trainer.upload_dataset(train_images,
                                                            train_targets)
    test_imgs_dev, test_tgts_dev = trainer.upload_dataset(test_images,
                                                          test_targets)
    inf_imgs_dev, _ = trainer.upload_dataset(assets.inference.images_u8)
    rdm_dev = jnp.asarray(assets.reference_rdm)
    n_train, n_test = len(train_images), len(test_images)

    programs = _build_batched_programs(trainer, cfg.perturb_type)

    # eval batches are deterministic (arange); same matrices for every fork
    eval_bs = n_test if n_test * trainer.cfg.visual.seq_len <= 132_000 \
        else cfg.batch_size
    eval_batches = [np.arange(s, min(s + eval_bs, n_test))
                    for s in range(0, n_test, eval_bs)]
    eval_idx, eval_valid = trainer._prep_idx_mat(eval_batches, eval_bs)

    # ascending groups: co-grouped forks have similar remaining spans, so the
    # ride-along waste after a fork finishes is bounded by the group's spread
    order = sorted(training_order)
    groups = [order[i:i + group_size]
              for i in range(0, len(order), group_size)]
    log(f"Batched sweep: {len(order)} forks in {len(groups)} group(s) of "
        f"<= {group_size} (one vmapped program per group)")

    if mesh is not None:
        # shared (fork-unmapped) operands must live on the same mesh as the
        # fork-sharded state: replicate them once
        from ..parallel import mesh as vmesh
        (trainer.params, trainer.static, train_imgs_dev, train_tgts_dev,
         test_imgs_dev, test_tgts_dev, inf_imgs_dev, rdm_dev, eval_idx,
         eval_valid) = vmesh.replicate(
            mesh, (trainer.params, trainer.static, train_imgs_dev,
                   train_tgts_dev, test_imgs_dev, test_tgts_dev, inf_imgs_dev,
                   rdm_dev, jnp.asarray(eval_idx), jnp.asarray(eval_valid)))
        log(f"Fork axis sharded over {mesh.devices.size} devices "
            f"(zero-collective fork parallelism)")

    failed: list[int] = []
    for gi, runs in enumerate(groups):
        try:
            _run_group(trainer, programs, cfg, runs, base_config, assets,
                       train_imgs_dev, train_tgts_dev, test_imgs_dev,
                       test_tgts_dev, inf_imgs_dev, rdm_dev, eval_idx,
                       eval_valid, n_train, n_test, log, mesh=mesh)
            log(f"Group {gi + 1}/{len(groups)} (runs {runs}) completed")
        except Exception as e:
            log(f"Group {gi + 1}/{len(groups)} (runs {runs}) FAILED: {e}")
            failed.extend(runs)
    return failed


class _PrintLogger:
    def info(self, msg):
        print(msg)

    warning = error = info


def _load_fork(cfg: ClipRunConfig, run: int, trainer: ClipHBATrainer,
               assets, log):
    """One fork's initial (trainable, opt_state, data_seed) — the solo fork
    semantics of run_behavioral_training: strict=False DoRA overlay from the
    baseline's epoch run-1 file (fresh init if absent, ref :1156-1171) and
    AdamW-state/data-seed restore from the baseline's random states."""
    trainable = assets.trainable
    dora_path = os.path.join(cfg.baseline_dora_directory,
                             f"epoch{run - 1}_dora_params.pth")
    if run >= 1 and os.path.exists(dora_path):
        trainable = clip_ckpt.load_dora_parameters(dora_path, trainable,
                                                   assets.spec)
        log(f"  run {run}: DoRA fork loaded from {dora_path}")
    else:
        log(f"  run {run}: fresh DoRA init (no {dora_path})")

    opt_state = trainer.init_opt_state(trainable)
    data_seed = cfg.random_seed
    if run - 1 > 0 and cfg.baseline_random_state_path:
        state = clip_ckpt.load_random_states(
            cfg.baseline_random_state_path, run - 1, logger=None)
        if state is not None:
            restored = jax.tree_util.tree_map(jnp.asarray,
                                              state["optimizer_state"])
            if (jax.tree_util.tree_structure(restored)
                    == jax.tree_util.tree_structure(opt_state)):
                opt_state = restored
            else:
                log(f"  run {run}: optimizer-state structure mismatch - "
                    f"fresh AdamW state")
            data_seed = state["data_seed"]
    return trainable, opt_state, data_seed


def _run_group(trainer, programs, cfg: ClipRunConfig, runs: list[int],
               base_config: dict, assets, train_imgs_dev, train_tgts_dev,
               test_imgs_dev, test_tgts_dev, inf_imgs_dev, rdm_dev,
               eval_idx, eval_valid, n_train: int, n_test: int, log,
               mesh=None):
    out_base = base_config["output_base_directory"]
    forks: list[_ForkState] = []
    trainables, opts, seeds = [], [], []
    for run in runs:
        run_dir = os.path.join(out_base, f"training_run{run}")
        os.makedirs(run_dir, exist_ok=True)
        fs = _ForkState(run, run_dir)
        csvio.init_clip_csv(fs.res_path, fs.start_epoch0, None, None)
        t, o, s = _load_fork(cfg, run, trainer, assets, log)
        forks.append(fs)
        trainables.append(t)
        opts.append(o)
        seeds.append(int(s))

    R = len(forks)
    r_pad = 0 if mesh is None else (-R) % mesh.devices.size
    trainable = _shard_forks(mesh, _pad_forks(_stack(trainables), r_pad))
    opt_state = _shard_forks(mesh, _pad_forks(_stack(opts), r_pad))
    shufflers = [dthings.EpochShuffler(n_train, cfg.batch_size, s)
                 for s in seeds]
    n_b = shufflers[0].num_batches()
    sizes = None  # per-epoch per-fork batch sizes, set below
    dropout_root = jax.random.PRNGKey(cfg.random_seed)
    base_pkeys = _shard_forks(mesh, _pad_forks(jnp.stack([
        jax.random.PRNGKey(int(cfg.perturb_seed) + run * 1000)
        for run in runs]), r_pad))

    # relative-time lock step: t=0 is every fork's perturbed epoch
    t = 0
    while not all(f.stopped or f.epoch0_at(t) >= cfg.epochs for f in forks):
        idx_mats, valid_mats, dkeys, size_rows = [], [], [], []
        for f, sh in zip(forks, shufflers):
            e0 = min(f.epoch0_at(t), cfg.epochs - 1)  # riders reuse last
            batch_list = list(sh.batches(e0))
            im, vm = trainer._prep_idx_mat(batch_list, cfg.batch_size)
            idx_mats.append(im)
            valid_mats.append(vm)
            size_rows.append([len(b) for b in batch_list])
            dkeys.append(jax.random.fold_in(dropout_root, e0))
        idx_mat = _shard_forks(mesh, _pad_forks(jnp.stack(idx_mats), r_pad))
        valid_mat = _shard_forks(mesh,
                                 _pad_forks(jnp.stack(valid_mats), r_pad))
        dkeys = _shard_forks(mesh, _pad_forks(jnp.stack(dkeys), r_pad))
        sizes = np.asarray(size_rows)

        if t == 0:
            _log_injection_evidence(trainer, cfg, forks, idx_mat, valid_mat,
                                    train_imgs_dev, train_tgts_dev, log)

        program = programs["perturbed" if t == 0 else "clean"]
        trainable, opt_state, losses, oks = program(
            trainable, opt_state, trainer.params, trainer.static,
            train_imgs_dev, train_tgts_dev, idx_mat, valid_mat, dkeys,
            base_pkeys)
        losses = np.asarray(losses)          # [R, n_b]
        oks = np.asarray(oks)

        totals = np.asarray(programs["eval"](
            trainable, trainer.params, trainer.static, test_imgs_dev,
            test_tgts_dev, eval_idx, eval_valid))
        rhos, ps = programs["rsa"](trainable, trainer.params,
                                   trainer.static, inf_imgs_dev, rdm_dev)
        rhos, ps = np.asarray(rhos), np.asarray(ps)

        for i, f in enumerate(forks):
            if f.stopped or f.epoch0_at(t) >= cfg.epochs:
                continue
            e0 = f.epoch0_at(t)
            for bi in np.nonzero(~oks[i])[0]:
                log(f"  run {f.run}: WARNING non-finite batch {bi} skipped "
                    f"(epoch {e0 + 1})")
            train_loss = float(np.sum(losses[i] * sizes[i] * oks[i])) / n_train
            test_loss = float(totals[i]) / n_test
            flags = windows.epoch_flags(e0, f.run, cfg.perturb_length,
                                        cfg.perturb_type)
            log(f"  run {f.run} epoch {e0 + 1}: train {train_loss:.4f} "
                f"test {test_loss:.4f} rsa {rhos[i]:.4f} (p={ps[i]:.4f})")
            csvio.append_clip_row(f.res_path, e0 + 1, train_loss, test_loss,
                                  float(rhos[i]), float(ps[i]), **flags)
            fork_trainable = _slice_fork(trainable, i)
            clip_ckpt.save_dora_parameters(fork_trainable, f.dora_path, e0)
            clip_ckpt.save_random_states(
                _slice_fork(opt_state, i), e0, f.state_path, seeds[i],
                {"dropout_seed": cfg.random_seed})

            in_win = (t == 0 and cfg.perturb_type in windows.PERTURB_TYPES)
            if test_loss < f.best_test_loss:
                f.best_test_loss = test_loss
                f.no_improve = 0
            elif not in_win:
                f.no_improve += 1
            if f.no_improve == cfg.early_stopping_patience:
                log(f"  run {f.run}: early stopping at epoch {e0 + 1}")
                f.stopped = True
        t += 1


def _log_injection_evidence(trainer, cfg: ClipRunConfig, forks, idx_mat,
                            valid_mat, train_imgs_dev, train_tgts_dev, log):
    """Per-fork first-batch injector evidence (the reference's debug-print
    verification, ref :886-982) — one small device call per fork."""
    for i, f in enumerate(forks):
        idx0 = idx_mat[i, 0]
        img0 = dthings.normalize_uint8(train_imgs_dev[idx0])
        tgt0 = train_tgts_dev[idx0]
        pk0 = batch_perturb_key(cfg.perturb_seed, f.run, 0)
        pi, pt = injectors.apply_clip_perturbation(
            cfg.perturb_type, pk0, img0, tgt0,
            distribution=trainer.perturb_distribution,
            mean=trainer.dist_mean, std=trainer.dist_std,
            valid=valid_mat[i, 0])
        log(f"  run {f.run} perturbed batch 0: images mean "
            f"{float(pi.mean()):.3f} (was {float(img0.mean()):.3f}), "
            f"targets changed: {not bool(jnp.array_equal(pt, tgt0))}, "
            f"images changed: {not bool(jnp.array_equal(pi, img0))}")
