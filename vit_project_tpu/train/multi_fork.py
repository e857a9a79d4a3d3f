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
- a per-fork `in_win` gate inside the ONE compiled epoch program selects
  perturbed vs clean inputs from each fork's ABSOLUTE window
  ([run-1, run-1+L-1], perturb/windows.py), so forks with different onsets,
  window lengths, and resume points lock-step together with no relative-time
  alignment; the same program serves the single-epoch sweep
  (run_batched_sweep) and the variable-length grid (run_batched_lengths).

Artifacts are written per fork in the exact solo/reference layout
(training_run{N}/training_res_run{N}.csv, per-epoch DoRA + random-state
checkpoints), so the fig2/fig3 readers parse a batched sweep tree unchanged.
Numerics: each fork computes the same math as its solo run; bf16 reduction
order inside the batched matmuls may differ from the solo program's, so
trajectories match to float tolerance, not bit-exactly (the equivalence test
pins this down in float32).

Early stopping is per fork (patience frozen inside each fork's window, reference
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
from ..core import csvio, hostcopy
from ..core.configs import ClipRunConfig
from ..core.prng import batch_perturb_key, perturb_base_key
from ..data import things as dthings
from ..parallel import dist as pdist
from ..models import clip as vclip
from ..ops import rsa as vrsa
from ..perturb import injectors, windows
from .clip_loop import ClipHBATrainer, build_run_assets


def make_fork_mesh(n_requested: int, n_items: int):
    """1-D pod-local mesh for the fork axis, or None for no sharding.

    Clamped to min(requested, this process's addressable chips, items).
    local_devices: on a pod each rank must shard onto its OWN addressable
    chips, not process 0's slice of the global device order. Shared by the
    sweep and lengths CLIs (one home for the pod-local clamp logic)."""
    if n_requested <= 1:
        return None
    from ..parallel import mesh as vmesh
    n = min(n_requested, jax.local_device_count(), n_items)
    return vmesh.make_mesh(n_data=n, devices=jax.local_devices()[:n])


def per_chip_forks(group_size: int, mesh) -> int:
    """Concurrent forward passes one vmapped dispatch materializes PER CHIP:
    the group's forks vmap together, divided over the fork-axis mesh."""
    n_dev = mesh.devices.size if mesh is not None else 1
    return max(1, -(-int(group_size) // int(n_dev)))


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


def _build_batched_programs(trainer: ClipHBATrainer, perturb_type: str,
                            cached: bool = False):
    """The three vmapped-over-forks jitted programs: train epoch (with a
    per-fork `in_win` gate selecting perturbed vs clean inputs — ONE
    compiled program serves every epoch of every window shape), eval, and
    RSA. Mirrors ClipHBATrainer._epoch_scan / _eval_scan / _infer_step with
    a leading fork axis on (trainable, opt_state, idx/valid matrices, keys,
    in_win); params/static/datasets are unmapped so XLA sees shared weights
    (in_axes=None, passed as explicit jit args — never closures).

    cached=True: the frozen-prefix-cache variants (see ClipHBATrainer
    _step_core) — `all_images_u8`/`inf_images_u8` carry prefix-activation
    caches and every program takes a trailing unmapped txt_cache
    (hidden, eot). Only legal for target-only perturbation kinds: the
    per-fork in_win gate mixes perturbed and clean epochs inside ONE
    program, so an image-perturbing kind would need the full tower in
    every epoch anyway (the _Setup gate routes those to the full-tower
    programs)."""
    if getattr(trainer, "seq_shard", None) is not None:
        raise ValueError(
            "batched multi-fork execution does not compose with sequence "
            "parallelism: the fork axis is vmapped/mesh-sharded and the "
            "per-fork token-sharding constraints are not validated under "
            "that batching — run sp forks sequentially or via --workers")
    if cached and perturb_type in injectors.IMAGE_KINDS:
        raise ValueError(
            f"perturb_type={perturb_type!r} replaces the tower input; the "
            "frozen-prefix cache cannot serve its batched programs")
    cfg, acfg, prompts = trainer.cfg, trainer.acfg, trainer.prompts
    cdt, rm = trainer.compute_dtype, trainer.remat
    if cached:
        n_vis, n_txt = trainer._suffix_sizes()

    def _fwd(trainable, params, static, images, txt_cache):
        """Deterministic batch forward — full tower or cached suffix."""
        ad = adora.assemble(trainable, static)
        if cached:
            return vclip.clip_hba_suffix_forward(
                params, images, txt_cache[0], txt_cache[1], cfg,
                n_vis_suffix=n_vis, n_txt_suffix=n_txt, adapters=ad,
                adapter_cfg=acfg, deterministic=True)
        return vclip.clip_hba_forward(params, images, prompts, cfg,
                                      adapters=ad, adapter_cfg=acfg,
                                      deterministic=True, compute_dtype=cdt)

    def _rows(all_images, idx):
        return (all_images[idx] if cached
                else dthings.normalize_uint8(all_images[idx]))

    def make_train():
        core = trainer._step_core(perturb_type, gated=True, cached=cached)

        def one_fork(trainable, opt_state, params, static, all_images_u8,
                     all_targets, idx_mat, valid_mat, dropout_epoch_key,
                     base_pkey, in_win, txt_cache=None):
            def body(carry, xs):
                trainable, opt_state = carry
                batch_i, idx, valid = xs
                pkey = jax.random.fold_in(base_pkey, batch_i)
                dkey = jax.random.fold_in(dropout_epoch_key, batch_i)
                images = _rows(all_images_u8, idx)
                trainable, opt_state, loss, ok = core(
                    trainable, opt_state, params, static, images,
                    all_targets[idx], valid, pkey, dkey, in_win,
                    txt_cache=txt_cache)
                return (trainable, opt_state), (loss, ok)

            n_b = idx_mat.shape[0]
            (trainable, opt_state), (losses, oks) = jax.lax.scan(
                body, (trainable, opt_state),
                (jnp.arange(n_b), idx_mat, valid_mat))
            return trainable, opt_state, losses, oks

        return jax.jit(
            jax.vmap(one_fork,
                     in_axes=(0, 0, None, None, None, None, 0, 0, 0, 0, 0,
                              None)),
            donate_argnums=(0, 1))

    def eval_one(trainable, params, static, all_images_u8, all_targets,
                 idx_mat, valid_mat, txt_cache=None):
        def body(total, xs):
            idx, valid = xs
            preds = _fwd(trainable, params, static, _rows(all_images_u8, idx),
                         txt_cache)
            row_mse = jnp.mean((preds - all_targets[idx]) ** 2, axis=-1)
            return total + jnp.sum(row_mse * valid), None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                (idx_mat, valid_mat))
        return total

    def rsa_one(trainable, params, static, inf_images_u8, reference_rdm,
                txt_cache=None):
        images = (inf_images_u8 if cached
                  else dthings.normalize_uint8(inf_images_u8))
        emb = _fwd(trainable, params, static, images, txt_cache)
        rho, p, _ = vrsa.behavioral_rsa(emb, reference_rdm)
        return rho, p

    return {
        "train": make_train(),
        "eval": jax.jit(jax.vmap(
            eval_one,
            in_axes=(0, None, None, None, None, None, None, None))),
        "rsa": jax.jit(jax.vmap(
            rsa_one, in_axes=(0, None, None, None, None, None))),
    }


class _ForkState:
    """Host-side per-fork bookkeeping (paths, window, early-stop counters).

    `run` is the 1-indexed epoch the fork's perturbation window STARTS at
    (the sweep's training_run N / the lengths grid's onset E) and
    `window_len` its length — absolute window arithmetic (perturb/windows.py)
    then covers sweep forks (len 1), lengths conditions (len L), and
    cross-resumed conditions (start_epoch0 inside/past the window) alike."""

    def __init__(self, run: int, window_len: int, start_epoch0: int,
                 res_path: str, dora_path: str, state_path: str,
                 prepop_csv: str | None = None):
        self.run = run
        self.window_len = window_len
        self.label = str(run)   # reporting unit (lengths sets the dir name)
        self.start_epoch0 = start_epoch0    # first trained epoch, 0-indexed
        self.res_path = res_path
        self.dora_path = dora_path
        self.state_path = state_path
        self.prepop_csv = prepop_csv        # CSV to pre-populate rows from
        self.best_test_loss = 500000.0      # reference init (ref :790)
        self.no_improve = 0
        self.stopped = False
        self.finished = False   # all epochs trained (or early-stopped) and
        # final artifacts written — a group-level failure after this point
        # must NOT report the fork as failed (its tree is complete)

    def epoch0_at(self, t: int) -> int:
        return self.start_epoch0 + t

    def in_window_at(self, t: int, perturb_type: str) -> bool:
        return (perturb_type in windows.PERTURB_TYPES
                and windows.in_window(self.epoch0_at(t), self.run,
                                      self.window_len))


class _Setup:
    """Shared one-time setup for a batched run: assets, trainer, resident
    datasets, the three vmapped programs, eval index matrices, optional mesh
    replication. Paid ONCE per driver invocation (the sequential drivers pay
    it per fork)."""

    def __init__(self, base_config: dict, logger, mesh, group_size: int = 1):
        self.log = logger.info if logger else print
        self.mesh = mesh
        self.vmap_factor = per_chip_forks(group_size, mesh)
        self.cfg = ClipRunConfig.from_dict({
            **base_config, "training_run": 0,
            "checkpoint_path": os.path.join(
                base_config["output_base_directory"], "unused.ckpt"),
            "training_res_path": "unused.csv",
            "dora_parameters_path": "unused",
            "random_state_path": os.path.join(
                base_config["output_base_directory"],
                "random_states_unused"),
        })
        cfg = self.cfg
        # same source of truth as the solo path (ClipRunConfig defaults it
        # ON — measured -19% steady per-epoch on chip; see core/hostcopy.py)
        self.host_prefetch = bool(cfg.host_prefetch)
        self.assets = build_run_assets(cfg, logger or _PrintLogger())
        self.trainer = ClipHBATrainer(
            self.assets.clip_cfg, self.assets.params, self.assets.acfg,
            self.assets.static, self.assets.prompts, lr=cfg.lr,
            compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
            else jnp.float32,
            perturb_distribution=cfg.perturb_distribution,
            dist_mean=self.assets.mean, dist_std=self.assets.std, mesh=None,
            remat=cfg.remat)

        a, trainer = self.assets, self.trainer
        train_images = a.dataset.images_u8[a.train_idx]
        train_targets = a.dataset.targets[a.train_idx]
        test_images = a.dataset.images_u8[a.test_idx]
        test_targets = a.dataset.targets[a.test_idx]
        self.train_imgs_dev, self.train_tgts_dev = trainer.upload_dataset(
            train_images, train_targets)
        self.test_imgs_dev, self.test_tgts_dev = trainer.upload_dataset(
            test_images, test_targets)
        self.inf_imgs_dev, _ = trainer.upload_dataset(a.inference.images_u8)
        self.rdm_dev = jnp.asarray(a.reference_rdm)
        self.n_train, self.n_test = len(train_images), len(test_images)

        # frozen-prefix caching: one cache build serves EVERY fork of every
        # group (they share the frozen towers and the baseline split). Image-
        # perturbing kinds fall back to the full tower — their in-window
        # epochs replace the input images (see _build_batched_programs)
        self.use_cache = bool(getattr(cfg, "frozen_cache", False))
        if self.use_cache and cfg.perturb_type in injectors.IMAGE_KINDS:
            self.log(f"frozen_cache requested but perturb_type="
                     f"{cfg.perturb_type!r} replaces the tower input - "
                     f"batched groups run the full tower")
            self.use_cache = False
        self.train_cache = self.test_cache = self.inf_cache = None
        self.txt_cache = None
        if self.use_cache:
            self.train_cache = trainer.build_prefix_cache(self.train_imgs_dev)
            self.test_cache = trainer.build_prefix_cache(self.test_imgs_dev)
            self.inf_cache = trainer.build_prefix_cache(self.inf_imgs_dev)
            self.txt_cache = trainer.text_prefix_cache
            self.log("Frozen-prefix caches built: batched programs train "
                     "only the adapted suffix blocks")

        self.programs = _build_batched_programs(trainer, cfg.perturb_type,
                                                cached=self.use_cache)

        # eval batches are deterministic (arange); same matrices per fork.
        # The whole-set widening cap divides by the per-chip fork count —
        # the batched eval vmaps this forward vmap_factor times per dispatch
        self.eval_idx, self.eval_valid = trainer.eval_idx_mats(
            self.n_test, cfg.batch_size, vmap_factor=self.vmap_factor)

        if mesh is not None:
            # shared (fork-unmapped) operands must live on the same mesh as
            # the fork-sharded state: replicate them once
            from ..parallel import mesh as vmesh
            (trainer.params, trainer.static, self.train_imgs_dev,
             self.train_tgts_dev, self.test_imgs_dev, self.test_tgts_dev,
             self.inf_imgs_dev, self.rdm_dev, self.eval_idx,
             self.eval_valid) = vmesh.replicate(
                mesh, (trainer.params, trainer.static, self.train_imgs_dev,
                       self.train_tgts_dev, self.test_imgs_dev,
                       self.test_tgts_dev, self.inf_imgs_dev, self.rdm_dev,
                       jnp.asarray(self.eval_idx),
                       jnp.asarray(self.eval_valid)))
            if self.use_cache:
                (self.train_cache, self.test_cache, self.inf_cache,
                 self.txt_cache) = vmesh.replicate(
                    mesh, (self.train_cache, self.test_cache, self.inf_cache,
                           self.txt_cache))
            self.log(f"Fork axis sharded over {mesh.devices.size} devices "
                     f"(zero-collective fork parallelism)")

    def load_state(self, label: str, dora_file: str | None,
                   rs_dir: str | None, rfe: int, *, require: bool = False):
        """One fork's initial (trainable, opt_state, data_seed) — the solo
        semantics of run_behavioral_training (ref :1156-1201): strict=False
        DoRA overlay from `dora_file` (fresh init if absent), AdamW-state +
        data-seed restore from `rs_dir` at epoch `rfe` when rfe > 0.

        `require=True` (resume of an EXISTING trajectory — in-place or
        cross-run) turns a missing `dora_file` into an error: silently
        continuing a mid-lineage CSV from a fresh adapter would produce a
        scientifically meaningless trajectory that looks continuous."""
        cfg, assets, log = self.cfg, self.assets, self.log
        trainable = assets.trainable
        if dora_file and os.path.exists(dora_file):
            trainable = clip_ckpt.load_dora_parameters(dora_file, trainable,
                                                       assets.spec)
            log(f"  {label}: DoRA fork loaded from {dora_file}")
        elif require:
            raise FileNotFoundError(
                f"{label}: resume checkpoint {dora_file} is missing — "
                "refusing to continue an existing trajectory from a fresh "
                "adapter (torn artifact tree)")
        else:
            log(f"  {label}: fresh DoRA init (no {dora_file})")

        opt_state = self.trainer.init_opt_state(trainable)
        data_seed = cfg.random_seed
        if rfe > 0 and rs_dir:
            state = clip_ckpt.load_random_states(rs_dir, rfe, logger=None)
            if state is not None:
                restored = jax.tree_util.tree_map(jnp.asarray,
                                                  state["optimizer_state"])
                if (jax.tree_util.tree_structure(restored)
                        == jax.tree_util.tree_structure(opt_state)):
                    opt_state = restored
                else:
                    log(f"  {label}: optimizer-state structure mismatch - "
                        f"fresh AdamW state")
                data_seed = state["data_seed"]
        return trainable, opt_state, data_seed


def run_batched_sweep(base_config: dict, training_order: list[int], *,
                      group_size: int = 8, logger=None,
                      mesh=None, done_report=None,
                      preempt_guard=None) -> list[int]:
    """Train the sweep's forks in vmapped groups of `group_size`.

    `base_config` is the sweep CLI's per-run config template WITHOUT the
    run-specific paths (they are derived here, reference layout
    `{output_base_directory}/training_run{N}/...`). Returns the list of
    failed runs, like the sequential driver loop.

    `mesh`: optional 1-D ('data',) device mesh; the FORK axis is then
    sharded over it — each chip trains group_size/n_devices forks of the
    same compiled program with no collectives (see _shard_forks). Groups
    whose fork count does not divide the mesh are padded with ballast
    copies of the last fork.

    `done_report`: optional callable receiving the list of run numbers whose
    trees completed, invoked after every group (success or failure) — a
    dispatcher's crash-survivable progress ledger.

    `preempt_guard` (core/preempt.py) is polled BETWEEN groups: on a stop
    request the remaining groups stay undispatched (recorded on
    `preempt_guard.undispatched`) and the finished groups' artifact trees
    stand — re-invoking with the undispatched run list completes the sweep.

    `base_config["host_prefetch"]` enqueues the per-epoch checkpoint trees'
    d2h copies right after the train program returns (core/hostcopy.py) so
    they overlap the eval/RSA dispatches."""
    su = _Setup(base_config, logger, mesh, group_size)
    cfg, log = su.cfg, su.log
    out_base = base_config["output_base_directory"]

    # ascending groups: co-grouped forks have similar remaining spans, so the
    # ride-along waste after a fork finishes is bounded by the group's spread.
    # Deduped: two forks with the same run number share artifact paths and
    # would interleave duplicate CSV rows inside one group (the sequential
    # driver retrains duplicates benignly; the batched one cannot)
    order = sorted(set(training_order))
    groups = [order[i:i + group_size]
              for i in range(0, len(order), group_size)]
    log(f"Batched sweep: {len(order)} forks in {len(groups)} group(s) of "
        f"<= {group_size} (one vmapped program per group)")

    failed: list[int] = []
    totals = {"lock_steps": 0, "live": 0, "rider": 0, "pad": 0}
    for gi, runs in enumerate(groups):
        if _stop_batched(preempt_guard, gi, groups, lambda g: g, log,
                         "re-invoke with --training_order "
                         "<the undispatched list>"):
            break
        # per-fork init isolation: one run's unreadable fork state must not
        # take down its co-grouped (healthy) runs — it alone is reported
        # failed and the group trains without it
        forks: list[_ForkState] = []
        inits = []
        for run in runs:
            try:
                run_dir = os.path.join(out_base, f"training_run{run}")
                os.makedirs(run_dir, exist_ok=True)
                fk = _ForkState(
                    run, cfg.perturb_length, run - 1,
                    os.path.join(run_dir, f"training_res_run{run}.csv"),
                    os.path.join(run_dir, f"dora_params_run{run}"),
                    os.path.join(run_dir, f"random_states_run{run}"))
                init = su.load_state(
                    f"run {run}",
                    os.path.join(cfg.baseline_dora_directory,
                                 f"epoch{run - 1}_dora_params.pth"),
                    cfg.baseline_random_state_path, run - 1)
            except Exception as e:
                log(f"  run {run}: init FAILED: {e}")
                failed.append(run)
                continue
            forks.append(fk)
            inits.append(init)
        if not forks:
            continue
        try:
            st = _run_group(su, forks, inits, guard=preempt_guard)
            interrupted = st.pop("interrupted", False)
            _tally_ride_along(totals, st)
            if interrupted:
                _record_group_preemption(
                    preempt_guard, [f.run for f in forks if not f.finished],
                    [r for g in groups[gi + 1:] for r in g], log,
                    "re-invoke with --training_order <the undispatched "
                    "list>; partial runs resume in place")
                if done_report is not None:
                    done = sorted(f.run for f in forks if f.finished)
                    if done:
                        done_report(done)
                break
            log(f"Group {gi + 1}/{len(groups)} (runs "
                f"{[f.run for f in forks]}) completed "
                f"({_ride_along_str(st)})")
            if done_report is not None:
                done_report([f.run for f in forks])
        except Exception as e:
            # only forks whose trees are incomplete count as failed: a fork
            # that already finished all its epochs has full artifacts, and
            # reporting it failed would invite a re-run that truncates them
            done = sorted(f.run for f in forks if f.finished)
            bad = [f.run for f in forks if not f.finished]
            log(f"Group {gi + 1}/{len(groups)} (runs {runs}) FAILED: {e} "
                f"(incomplete runs: {bad})")
            failed.extend(bad)
            if done_report is not None and done:
                done_report(done)
    if totals["lock_steps"]:
        log(f"Batched sweep ride-along total: {_ride_along_str(totals)}")
    return failed


def _tally_ride_along(totals: dict, st: dict) -> None:
    for k in totals:
        totals[k] += st[k]


def _ride_along_str(st: dict) -> str:
    """'live/rider/pad' fork-epoch accounting line (weak-#3 measurement):
    rider% is the share of trained fork-epochs burned by stopped forks."""
    trained = st["live"] + st["rider"]
    pct = 100.0 * st["rider"] / trained if trained else 0.0
    s = (f"{st['lock_steps']} lock-steps, {st['live']} live + "
         f"{st['rider']} rider fork-epochs = {pct:.1f}% ride-along waste")
    if st["pad"]:
        s += f" + {st['pad']} mesh-pad fork-epochs"
    return s


def _record_group_preemption(guard, unfinished, later_items, log,
                             hint) -> None:
    """A group stopped at a lock-step boundary (mid-group preemption poll in
    _run_group): its unfinished members plus every not-yet-dispatched group
    go on `guard.undispatched` for the CLI's exit-143 contract. The
    unfinished members' completed epochs are already on disk (per-lock-step
    checkpoints + CSV rows), so re-invoking resumes them in place."""
    remaining = list(unfinished) + list(later_items)
    if guard is not None:
        guard.undispatched = remaining
    log(f"Preemption requested - stopped at a lock-step boundary with "
        f"{len(remaining)} item(s) to re-dispatch: {remaining} ({hint})")


def _stop_batched(guard, gi: int, groups, items_of, log, hint) -> bool:
    """Group-boundary preemption poll, shared by the batched sweep and
    lengths drivers. Called at the TOP of every group iteration after the
    first — i.e. exactly once per boundary on EVERY host regardless of how
    the previous group's inits fared, so the collective poll's all-gather
    counts can never diverge across a pod. On a stop request the remaining
    groups (including group gi) stay undispatched, recorded on
    `guard.undispatched` for the CLI's exit-143 contract."""
    if guard is None or gi == 0:
        return False
    poll = getattr(guard, "should_stop_collective", guard.should_stop)
    if not poll():
        return False
    remaining = [it for g in groups[gi:] for it in items_of(g)]
    guard.undispatched = remaining
    log(f"Preemption requested - stopping with {len(remaining)} "
        f"undispatched item(s): {remaining} ({hint})")
    return True


def run_batched_lengths(base_config: dict, onsets: list[int], length: int, *,
                        group_size: int = 8, logger=None,
                        mesh=None, preempt_guard=None) -> list[str]:
    """Train one length's (onset x L) conditions of the variable-length grid
    as vmapped fork groups — the batched counterpart of cli/lengths.py
    (reference clip_train_behavior_lengths.py trains its 136 conditions one
    full process at a time).

    Per condition the sequential CLI's resume ladder is preserved: in-place
    resume from the condition's own CSV, else cross-run resume from the
    longest shorter-length run at the same onset (CSV pre-population +
    DoRA/AdamW restore from the previous run's epoch files), else a fresh
    fork from the baseline at epoch onset-1. Conditions with different
    onsets/resume points co-train in one group: the per-fork `in_win` gate
    keys each fork's perturbation window off its ABSOLUTE epoch, so no
    relative-time alignment is required. Returns the failed condition dir
    names (e.g. 'random_target_e3_l2')."""
    su = _Setup(base_config, logger, mesh, group_size)
    cfg, log = su.cfg, su.log
    out_base = base_config["output_base_directory"]
    ptype = cfg.perturb_type

    conds = [(E, f"{ptype}_e{E}_l{length}") for E in sorted(set(onsets))]
    groups = [conds[i:i + group_size]
              for i in range(0, len(conds), group_size)]
    log(f"Batched lengths: {len(conds)} conditions (length {length}) in "
        f"{len(groups)} group(s) of <= {group_size}")

    failed: list[str] = []
    totals = {"lock_steps": 0, "live": 0, "rider": 0, "pad": 0}
    for gi, group in enumerate(groups):
        if _stop_batched(preempt_guard, gi, groups,
                         lambda g: [name for _, name in g], log,
                         "conditions resume in place on re-invoke"):
            break
        names = [name for _, name in group]
        # per-condition init isolation: one condition's torn sibling or
        # unreadable checkpoint must not take down its co-grouped (healthy)
        # conditions — it alone is reported failed
        forks: list[_ForkState] = []
        inits = []
        for E, name in group:
            try:
                fk, init = _init_length_condition(su, out_base, ptype, E,
                                                  name, length)
            except Exception as e:
                log(f"  {name}: init FAILED: {e}")
                failed.append(name)
                continue
            forks.append(fk)
            inits.append(init)
        if not forks:
            continue
        try:
            st = _run_group(su, forks, inits, guard=preempt_guard)
            interrupted = st.pop("interrupted", False)
            _tally_ride_along(totals, st)
            if interrupted:
                _record_group_preemption(
                    preempt_guard,
                    [f.label for f in forks if not f.finished],
                    [name for g in groups[gi + 1:] for _, name in g], log,
                    "conditions resume in place on re-invoke")
                break
            log(f"Group {gi + 1}/{len(groups)} ({names}) completed "
                f"({_ride_along_str(st)})")
        except Exception as e:
            bad = [f.label for f in forks if not f.finished]
            log(f"Group {gi + 1}/{len(groups)} ({names}) FAILED: {e} "
                f"(incomplete conditions: {bad})")
            failed.extend(bad)
    if totals["lock_steps"]:
        log(f"Batched lengths ride-along total: {_ride_along_str(totals)}")
    return failed


def _init_length_condition(su: _Setup, out_base: str, ptype: str, E: int,
                           name: str, length: int):
    """One condition's fork state + initial (trainable, opt, seed) via the
    full resume ladder: in-place (anchored on the newest epoch whose OWN
    checkpoint exists — a CSV row without its checkpoint is a torn tree and
    rolls back rather than resuming into a fresh adapter), else cross-run
    from the longest shorter sibling, else fresh from the baseline."""
    from ..cli.lengths import find_previous_run_dir, rollback_to_checkpoint
    cfg, log = su.cfg, su.log
    out_dir = os.path.join(out_base, name)
    os.makedirs(out_dir, exist_ok=True)
    res_path = os.path.join(out_dir, "training_res.csv")
    dora_dir = os.path.join(out_dir, f"dora_params_{E}")
    rs_dir = os.path.join(out_dir, f"random_states_{E}")

    last = csvio.last_completed_epoch0(res_path)
    anchored = (rollback_to_checkpoint(dora_dir, last, rs_dir=rs_dir)
                if last >= 0 else 0)
    resuming = False
    if last >= 0 and anchored > 0:
        rfe, prepop = anchored, res_path
        src_dora, src_rs = dora_dir, rs_dir
        resuming = True
        if anchored <= last:
            log(f"  {name}: CSV reaches epoch {last + 1} but the newest "
                f"checkpoint is epoch {anchored} - rolled back (torn tree)")
        log(f"  {name}: in-place resume from epoch {rfe + 1}")
    else:
        if last >= 0:
            log(f"  {name}: CSV has epochs through {last + 1} but NO own "
                f"checkpoints (torn tree) - restarting from the ladder")
        prev_dir, prev_len = find_previous_run_dir(out_base, ptype, E,
                                                   length)
        if prev_dir and prev_len is not None:
            rfe = max(0, E - 1) + prev_len
            prepop = os.path.join(prev_dir, "training_res.csv")
            src_dora = os.path.join(prev_dir, f"dora_params_{E}")
            src_rs = os.path.join(prev_dir, f"random_states_{E}")
            resuming = True
            log(f"  {name}: resuming from '{prev_dir}' "
                f"(length {prev_len}) at epoch {rfe + 1}")
        else:
            rfe, prepop = max(0, E - 1), None
            src_dora, src_rs = (cfg.baseline_dora_directory,
                                cfg.baseline_random_state_path)

    dora_file = (os.path.join(src_dora, f"epoch{rfe}_dora_params.pth")
                 if rfe > 0 else None)
    fk = _ForkState(E, length, rfe, res_path, dora_dir, rs_dir,
                    prepop_csv=prepop)
    fk.label = name
    # resuming an existing trajectory must find its checkpoint; only the
    # fresh-from-baseline fork keeps the reference's strict=False fallback
    init = su.load_state(name, dora_file, src_rs, rfe, require=resuming)
    return fk, init


class _PrintLogger:
    def info(self, msg):
        print(msg)

    warning = error = info


def _run_group(su: _Setup, forks: list[_ForkState], inits, guard=None):
    """Train one group of forks to completion under the lock-step loop.

    `inits` holds each fork's (trainable, opt_state, data_seed) from
    _Setup.load_state. Lock step t trains fork f's absolute epoch
    f.start_epoch0 + t; the per-fork `in_win` gate (absolute window
    arithmetic, _ForkState.in_window_at) selects perturbed vs clean inputs
    inside the single compiled program.

    Returns ride-along accounting for the group: a dict with `lock_steps`
    (epochs the compiled program ran), `live` (fork-epochs that produced
    artifacts), `rider` (fork-epochs burned by already-stopped/finished
    forks riding until the group drained — the waste ascending grouping is
    meant to bound) and `pad` (mesh-padding ballast fork-epochs)."""
    cfg, trainer, mesh, log = su.cfg, su.trainer, su.mesh, su.log
    n_train, n_test = su.n_train, su.n_test
    # host artifacts are process-0-owned, like the sequential loops: every
    # pod process runs the same compiled group, but only one writes the
    # shared-FS CSVs/checkpoints (P ungated writers = duplicated epoch rows)
    primary = pdist.is_primary()
    for f in forks:
        f.finished = f.stopped or f.epoch0_at(0) >= cfg.epochs
        if primary:
            csvio.init_clip_csv(f.res_path, f.start_epoch0, f.prepop_csv,
                                None)
    seeds = [int(s) for _, _, s in inits]

    R = len(forks)
    r_pad = 0 if mesh is None else (-R) % mesh.devices.size
    trainable = _shard_forks(mesh, _pad_forks(
        _stack([t for t, _, _ in inits]), r_pad))
    opt_state = _shard_forks(mesh, _pad_forks(
        _stack([o for _, o, _ in inits]), r_pad))
    shufflers = [dthings.EpochShuffler(n_train, cfg.batch_size, s)
                 for s in seeds]
    dropout_root = jax.random.PRNGKey(cfg.random_seed)
    base_pkeys = _shard_forks(mesh, _pad_forks(jnp.stack([
        perturb_base_key(cfg.perturb_seed, f.run)
        for f in forks]), r_pad))

    stats = {"lock_steps": 0, "live": 0, "rider": 0, "pad": 0}
    # lock-step-boundary preemption poll: a ~30 s spot notice must stop the
    # group within ONE lock-step (seconds), not at the group's end (wide
    # groups run many minutes). Every completed lock-step has already
    # written its per-epoch checkpoints + CSV rows, so the partial group
    # resumes in place on re-invoke. Count-consistent across a pod: every
    # host runs the same lock-steps, so the collective poll's all-gather
    # cadence cannot diverge.
    poll = (getattr(guard, "should_stop_collective", None)
            or getattr(guard, "should_stop", None)) if guard else None
    t = 0
    while not all(f.stopped or f.epoch0_at(t) >= cfg.epochs for f in forks):
        if t > 0 and poll is not None and poll():
            stats["interrupted"] = True
            break
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
        inw_host = [f.in_window_at(t, cfg.perturb_type) for f in forks]
        # patience freezes on PURE window arithmetic (reference :1044-1056);
        # inw_host (type-checked) gates the actual injection only
        win_host = [windows.in_window(f.epoch0_at(t), f.run, f.window_len)
                    for f in forks]
        in_win = _shard_forks(mesh, _pad_forks(
            jnp.asarray(inw_host, dtype=bool), r_pad))

        if t == 0:
            _log_injection_evidence(su, forks, inw_host, idx_mat, valid_mat,
                                    log)

        live = [f for f in forks
                if not (f.stopped or f.epoch0_at(t) >= cfg.epochs)]
        stats["lock_steps"] += 1
        stats["live"] += len(live)
        stats["rider"] += len(forks) - len(live)
        stats["pad"] += r_pad

        train_src = su.train_cache if su.use_cache else su.train_imgs_dev
        trainable, opt_state, losses, oks = su.programs["train"](
            trainable, opt_state, trainer.params, trainer.static,
            train_src, su.train_tgts_dev, idx_mat, valid_mat, dkeys,
            base_pkeys, in_win, su.txt_cache)
        if live and primary and su.host_prefetch:
            # enqueue the checkpoint trees' d2h now so the transfer overlaps
            # the eval/RSA dispatches below instead of serializing behind
            # them at the blocking device_get (core/hostcopy.py)
            hostcopy.prefetch_to_host(trainable, opt_state)
        losses = np.asarray(losses)          # [R(+pad), n_b]
        oks = np.asarray(oks)

        test_src = su.test_cache if su.use_cache else su.test_imgs_dev
        totals = np.asarray(su.programs["eval"](
            trainable, trainer.params, trainer.static, test_src,
            su.test_tgts_dev, su.eval_idx, su.eval_valid, su.txt_cache))
        inf_src = su.inf_cache if su.use_cache else su.inf_imgs_dev
        rhos, ps = su.programs["rsa"](trainable, trainer.params,
                                      trainer.static, inf_src,
                                      su.rdm_dev, su.txt_cache)
        rhos, ps = np.asarray(rhos), np.asarray(ps)

        # one bulk d2h fetch of the whole stacked state, then numpy slicing
        # per fork: per-fork per-leaf transfers cost ~60 round-trips per fork
        # per lock step, which dominates on a high-latency link
        if live and primary:   # only the writer needs the host copy
            host_trainable = jax.device_get(trainable)
            host_opt = jax.device_get(opt_state)

        for i, f in enumerate(forks):
            if f.stopped or f.epoch0_at(t) >= cfg.epochs:
                continue
            e0 = f.epoch0_at(t)
            for bi in np.nonzero(~oks[i])[0]:
                log(f"  run {f.run}: WARNING non-finite batch {bi} skipped "
                    f"(epoch {e0 + 1})")
            # mask BEFORE multiplying: NaN * 0 = NaN (see clip_loop solo)
            train_loss = float(np.sum(
                np.where(oks[i], losses[i], 0.0) * sizes[i])) / n_train
            test_loss = float(totals[i]) / n_test
            flags = windows.epoch_flags(e0, f.run, f.window_len,
                                        cfg.perturb_type)
            log(f"  run {f.run} epoch {e0 + 1}: train {train_loss:.4f} "
                f"test {test_loss:.4f} rsa {rhos[i]:.4f} (p={ps[i]:.4f})")
            if primary:
                # checkpoints BEFORE the CSV row: a crash between the two
                # then leaves "checkpoint without row" (retrained benignly on
                # resume) instead of "row without checkpoint" (a torn tree
                # the resume ladder must refuse)
                fork_trainable = _slice_fork(host_trainable, i)
                clip_ckpt.save_dora_parameters(fork_trainable, f.dora_path,
                                               e0)
                clip_ckpt.save_random_states(
                    _slice_fork(host_opt, i), e0, f.state_path, seeds[i],
                    {"dropout_seed": cfg.random_seed})
                csvio.append_clip_row(f.res_path, e0 + 1, train_loss,
                                      test_loss, float(rhos[i]),
                                      float(ps[i]), **flags)

            if test_loss < f.best_test_loss:
                f.best_test_loss = test_loss
                f.no_improve = 0
            elif not win_host[i]:  # patience paused inside the window
                f.no_improve += 1
            if f.no_improve == cfg.early_stopping_patience:
                log(f"  run {f.run}: early stopping at epoch {e0 + 1}")
                f.stopped = True
            f.finished = f.stopped or f.epoch0_at(t + 1) >= cfg.epochs
        t += 1
    return stats


def _log_injection_evidence(su: _Setup, forks, inw_host, idx_mat, valid_mat,
                            log):
    """Per-fork first-batch injector evidence (the reference's debug-print
    verification, ref :886-982) — one small device call per in-window fork."""
    cfg, trainer = su.cfg, su.trainer
    for i, f in enumerate(forks):
        if not inw_host[i]:
            continue
        idx0 = idx_mat[i, 0]
        img0 = dthings.normalize_uint8(su.train_imgs_dev[idx0])
        tgt0 = su.train_tgts_dev[idx0]
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
