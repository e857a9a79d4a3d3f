"""The reference's COMPLETE experimental paradigm as one driver invocation.

Reproduces, at real ViT-L/14 shapes, the end-to-end artifact-producing run the
reference spent ~64 h on (main_training_log_20251016_125025.txt: 98-run sweep;
README.md:296: 2-4 h per baseline):

  1. baseline CLIP-HBA training (batch 64, DoRA rank 32, per-epoch RSA,
     checkpoints + CSV)              [reference clip_train_behavior_baseline.py]
  2. a single-epoch perturbation sweep forked from the baseline, two
     perturbation types                  [reference clip_train_behavior_sweep.py]
  3. an (onset x length) variable-length grid, longer runs cross-resuming
     from shorter ones              [reference clip_train_behavior_lengths.py]
  4. fig1-4 analyses parsed from the produced artifact tree — the same
     readers that parse the reference's shipped trees     [Figures/fig1-4.ipynb]

Data is synthetic (zero-egress environment: no THINGS/weights on disk) but all
SHAPES are real: 1806 train images decoded at 224^2, 66-d targets, 48-image RDM,
ViT-L/14 towers. The scientific numbers are therefore meaningless; the run
proves the orchestration layer end-to-end on the TPU and measures its wall-clock
against the reference's logs.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python examples/paradigm_tpu.py /tmp/paradigm \
      [--backbone ViT-L/14] [--epochs 30] [--batch_size 64]

A smoke-scale config for CPU debugging:
  python examples/paradigm_tpu.py /tmp/p_smoke --backbone test-tiny --epochs 4 \
      --n_train 60 --sweep_epochs 2,3 --noise_epochs 3 --onsets 2 --lengths 1,2 \
      --compute_dtype float32
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_things(root: str, n_train: int, n_val: int = 48,
                          src_px: int = 64):
    """THINGS-shaped synthetic tree. Source PNGs are small (decode_images
    resizes to the model's input resolution); target/RDM shapes are exact."""
    from PIL import Image
    import pandas as pd
    import scipy.io

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    names = []
    for i in range(max(n_train, n_val)):
        n = f"object_{i:04d}.png"
        p = os.path.join(img_dir, n)
        # draw UNCONDITIONALLY so the RandomState stream position is the
        # same on every invocation — a resumed run must regenerate
        # byte-identical targets/RDM or the forks would silently resume
        # baseline checkpoints trained on different data
        arr = rs.randint(0, 255, (src_px, src_px, 3), dtype=np.uint8)
        if not os.path.exists(p):  # idempotent re-runs
            Image.fromarray(arr).save(p)
        names.append(n)

    df = pd.DataFrame({"image_name": names[:n_train]})
    for j in range(66):
        df[f"dim{j}"] = (rs.rand(n_train) * 2).astype(np.float32)
    train_csv = os.path.join(root, "spose_train.csv")
    if not os.path.exists(train_csv):
        df.to_csv(train_csv)

    inf = pd.DataFrame({"image_name": names[:n_val]})
    for j in range(66):
        inf[f"dim{j}"] = (rs.rand(n_val) * 2).astype(np.float32)
    val_csv = os.path.join(root, "spose_val.csv")
    if not os.path.exists(val_csv):
        inf.to_csv(val_csv)

    rdm = rs.rand(n_val, n_val)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    rdm_path = os.path.join(root, "RDM48_triplet.mat")
    if not os.path.exists(rdm_path):
        scipy.io.savemat(rdm_path, {"RDM48_triplet": rdm})
    return {
        "csv_file": os.path.join(root, "spose_train.csv"),
        "img_dir": img_dir,
        "inference_csv_file": os.path.join(root, "spose_val.csv"),
        "RDM48_triplet_dir": os.path.join(root, "RDM48_triplet.mat"),
    }


def parse_ints(s: str) -> list[int]:
    return [int(x) for x in s.split(",") if x.strip()]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--backbone", default="ViT-L/14")
    ap.add_argument("--epochs", type=int, default=30,
                    help="baseline length; forks train to this cap too")
    ap.add_argument("--baseline_epochs", type=int, default=None,
                    help="override the baseline's epoch count (forks keep "
                         "--epochs as their cap). A full 98-run sweep needs "
                         "baseline checkpoints for epochs 1..97, so the "
                         "baseline must run >= 98 epochs")
    ap.add_argument("--patience", type=int, default=20,
                    help="early-stopping patience (reference default 20)")
    ap.add_argument("--baseline_patience", type=int, default=None,
                    help="override the baseline's patience (e.g. a large "
                         "value to force the baseline through every epoch "
                         "the sweep forks will need to fork from)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--n_train", type=int, default=1806)
    ap.add_argument("--sweep_epochs", default="2,5,8,11,14,17,20,25",
                    help="random_target sweep fork epochs: a comma list, or "
                         "an order spec the sweep CLI understands (hybrid = "
                         "the reference's full 98-run order, midpoint, "
                         "range:A-B)")
    ap.add_argument("--noise_epochs", default="5,11,17,25",
                    help="image_noise sweep fork epochs (second type for fig2)")
    ap.add_argument("--onsets", default="3,8")
    ap.add_argument("--lengths", default="1,2")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--sweep_workers", type=int, default=1,
                    help="fan the sweep forks out over N single-chip worker "
                         "processes (multi-chip hosts; see cli/sweep.py "
                         "--workers). 1 = in-process, the single-chip default")
    ap.add_argument("--worker_device_env", default="TPU_VISIBLE_DEVICES",
                    help="chip-pinning env var for --sweep_workers "
                         "('none' on CPU)")
    ap.add_argument("--sweep_batched_forks", type=int, default=1,
                    help="vmap-batch the sweep forks in groups of N per chip "
                         "(train/multi_fork.py); composes with "
                         "--sweep_workers")
    ap.add_argument("--sweep_fork_devices", type=int, default=1,
                    help="shard the batched fork axis over N local devices "
                         "(cli/sweep.py --fork_devices)")
    ap.add_argument("--frozen_cache", action="store_true",
                    help="train from cached frozen-prefix activations "
                         "(baseline + sweep + lengths; image-kind sweeps "
                         "fall back per-epoch/per-group automatically)")
    ap.add_argument("--batched_lengths", action="store_true",
                    help="train each length's onset conditions as one "
                         "vmapped fork group (cli/lengths.py --onsets mode) "
                         "instead of one process-level run per condition")
    args = ap.parse_args(argv)

    # cross-run compile reuse: every sweep/lengths fork builds a fresh trainer
    # (new jit closures), so in-process jit caching never hits — the persistent
    # cache keyed on HLO fingerprint is what makes an N-run sweep pay the
    # ViT-L epoch-scan compile once (the CLIs enable it themselves too)
    from vit_project_tpu.core.compile_cache import enable_persistent_cache
    cache_dir = enable_persistent_cache()
    print(f"[paradigm] persistent compile cache: {cache_dir}")

    work = os.path.abspath(args.workdir)
    os.makedirs(work, exist_ok=True)
    times: dict[str, float] = {}
    t_all = time.time()

    print(f"== data: synthetic THINGS ({args.n_train} train imgs) -> {work}")
    t0 = time.time()
    data = make_synthetic_things(work, args.n_train)
    times["data_gen"] = time.time() - t0

    from vit_project_tpu.train.clip_loop import run_behavioral_training
    from vit_project_tpu.cli import sweep as sweep_cli, lengths as lengths_cli
    from vit_project_tpu.analysis import figs

    base = os.path.join(work, "baseline")
    common = dict(data, backbone=args.backbone, epochs=args.epochs,
                  batch_size=args.batch_size, train_portion=0.8, lr=3e-4,
                  logger=None, early_stopping_patience=args.patience,
                  random_seed=args.seed, vision_layers=2, transformer_layers=1,
                  rank=args.rank, criterion="mse", cuda=0,
                  perturb_distribution="target", perturb_seed=0,
                  compute_dtype=args.compute_dtype)

    baseline_epochs = args.baseline_epochs or args.epochs
    baseline_patience = args.baseline_patience or args.patience
    print(f"== 1/4 baseline ({baseline_epochs} epochs, {args.backbone}, "
          f"batch {args.batch_size})")
    t0 = time.time()
    base_cfg = {
        **common, "frozen_cache": args.frozen_cache,
        "epochs": baseline_epochs,
        "early_stopping_patience": baseline_patience,
        "perturb_type": "baseline", "perturb_length": 0,
        "training_run": 0,
        "checkpoint_path": f"{base}/model.ckpt",
        "training_res_path": f"{base}/training_res.csv",
        "dora_parameters_path": f"{base}/dora_params",
        "random_state_path": f"{base}/random_states"}
    if args.sweep_workers > 1:
        # the worker dispatch requires THIS process to never initialize
        # jax (the parent would acquire every chip the pinned workers
        # need — cli/sweep.py:_run_workers), so the baseline trains in a
        # subprocess that owns the chip and exits before the dispatch
        import subprocess
        os.makedirs(base, exist_ok=True)
        cfg_path = f"{base}/baseline_config.json"
        with open(cfg_path, "w") as f:
            json.dump(base_cfg, f)
        code = ("import json,sys;"
                "from vit_project_tpu.train.clip_loop import "
                "run_behavioral_training;"
                "run_behavioral_training(json.load(open(sys.argv[1])))")
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + repo
                             ).lstrip(os.pathsep)
        subprocess.run([sys.executable, "-c", code, cfg_path], env=env,
                       check=True)
    else:
        run_behavioral_training(base_cfg)
    times["baseline"] = time.time() - t0
    print(f"   baseline wall: {times['baseline']:.1f}s "
          f"(reference: ~43 s/epoch on its lab GPU)")

    def sweep_args(ptype: str, order: list[int], outdir: str) -> list[str]:
        return [
            "--csv_file", data["csv_file"], "--img_dir", data["img_dir"],
            "--inference_csv_file", data["inference_csv_file"],
            "--RDM48_triplet_dir", data["RDM48_triplet_dir"],
            "--backbone", args.backbone, "--epochs", str(args.epochs),
            "--batch_size", str(args.batch_size),
            "--random_seed", str(args.seed), "--vision_layers", "2",
            "--transformer_layers", "1", "--rank", str(args.rank),
            "--perturb_type", ptype, "--perturb_seed", "0",
            "--baseline_dora_directory", f"{base}/dora_params",
            "--baseline_random_state_path", f"{base}/random_states",
            "--baseline_split_indices_path",
            f"{base}/random_states/dataset_split_indices.pth",
            "--output_base_directory", outdir,
            "--training_order", ",".join(map(str, order)),
            "--early_stopping_patience", str(args.patience),
            "--compute_dtype", args.compute_dtype,
            "--workers", str(args.sweep_workers),
            "--worker_device_env", args.worker_device_env,
            "--batched_forks", str(args.sweep_batched_forks),
            "--fork_devices", str(args.sweep_fork_devices)] + (
            ["--frozen_cache"] if args.frozen_cache else [])

    rt_order = sweep_cli.parse_order(args.sweep_epochs)
    in_order = parse_ints(args.noise_epochs)
    sweep_rt = os.path.join(work, "sweep_random_target")
    sweep_in = os.path.join(work, "sweep_image_noise")

    print(f"== 2/4 sweep: random_target forks {rt_order} "
          f"+ image_noise forks {in_order}")
    t0 = time.time()
    failed = sweep_cli.main(sweep_args("random_target", rt_order, sweep_rt))
    if failed:  # not assert: must abort under python -O too
        raise RuntimeError(f"sweep failures: {failed}")
    times["sweep_random_target"] = time.time() - t0
    t0 = time.time()
    failed = sweep_cli.main(sweep_args("image_noise", in_order, sweep_in))
    if failed:
        raise RuntimeError(f"sweep failures: {failed}")
    times["sweep_image_noise"] = time.time() - t0
    n_forks = len(rt_order) + len(in_order)
    print(f"   {n_forks} forks wall: "
          f"{times['sweep_random_target'] + times['sweep_image_noise']:.1f}s "
          f"(reference: 16-79 min PER fork, 98 forks ~= 64 h)")

    onsets, lens = parse_ints(args.onsets), sorted(parse_ints(args.lengths))
    lengths_dir = os.path.join(work, "lengths")
    print(f"== 3/4 lengths grid: onsets {onsets} x lengths {lens} "
          f"(longer runs cross-resume from shorter)")
    t0 = time.time()

    def lengths_common():
        return [
            "--perturb_type", "random_target",
            "--epochs", str(args.epochs),
            "--batch_size", str(args.batch_size),
            "--csv_file", data["csv_file"], "--img_dir", data["img_dir"],
            "--inference_csv_file", data["inference_csv_file"],
            "--RDM48_triplet_dir", data["RDM48_triplet_dir"],
            "--backbone", args.backbone,
            "--random_seed", str(args.seed), "--perturb_seed", "0",
            "--vision_layers", "2", "--transformer_layers", "1",
            "--rank", str(args.rank),
            "--baseline_dora_directory", f"{base}/dora_params",
            "--baseline_random_state_path", f"{base}/random_states",
            "--baseline_split_indices_path",
            f"{base}/random_states/dataset_split_indices.pth",
            "--output_base_directory", lengths_dir,
            "--early_stopping_patience", str(args.patience),
            "--compute_dtype", args.compute_dtype] + (
            ["--frozen_cache"] if args.frozen_cache else [])

    for L in lens:  # ascending so l2 exercises cross-run resume from l1
        if args.batched_lengths:
            failed = lengths_cli.main(
                lengths_common()
                + ["--onsets", ",".join(map(str, onsets)),
                   "--perturb_length", str(L),
                   "--fork_devices", str(args.sweep_fork_devices)])
            if failed:
                raise RuntimeError(f"lengths failures: {failed}")
        else:
            for E in onsets:
                lengths_cli.main(
                    lengths_common()
                    + ["--perturb_epoch", str(E),
                       "--perturb_length", str(L),
                       "--output_dir", f"random_target_e{E}_l{L}"])
    times["lengths_grid"] = time.time() - t0
    print(f"   grid wall: {times['lengths_grid']:.1f}s")

    print("== 4/4 analyses (the readers that parse the reference trees)")
    t0 = time.time()
    f1 = figs.plot_fig1(f"{base}/training_res.csv",
                        os.path.join(work, "fig1_trajectory.png"))
    # fig2 compares the two perturbation types at shared epochs; when the
    # sweeps are disjoint, plot every epoch either type covers (plot_fig2
    # drops a type's missing epochs per-cell) — the intersection-only
    # fallback to in_order would silently draw a one-type figure
    fig2_epochs = sorted(set(rt_order) & set(in_order)) or \
        sorted(set(rt_order) | set(in_order))
    f2 = figs.plot_fig2(
        f"{base}/training_res.csv",
        {"random_target": sweep_rt, "image_noise": sweep_in},
        fig2_epochs,
        os.path.join(work, "fig2_type_deltas.png"))
    f3 = figs.plot_fig3(f"{base}/training_res.csv", sweep_rt,
                        os.path.join(work, "fig3_sweep_deltas.png"))
    f4 = figs.plot_fig4(f"{base}/training_res.csv", lengths_dir,
                        os.path.join(work, "fig4_recovery.png"))
    rec = figs.recovery_table(f"{base}/training_res.csv", lengths_dir)
    times["analysis"] = time.time() - t0
    print(f"figures: {f1} {f2} {f3} {f4}")
    print("recovery table:")
    print(rec.to_string(index=False))

    times["total"] = time.time() - t_all
    summary = {
        "backbone": args.backbone, "epochs": args.epochs,
        "batch_size": args.batch_size, "n_train": args.n_train,
        "sweep_forks": n_forks,
        "lengths_conditions": len(onsets) * len(lens),
        "wall_seconds": {k: round(v, 1) for k, v in times.items()},
        "reference_walls": {
            "per_epoch_s": 43,
            "per_fork_min": "16-79",
            "full_98_fork_sweep_h": 64,
        },
    }
    with open(os.path.join(work, "paradigm_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"\nParadigm complete. Artifacts under {work}")
    return summary


if __name__ == "__main__":
    main()
