"""Round-5 paradigm completion: the LAST reference experiments at cardinality.

Round 4 drove the 98-run single-epoch sweep, the image_noise fig2 sweep and
51/136 lengths-grid conditions on the chip (BENCHLOG round 4(3)). This driver
finishes the reference tree dir-for-dir against the same baseline artifacts:

  1. the three remaining fig2 type-sweeps at the reference's run set
     {5,15,25,35,45,70,98} (reference trees Data/clip_results/
     {label_shuffle,target_noise,uniform_target}/, 7 CSVs each):
       label_shuffle  -> ours label_shuffle   (target kind, frozen cache)
       target_noise   -> ours random_target   (target kind, frozen cache)
       uniform_target -> ours uniform_images  (image kind, full tower)
  2. the remaining lengths-grid conditions of the exact 136-dir reference set
     (Data/clip_results/perturb_length_experiments_baselineseed1_perturbseed0/),
     lengths ascending so every new condition cross-resumes its shorter
     sibling (clip_train_behavior_lengths.py:188-218 semantics)
  3. fig2 over all FOUR types + fig3 + fig4/recovery over all 136 conditions
  4. a committed mirror of every produced training_res CSV laid out exactly
     like the reference's Data/clip_results/ (flat CSVs for the fig2 type
     trees, training_run{N}/ for the sweep, {type}_e{E}_l{L}/ for lengths),
     so the parity tooling can diff ours-vs-reference tree-for-tree without
     the 17 GB scratch tree.

Because reference target_noise == our random_target at the same fork epochs
and seeds, the 7 target_noise runs re-derive rows the 98-run sweep already
produced from the same checkpoints — the driver records whether the two
trees' CSV rows agree (fork-determinism evidence across different vmapped
group compositions).

Usage (chip):
  PYTHONPATH=/root/.axon_site:/root/repo python examples/paradigm_r5.py \
      /tmp/paradigm_full_r4 --mirror results/paradigm_r5
Resumable: completed sweep runs are skipped by CSV inspection; lengths
conditions resume in place via the CLI's own ladder logic.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's exact 136-condition grid, transcribed from its shipped
# tree (non-uniform: onsets 13/16/19/58/94 lack l2, onset 22 has only l5)
LENGTHS_GRID = {
    2: [1, 2, 3, 6, 7, 8, 10, 20, 30, 40, 50, 60, 70, 80, 90],
    5: [1, 2, 3, 6, 7, 8, 10, 13, 16, 19, 20, 22, 30, 40, 50, 58, 60, 70,
        80, 90, 94],
    10: [1, 2, 3, 6, 7, 8, 10, 13, 16, 19, 20, 30, 40, 50, 58, 60, 70, 80,
         90, 94],
    20: [1, 2, 3, 6, 7, 8, 10, 13, 16, 19, 20, 30, 40, 50, 58, 60, 70, 80,
         90, 94],
    30: [1, 2, 3, 6, 7, 8, 10, 13, 16, 19, 20, 30, 40, 50, 58, 60, 70, 80,
         90, 94],
    40: [1, 2, 3, 6, 7, 8, 10, 13, 16, 19, 20, 30, 40, 50, 58, 60, 70, 80,
         90, 94],
    50: [1, 2, 3, 6, 7, 8, 10, 13, 16, 19, 20, 30, 40, 50, 58, 60, 70, 80,
         90, 94],
}
assert sum(len(v) for v in LENGTHS_GRID.values()) == 136

FIG2_RUNS = [5, 15, 25, 35, 45, 70, 98]  # reference fig2.ipynb epoch set
# reference tree name -> our perturb_type
FIG2_TYPES = {"label_shuffle": "label_shuffle",
              "target_noise": "random_target",
              "uniform_target": "uniform_images"}
# mutable so a CPU smoke run can shrink the config (see __main__ flags)
EPOCHS, PATIENCE, RANK, SEED, BS = 110, 20, 32, 1, 64
BACKBONE, DTYPE = "ViT-L/14", "bfloat16"


def _run_complete(csv_path: str, onset: int, length: int) -> bool:
    """A run is done when its CSV reached the epoch cap or early stopping
    provably fired under the trainer's ACTUAL rule: the patience counter
    increments only OUTSIDE the perturbation window [onset, onset+length-1]
    (window-paused patience, reference new_cvpr...pipeline.py:1049-1056; the
    lock-step loop in train/multi_fork.py). Counting all post-best rows
    would misclassify a long-window condition interrupted mid-window as
    early-stopped and skip it forever on resume."""
    if not os.path.exists(csv_path):
        return False
    rows = []
    with open(csv_path) as f:
        header = f.readline().strip().split(",")
        ti = header.index("test_loss")
        for line in f:
            if line.strip():
                v = line.split(",")
                rows.append((int(float(v[0])), float(v[ti])))
    if not rows:
        return False
    if rows[-1][0] >= EPOCHS:
        return True
    best = float("inf")
    no_improve = 0
    for epoch, test in rows:
        in_win = onset <= epoch <= onset + length - 1
        if test < best:
            best = test
            no_improve = 0
        elif not in_win:
            no_improve += 1
        if no_improve >= PATIENCE:
            return True
    return False


def sweep_type(work: str, base: str, data: dict, ptype: str, outdir: str,
               sweep_cli) -> float:
    todo = [r for r in FIG2_RUNS if not _run_complete(
        os.path.join(outdir, f"training_run{r}", f"training_res_run{r}.csv"),
        r, 1)]
    if not todo:
        print(f"   {outdir}: all {len(FIG2_RUNS)} runs already complete")
        return 0.0
    t0 = time.time()
    failed = sweep_cli.main([
        "--csv_file", data["csv_file"], "--img_dir", data["img_dir"],
        "--inference_csv_file", data["inference_csv_file"],
        "--RDM48_triplet_dir", data["RDM48_triplet_dir"],
        "--backbone", BACKBONE, "--epochs", str(EPOCHS),
        "--batch_size", str(BS), "--random_seed", str(SEED),
        "--vision_layers", "2", "--transformer_layers", "1",
        "--rank", str(RANK), "--perturb_type", ptype, "--perturb_seed", "0",
        "--early_stopping_patience", str(PATIENCE),
        "--baseline_dora_directory", f"{base}/dora_params",
        "--baseline_random_state_path", f"{base}/random_states",
        "--baseline_split_indices_path",
        f"{base}/random_states/dataset_split_indices.pth",
        "--output_base_directory", outdir,
        "--training_order", ",".join(map(str, todo)),
        "--compute_dtype", DTYPE,
        "--batched_forks", "8", "--frozen_cache"])
    if failed:
        raise RuntimeError(f"{ptype} sweep failures: {failed}")
    return time.time() - t0


def drive_lengths(work: str, base: str, data: dict, lengths_dir: str,
                  lengths_cli) -> dict[str, float]:
    times = {}
    for L in sorted(LENGTHS_GRID):
        onsets = [E for E in LENGTHS_GRID[L]
                  if not _run_complete(os.path.join(
                      lengths_dir, f"random_target_e{E}_l{L}",
                      "training_res.csv"), E, L)]
        if not onsets:
            print(f"   length {L}: all conditions complete")
            continue
        t0 = time.time()
        failed = lengths_cli.main([
            "--perturb_type", "random_target", "--epochs", str(EPOCHS),
            "--batch_size", str(BS),
            "--csv_file", data["csv_file"], "--img_dir", data["img_dir"],
            "--inference_csv_file", data["inference_csv_file"],
            "--RDM48_triplet_dir", data["RDM48_triplet_dir"],
            "--backbone", BACKBONE, "--random_seed", str(SEED),
            "--perturb_seed", "0", "--vision_layers", "2",
            "--transformer_layers", "1", "--rank", str(RANK),
            "--early_stopping_patience", str(PATIENCE),
            "--baseline_dora_directory", f"{base}/dora_params",
            "--baseline_random_state_path", f"{base}/random_states",
            "--baseline_split_indices_path",
            f"{base}/random_states/dataset_split_indices.pth",
            "--output_base_directory", lengths_dir,
            "--compute_dtype", DTYPE, "--frozen_cache",
            "--onsets", ",".join(map(str, onsets)),
            "--perturb_length", str(L), "--batched_forks", "8"])
        if failed:
            raise RuntimeError(f"lengths failures at L={L}: {failed}")
        times[f"l{L}"] = round(time.time() - t0, 1)
        print(f"== length {L}: {len(onsets)} conditions in "
              f"{times[f'l{L}']}s", flush=True)
    return times


def compare_target_noise(work: str) -> dict:
    """target_noise runs re-derive random_target sweep rows from the same
    forks; row-for-row agreement is fork-determinism evidence across
    different vmapped group compositions."""
    out = {"compared": 0, "equal_rows": 0, "max_loss_rel_diff": 0.0,
           "max_rsa_abs_diff": 0.0, "runs_equal": []}
    for r in FIG2_RUNS:
        a = os.path.join(work, "sweep_random_target", f"training_run{r}",
                         f"training_res_run{r}.csv")
        b = os.path.join(work, "sweep_target_noise", f"training_run{r}",
                         f"training_res_run{r}.csv")
        if not (os.path.exists(a) and os.path.exists(b)):
            continue
        rows_a = open(a).read().splitlines()
        rows_b = open(b).read().splitlines()
        n = min(len(rows_a), len(rows_b))
        eq = sum(1 for i in range(n) if rows_a[i] == rows_b[i])
        out["compared"] += n
        out["equal_rows"] += eq
        out["runs_equal"].append({"run": r, "rows": n, "byte_equal": eq,
                                  "identical": eq == n and
                                  len(rows_a) == len(rows_b)})
        for i in range(1, n):
            va = [float(x) for x in rows_a[i].split(",")[1:4]]
            vb = [float(x) for x in rows_b[i].split(",")[1:4]]
            for x, y in zip(va[:2], vb[:2]):  # train/test loss: relative
                d = abs(x - y) / max(abs(x), abs(y), 1e-12)
                out["max_loss_rel_diff"] = max(out["max_loss_rel_diff"], d)
            # rho lives in [-1,1] and sits near 0 on synthetic data: absolute
            out["max_rsa_abs_diff"] = max(out["max_rsa_abs_diff"],
                                          abs(va[2] - vb[2]))
    return out


def mirror_tree(work: str, mirror_root: str) -> int:
    """Commit-sized mirror of every training_res CSV in the reference's
    Data/clip_results layout (flat fig2 trees, training_run{N}/ sweep dirs,
    {type}_e{E}_l{L}/ lengths dirs)."""
    cr = os.path.join(mirror_root, "clip_results")
    n = 0

    def cp(src, dst):
        nonlocal n
        if os.path.exists(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(src, dst)
            n += 1

    cp(os.path.join(work, "baseline", "training_res.csv"),
       os.path.join(cr, "baseline_clip_results_seed1.csv"))
    for r in range(1, 99):
        cp(os.path.join(work, "sweep_random_target", f"training_run{r}",
                        f"training_res_run{r}.csv"),
           os.path.join(cr, "single_sweep_experiments", f"training_run{r}",
                        f"training_res_run{r}.csv"))
    for ref_name in ("image_noise", "label_shuffle", "target_noise",
                     "uniform_target"):
        ours = {"image_noise": "sweep_image_noise",
                "label_shuffle": "sweep_label_shuffle",
                "target_noise": "sweep_target_noise",
                "uniform_target": "sweep_uniform_target"}[ref_name]
        for r in FIG2_RUNS:
            cp(os.path.join(work, ours, f"training_run{r}",
                            f"training_res_run{r}.csv"),
               os.path.join(cr, ref_name, f"training_res_run{r}.csv"))
    ldir = os.path.join(cr,
                        "perturb_length_experiments_baselineseed1_perturbseed0")
    for L, onsets in LENGTHS_GRID.items():
        for E in onsets:
            cp(os.path.join(work, "lengths", f"random_target_e{E}_l{L}",
                            "training_res.csv"),
               os.path.join(ldir, f"random_target_e{E}_l{L}",
                            "training_res.csv"))
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", help="the round-4 paradigm tree "
                                    "(baseline must exist)")
    ap.add_argument("--mirror", default=None,
                    help="repo-relative dir for the committed CSV mirror")
    ap.add_argument("--skip_sweeps", action="store_true")
    ap.add_argument("--skip_lengths", action="store_true")
    # smoke-scale overrides (CPU debugging against a tiny paradigm tree)
    ap.add_argument("--backbone", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--patience", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--compute_dtype", default=None)
    ap.add_argument("--fig2_runs", default=None,
                    help="comma list overriding the reference run set")
    ap.add_argument("--grid", default=None,
                    help="length:onset,onset;length:... overriding the "
                         "136-condition reference grid")
    args = ap.parse_args(argv)

    global BACKBONE, EPOCHS, PATIENCE, BS, DTYPE, FIG2_RUNS, LENGTHS_GRID
    if args.backbone:
        BACKBONE = args.backbone
    if args.epochs:
        EPOCHS = args.epochs
    if args.patience:
        PATIENCE = args.patience
    if args.batch_size:
        BS = args.batch_size
    if args.compute_dtype:
        DTYPE = args.compute_dtype
    if args.fig2_runs:
        FIG2_RUNS = [int(x) for x in args.fig2_runs.split(",")]
    if args.grid:
        LENGTHS_GRID = {
            int(part.split(":")[0]): [int(x) for x in
                                      part.split(":")[1].split(",")]
            for part in args.grid.split(";")}

    work = os.path.abspath(args.workdir)
    base = os.path.join(work, "baseline")
    if not os.path.exists(os.path.join(base, "training_res.csv")):
        raise SystemExit(f"no baseline under {work} — run "
                         "examples/paradigm_tpu.py first")
    data = {
        "csv_file": os.path.join(work, "spose_train.csv"),
        "img_dir": os.path.join(work, "images"),
        "inference_csv_file": os.path.join(work, "spose_val.csv"),
        "RDM48_triplet_dir": os.path.join(work, "RDM48_triplet.mat"),
    }

    from vit_project_tpu.core.compile_cache import enable_persistent_cache
    print(f"[r5] compile cache: {enable_persistent_cache()}")
    from vit_project_tpu.cli import sweep as sweep_cli, lengths as lengths_cli
    from vit_project_tpu.analysis import figs

    times: dict = {}
    t_all = time.time()

    if not args.skip_sweeps:
        for ref_name, ptype in FIG2_TYPES.items():
            outdir = os.path.join(work, f"sweep_{ref_name}")
            print(f"== fig2 sweep {ref_name} (ours: {ptype}) "
                  f"runs {FIG2_RUNS}", flush=True)
            times[f"sweep_{ref_name}"] = round(
                sweep_type(work, base, data, ptype, outdir, sweep_cli), 1)
            print(f"   wall {times[f'sweep_{ref_name}']}s", flush=True)

    if not args.skip_lengths:
        print("== lengths grid to the full 136-condition reference set",
              flush=True)
        times["lengths"] = drive_lengths(work, base, data,
                                         os.path.join(work, "lengths"),
                                         lengths_cli)

    print("== analyses over the complete tree", flush=True)
    t0 = time.time()
    type_dirs = {"target_noise": os.path.join(work, "sweep_target_noise"),
                 "label_shuffle": os.path.join(work, "sweep_label_shuffle"),
                 "image_noise": os.path.join(work, "sweep_image_noise"),
                 "uniform_target": os.path.join(work, "sweep_uniform_target")}
    f2 = figs.plot_fig2(f"{base}/training_res.csv", type_dirs, FIG2_RUNS,
                        os.path.join(work, "fig2_four_types.png"))
    # the fig4/recovery stage needs a lengths tree: on a --skip_lengths run
    # against a sweeps-only workdir, crashing here would discard the sweep
    # results before the mirror and summary are written
    rec = []
    f4 = None
    if figs.list_length_runs(os.path.join(work, "lengths")):
        f4 = figs.plot_fig4(f"{base}/training_res.csv",
                            os.path.join(work, "lengths"),
                            os.path.join(work, "fig4_recovery_136.png"))
        rec = figs.recovery_table(f"{base}/training_res.csv",
                                  os.path.join(work, "lengths"))
        rec.to_csv(os.path.join(work, "recovery_table_136.csv"), index=False)
    times["analysis"] = round(time.time() - t0, 1)
    print(f"fig2(4 types): {f2}\nfig4(136): {f4}\n"
          f"recovery table: {len(rec)} conditions")

    tn = compare_target_noise(work)
    print(f"target_noise vs 98-run sweep rows: {tn['equal_rows']}/"
          f"{tn['compared']} byte-equal, max loss rel diff "
          f"{tn['max_loss_rel_diff']:.3e}, max rsa abs diff "
          f"{tn['max_rsa_abs_diff']:.3e}")

    n_csv = 0
    if args.mirror:
        n_csv = mirror_tree(work, os.path.abspath(args.mirror))
        for f in ("fig2_four_types.png", "fig4_recovery_136.png",
                  "recovery_table_136.csv"):
            src = os.path.join(work, f)
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(os.path.abspath(args.mirror), f))
        print(f"mirrored {n_csv} CSVs -> {args.mirror}")

    n_dirs = len([d for d in os.listdir(os.path.join(work, "lengths"))
                  if d.startswith("random_target_e")]) \
        if os.path.isdir(os.path.join(work, "lengths")) else 0
    times["total"] = round(time.time() - t_all, 1)
    summary = {"wall_seconds": times, "lengths_dirs": n_dirs,
               "target_noise_vs_sweep": tn, "mirrored_csvs": n_csv,
               "recovery_conditions": len(rec)}
    with open(os.path.join(work, "r5_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if args.mirror:
        shutil.copyfile(os.path.join(work, "r5_summary.json"),
                        os.path.join(os.path.abspath(args.mirror),
                                     "r5_summary.json"))
    print(json.dumps(summary, indent=2))
    print("R5 PARADIGM COMPLETE")
    return summary


if __name__ == "__main__":
    main()
