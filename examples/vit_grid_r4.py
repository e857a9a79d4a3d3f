"""ViT single-epoch measurement grid at reference cardinality (round-4 item 4).

The reference measures 4 perturbation types x 11 epochs = 44 cells, one
perturbed epoch each from baseline checkpoints
(measure_single_epoch_perturbation_effect.py:581-586: types {gaussian,
uniform_gray, label_shuffle, target_noise}, a fixed epoch list), writing ONE
perturbation_effects.csv. This drives the same grid on the chip at real
model shapes — ViT-B/16, batch 256, bf16 — against a synthetic ImageFolder
(zero-egress box; Δloss/ΔRSA values are scientifically void but the 44-cell
machinery, checkpoint restores, and CSV contract are the real thing):

  1. vit_train: N-epoch baseline with per-epoch full-state checkpoints;
  2. vit_rsa_eval: per-checkpoint THINGS-48 RSA -> the enriched CSV schema;
  3. vit_measure: all 4 types x epochs 1..11 (44 cells) -> the fig2 input.

Usage (chip):  python examples/vit_grid_r4.py /tmp/vit_grid_r4
CPU smoke:     PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
               python examples/vit_grid_r4.py /tmp/vit_grid_smoke \
                 --backbone test-tiny --epochs 4 --grid_epochs 1,2,3 \
                 --n_per_class 6 --classes 3 --batch_size 8 --px 48 \
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

REF_TYPES = ["gaussian", "uniform_gray", "label_shuffle", "target_noise"]


def make_data(root: str, classes: int, n_per_class: int, n_val: int, px: int):
    """Synthetic ImageFolder + THINGS-48 set. Idempotent: the RandomState
    stream is consumed unconditionally so re-runs regenerate byte-identical
    data (same contract as paradigm_tpu.make_synthetic_things)."""
    from PIL import Image
    import pandas as pd
    import scipy.io

    rs = np.random.RandomState(0)
    t0 = time.time()
    for split, n in (("train", n_per_class), ("val", n_val)):
        for c in range(classes):
            d = os.path.join(root, "imagenet", split, f"class_{c:03d}")
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                arr = rs.randint(0, 255, (px, px, 3), dtype=np.uint8)
                # JPEG, not PNG: random-noise PNGs are incompressible and
                # zlib-inflate at ~25 ms each — the whole epoch becomes
                # decode-bound at <30 img/s. Noise JPEGs decode ~10x faster
                # (and exercise the native decode path real ImageNet uses).
                p = os.path.join(d, f"{i:05d}.jpg")
                if not os.path.exists(p):
                    Image.fromarray(arr).save(p, quality=87)

    img_dir = os.path.join(root, "things48")
    os.makedirs(img_dir, exist_ok=True)
    names = []
    for i in range(48):
        n = f"v{i:02d}.png"
        arr = rs.randint(0, 255, (px, px, 3), dtype=np.uint8)
        p = os.path.join(img_dir, n)
        if not os.path.exists(p):
            Image.fromarray(arr).save(p)
        names.append(n)
    things_csv = os.path.join(root, "things48.csv")
    if not os.path.exists(things_csv):
        pd.DataFrame({"image_name": names}).to_csv(things_csv, index=False)
    rdm = rs.rand(48, 48)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    rdm_path = os.path.join(root, "rdm.mat")
    if not os.path.exists(rdm_path):
        scipy.io.savemat(rdm_path, {"RDM48_triplet": rdm})
    print(f"   data ready in {time.time() - t0:.0f}s "
          f"({classes * n_per_class} train / {classes * n_val} val images)")
    return {"data_path": os.path.join(root, "imagenet"),
            "things_csv": things_csv, "things_img_dir": img_dir,
            "things_rdm_path": rdm_path}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--backbone", default="vit_base_patch16_224")
    ap.add_argument("--epochs", type=int, default=12,
                    help="baseline length; must exceed max grid epoch")
    ap.add_argument("--grid_epochs", default="1,2,3,4,5,6,7,8,9,10,11",
                    help="perturb epochs (reference runs 11 of them)")
    ap.add_argument("--types", default=",".join(REF_TYPES))
    ap.add_argument("--classes", type=int, default=32)
    ap.add_argument("--n_per_class", type=int, default=400)
    ap.add_argument("--n_val_per_class", type=int, default=50)
    ap.add_argument("--px", type=int, default=192,
                    help="source image side (loaders crop/resize to the "
                         "model input)")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--warmup_epochs", type=int, default=2)
    ap.add_argument("--num_workers", type=int, default=2)
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args(argv)

    import pandas as pd
    from vit_project_tpu.cli import vit_measure, vit_rsa_eval, vit_train
    from vit_project_tpu.core.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    work = os.path.abspath(args.workdir)
    os.makedirs(work, exist_ok=True)
    grid_epochs = [int(x) for x in args.grid_epochs.split(",") if x.strip()]
    types = [t for t in args.types.split(",") if t.strip()]
    if max(grid_epochs) >= args.epochs:
        raise SystemExit(f"--epochs {args.epochs} must exceed the largest "
                         f"grid epoch {max(grid_epochs)}")
    walls = {}

    print(f"== data: synthetic ImageFolder ({args.classes} classes)")
    paths = make_data(work, args.classes, args.n_per_class,
                      args.n_val_per_class, args.px)
    run_dir = os.path.join(work, "vit_run")

    print(f"== 1/3 vit_train ({args.epochs} epochs, {args.backbone}, "
          f"batch {args.batch_size})", flush=True)
    t0 = time.time()
    vit_train.main([
        "--data_path", paths["data_path"], "--output_dir", run_dir,
        "--backbone", args.backbone, "--epochs", str(args.epochs),
        "--batch_size", str(args.batch_size), "--lr", str(args.lr),
        "--warmup_epochs", str(args.warmup_epochs),
        "--num_workers", str(args.num_workers),
        "--use_native_loader",
        "--compute_dtype", args.compute_dtype])
    walls["train"] = round(time.time() - t0, 1)
    met = pd.read_csv(os.path.join(run_dir, "training_metrics.csv"))
    if list(met["epoch"]) != list(range(args.epochs)):
        raise AssertionError(f"baseline epochs: {list(met['epoch'])}")
    print(f"   baseline wall {walls['train']}s "
          f"({args.epochs} epochs)", flush=True)

    print("== 2/3 vit_rsa_eval (per-checkpoint THINGS-48 RSA)", flush=True)
    t0 = time.time()
    rsa_csv = os.path.join(work, "rsa_results.csv")
    vit_rsa_eval.main([
        "--checkpoint_dir", run_dir, "--output_csv", rsa_csv,
        "--backbone", args.backbone, "--compute_dtype", args.compute_dtype,
        "--things_csv", paths["things_csv"],
        "--things_img_dir", paths["things_img_dir"],
        "--things_rdm_path", paths["things_rdm_path"]])
    walls["rsa_eval"] = round(time.time() - t0, 1)

    n_cells = len(types) * len(grid_epochs)
    print(f"== 3/3 vit_measure grid: {len(types)} types x "
          f"{len(grid_epochs)} epochs = {n_cells} cells "
          f"(reference: 44 cells on 2xA100)", flush=True)
    t0 = time.time()
    eff_csv = os.path.join(work, "perturbation_effects.csv")
    vit_measure.main([
        "--baseline_checkpoint_dir", run_dir,
        "--baseline_metrics_csv", rsa_csv,
        "--data_path", paths["data_path"], "--output_csv", eff_csv,
        "--things_csv", paths["things_csv"],
        "--things_img_dir", paths["things_img_dir"],
        "--things_rdm_path", paths["things_rdm_path"],
        "--perturbation_types"] + types + [
        "--perturb_epochs"] + [str(e) for e in grid_epochs] + [
        "--batch_size", str(args.batch_size),
        "--num_workers", str(args.num_workers), "--use_native_loader",
        "--backbone", args.backbone, "--compute_dtype", args.compute_dtype,
        "--total_epochs", str(args.epochs),
        "--warmup_epochs", str(args.warmup_epochs), "--lr", str(args.lr)])
    walls["measure_grid"] = round(time.time() - t0, 1)

    eff = pd.read_csv(eff_csv)
    if len(eff) != n_cells:
        raise AssertionError(f"grid CSV has {len(eff)} rows, want {n_cells}")
    if set(eff["perturbation_type"]) != set(types):
        raise AssertionError(sorted(set(eff["perturbation_type"])))
    if not np.allclose(eff["delta_loss"],
                       eff["perturbed_loss"] - eff["baseline_loss"]):
        raise AssertionError("delta_loss inconsistent")

    from vit_project_tpu.analysis import figs
    print(figs.vit_type_deltas(eff_csv).to_string(index=False), flush=True)
    summary = {"cells": n_cells, "types": types,
               "grid_epochs": grid_epochs, "backbone": args.backbone,
               "walls_s": walls,
               "per_cell_s": round(walls["measure_grid"] / n_cells, 1)}
    with open(os.path.join(work, "grid_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"\nViT grid complete ({n_cells} cells). Artifacts under {work}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
