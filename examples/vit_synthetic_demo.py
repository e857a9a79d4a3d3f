"""End-to-end drive of the ViT ImageNet family on synthetic data.

The ViT-side counterpart of synthetic_demo.py: generates a tiny ImageFolder
and a THINGS-48-like evaluation set, then runs the three ViT CLIs exactly as
a user would (reference pipeline: train_vit_sgd.py -> rsa_results_final.csv
-> measure_single_epoch_perturbation_effect.py):

1. `cli.vit_train`   — supervised training with per-epoch full-state
                       checkpoints + training_metrics.csv (auto-resume on
                       re-invocation);
2. `cli.vit_rsa_eval` — per-checkpoint THINGS-48 RSA -> the enriched
                       rsa_results.csv schema;
3. `cli.vit_measure` — the (perturb_epoch x perturbation_type) single-epoch
                       measurement grid -> perturbation_effects.csv (the
                       fig2 ViT input, analysis.figs.vit_type_deltas).

Run:  python examples/vit_synthetic_demo.py /tmp/vit_demo_out
(~2-4 min on one chip; runs on CPU too.)
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _check(cond, msg=""):
    """Validation that must abort under `python -O` too (a plain assert
    compiles away and the demo would print success while checking nothing —
    same rule as examples/paradigm_tpu.py)."""
    if not cond:
        raise AssertionError(repr(msg) if msg != "" else "demo check failed")

def make_data(root: str):
    from PIL import Image
    import pandas as pd
    import scipy.io

    rs = np.random.RandomState(0)
    for split, n in (("train", 24), ("val", 8)):
        for cls in ("apple", "banana", "cherry"):
            d = os.path.join(root, "imagenet", split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                Image.fromarray(rs.randint(0, 255, (48, 48, 3),
                                           dtype=np.uint8)).save(
                    os.path.join(d, f"{i}.png"))

    img_dir = os.path.join(root, "things48")
    os.makedirs(img_dir, exist_ok=True)
    names = []
    for i in range(48):
        n = f"v{i:02d}.png"
        Image.fromarray(rs.randint(0, 255, (48, 48, 3),
                                   dtype=np.uint8)).save(
            os.path.join(img_dir, n))
        names.append(n)
    things_csv = os.path.join(root, "things48.csv")
    pd.DataFrame({"image_name": names}).to_csv(things_csv, index=False)
    rdm = rs.rand(48, 48)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    rdm_path = os.path.join(root, "rdm.mat")
    scipy.io.savemat(rdm_path, {"RDM48_triplet": rdm})
    return {"data_path": os.path.join(root, "imagenet"),
            "things_csv": things_csv, "things_img_dir": img_dir,
            "things_rdm_path": rdm_path}


def main(out_root: str) -> int:
    import pandas as pd

    from vit_project_tpu.cli import vit_measure, vit_rsa_eval, vit_train

    os.makedirs(out_root, exist_ok=True)
    paths = make_data(out_root)
    run_dir = os.path.join(out_root, "vit_run")

    print("== 1/3 vit_train (3 epochs, test-tiny backbone)", flush=True)
    vit_train.main([
        "--data_path", paths["data_path"], "--output_dir", run_dir,
        "--backbone", "test-tiny", "--epochs", "3", "--batch_size", "8",
        "--lr", "0.01", "--warmup_epochs", "1", "--num_workers", "2",
        "--compute_dtype", "float32"])
    met = pd.read_csv(os.path.join(run_dir, "training_metrics.csv"))
    _check(list(met["epoch"]) == [0, 1, 2], met)
    print(met.to_string(index=False), flush=True)

    print("== 2/3 vit_rsa_eval (per-checkpoint THINGS-48 RSA)", flush=True)
    rsa_csv = os.path.join(out_root, "rsa_results.csv")
    vit_rsa_eval.main([
        "--checkpoint_dir", run_dir, "--output_csv", rsa_csv,
        "--backbone", "test-tiny", "--compute_dtype", "float32",
        "--things_csv", paths["things_csv"],
        "--things_img_dir", paths["things_img_dir"],
        "--things_rdm_path", paths["things_rdm_path"]])
    rsa = pd.read_csv(rsa_csv)
    _check(list(rsa.columns) == ["checkpoint", "epoch", "train_loss",
                                  "val_loss", "val_acc", "rsa_score"], rsa)
    _check(len(rsa) == 3)

    print("== 3/3 vit_measure (2 epochs x 2 perturbation types)", flush=True)
    eff_csv = os.path.join(out_root, "perturbation_effects.csv")
    vit_measure.main([
        "--baseline_checkpoint_dir", run_dir,
        "--baseline_metrics_csv", rsa_csv,
        "--data_path", paths["data_path"], "--output_csv", eff_csv,
        "--things_csv", paths["things_csv"],
        "--things_img_dir", paths["things_img_dir"],
        "--things_rdm_path", paths["things_rdm_path"],
        "--perturbation_types", "gaussian", "label_shuffle",
        "--perturb_epochs", "1", "2",
        "--batch_size", "8", "--num_workers", "2",
        "--backbone", "test-tiny", "--compute_dtype", "float32",
        "--total_epochs", "4", "--warmup_epochs", "1", "--lr", "0.01"])
    eff = pd.read_csv(eff_csv)
    _check(set(eff["perturbation_type"]) == {"gaussian", "label_shuffle"})
    _check(np.allclose(eff["delta_loss"],
                       eff["perturbed_loss"] - eff["baseline_loss"]))

    from vit_project_tpu.analysis import figs
    print(figs.vit_type_deltas(eff_csv).to_string(index=False), flush=True)
    print(f"\nViT demo complete. Artifacts under {out_root}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1
                          else "./vit_demo_out"))
