"""End-to-end demo on synthetic data — a one-command tour of the framework.

Generates a miniature THINGS-like dataset (no downloads needed), then runs:
  1. CLIP-HBA baseline training (tiny backbone) with per-epoch RSA + checkpoints
  2. a 2-run single-epoch perturbation sweep forked from the baseline
  3. a variable-length condition (random_target_e2_l2)
  4. the fig1/fig3/fig4 analyses over the produced artifacts

Usage:  python examples/synthetic_demo.py [workdir]
Runtime: a few minutes on one TPU chip (or CPU).

With real data + pretrained weights, the same commands scale up by swapping
--backbone ViT-L/14, --clip_weights and the real THINGS paths (see README.md).
"""
from __future__ import annotations

import os
import sys

import numpy as np

# allow running from anywhere without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_things(root: str, n_train: int = 60, n_val: int = 48):
    from PIL import Image
    import pandas as pd
    import scipy.io

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    names = []
    for i in range(max(n_train, n_val)):
        n = f"object_{i:03d}.png"
        Image.fromarray(rs.randint(0, 255, (64, 64, 3),
                                   dtype=np.uint8)).save(
            os.path.join(img_dir, n))
        names.append(n)

    df = pd.DataFrame({"image_name": names[:n_train]})
    for j in range(66):
        df[f"dim{j}"] = (rs.rand(n_train) * 2).astype(np.float32)
    df.to_csv(os.path.join(root, "spose_train.csv"))

    inf = pd.DataFrame({"image_name": names[:n_val]})
    for j in range(66):
        inf[f"dim{j}"] = (rs.rand(n_val) * 2).astype(np.float32)
    inf.to_csv(os.path.join(root, "spose_val.csv"))

    rdm = rs.rand(n_val, n_val)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    scipy.io.savemat(os.path.join(root, "RDM48_triplet.mat"),
                     {"RDM48_triplet": rdm})
    return {
        "csv_file": os.path.join(root, "spose_train.csv"),
        "img_dir": img_dir,
        "inference_csv_file": os.path.join(root, "spose_val.csv"),
        "RDM48_triplet_dir": os.path.join(root, "RDM48_triplet.mat"),
    }


def main():
    work = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "./demo_out")
    os.makedirs(work, exist_ok=True)
    print(f"== synthetic THINGS dataset -> {work}")
    data = make_synthetic_things(work)

    from vit_project_tpu.train.clip_loop import run_behavioral_training
    from vit_project_tpu.cli import sweep as sweep_cli, lengths as lengths_cli
    from vit_project_tpu.analysis import figs

    base = os.path.join(work, "baseline")
    common = dict(data, backbone="test-tiny", epochs=4, batch_size=16,
                  train_portion=0.8, lr=3e-4, logger=None,
                  early_stopping_patience=20, random_seed=1, vision_layers=1,
                  transformer_layers=1, rank=4, criterion="mse", cuda=0,
                  perturb_distribution="target", perturb_seed=7,
                  compute_dtype="float32")

    print("== 1/4 baseline training (4 epochs)")
    run_behavioral_training({
        **common, "perturb_type": "baseline", "perturb_length": 0,
        "training_run": 0,
        "checkpoint_path": f"{base}/model.ckpt",
        "training_res_path": f"{base}/training_res.csv",
        "dora_parameters_path": f"{base}/dora_params",
        "random_state_path": f"{base}/random_states"})

    print("== 2/4 single-epoch sweep (runs 2 and 3)")
    sweep_cli.main([
        "--csv_file", data["csv_file"], "--img_dir", data["img_dir"],
        "--inference_csv_file", data["inference_csv_file"],
        "--RDM48_triplet_dir", data["RDM48_triplet_dir"],
        "--backbone", "test-tiny", "--epochs", "4", "--batch_size", "16",
        "--random_seed", "1", "--vision_layers", "1",
        "--transformer_layers", "1", "--rank", "4",
        "--perturb_type", "random_target", "--perturb_seed", "7",
        "--baseline_dora_directory", f"{base}/dora_params",
        "--baseline_random_state_path", f"{base}/random_states",
        "--baseline_split_indices_path",
        f"{base}/random_states/dataset_split_indices.pth",
        "--output_base_directory", os.path.join(work, "sweep"),
        "--training_order", "2,3", "--compute_dtype", "float32"])

    print("== 3/4 variable-length condition (onset 2, length 2)")
    lengths_cli.main([
        "--perturb_type", "random_target", "--perturb_epoch", "2",
        "--perturb_length", "2", "--output_dir", "random_target_e2_l2",
        "--epochs", "4", "--batch_size", "16",
        "--csv_file", data["csv_file"], "--img_dir", data["img_dir"],
        "--inference_csv_file", data["inference_csv_file"],
        "--RDM48_triplet_dir", data["RDM48_triplet_dir"],
        "--backbone", "test-tiny", "--random_seed", "1", "--perturb_seed", "7",
        "--vision_layers", "1", "--transformer_layers", "1", "--rank", "4",
        "--baseline_dora_directory", f"{base}/dora_params",
        "--baseline_random_state_path", f"{base}/random_states",
        "--baseline_split_indices_path",
        f"{base}/random_states/dataset_split_indices.pth",
        "--output_base_directory", os.path.join(work, "lengths"),
        "--compute_dtype", "float32"])

    print("== 4/4 analyses")
    f1 = figs.plot_fig1(f"{base}/training_res.csv",
                        os.path.join(work, "fig1_trajectory.png"))
    f3 = figs.plot_fig3(f"{base}/training_res.csv",
                        os.path.join(work, "sweep"),
                        os.path.join(work, "fig3_sweep_deltas.png"))
    f4 = figs.plot_fig4(f"{base}/training_res.csv",
                        os.path.join(work, "lengths"),
                        os.path.join(work, "fig4_recovery.png"))
    rec = figs.recovery_table(f"{base}/training_res.csv",
                              os.path.join(work, "lengths"))
    print(f"figures: {f1}, {f3}, {f4}")
    print("recovery table:")
    print(rec.to_string(index=False))
    print(f"\nDemo complete. Artifacts under {work}")


if __name__ == "__main__":
    main()
