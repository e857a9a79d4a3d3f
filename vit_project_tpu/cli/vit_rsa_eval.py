"""Per-epoch RSA evaluation over a directory of ViT baseline checkpoints.

Produces the enriched metrics CSV
`checkpoint,epoch,train_loss,val_loss,val_acc,rsa_score`
(the reference ships this as Data/vit_results/rsa_results_final.csv but commits no
script that writes it — SURVEY.md section 0; the measurement grid consumes its
rsa_score column as the baseline).
"""
from __future__ import annotations

import argparse
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ckpt import vit_ckpt
from ..core.configs import ViTTrainConfig
from ..models import vit as vvit
from ..train.vit_loop import ViTTrainer
from .vit_measure import load_things_for_vit


def list_epoch_checkpoints(ckpt_dir: str) -> list[tuple[int, str]]:
    """Every per-epoch checkpoint in either container format (.pth pickle or
    pod-written .orbax dir), one entry per epoch — vit_ckpt.epoch_checkpoint
    arbitrates when both formats exist."""
    epochs = set()
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint_epoch_(\d+)\.(pth|orbax)", name)
        if m:
            epochs.add(int(m.group(1)))
    return [(e, vit_ckpt.epoch_checkpoint(ckpt_dir, e))
            for e in sorted(epochs)]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Per-epoch ViT RSA over baseline "
                                            "checkpoints (TPU-native)")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--output_csv", required=True)
    p.add_argument("--things_csv", required=True)
    p.add_argument("--things_img_dir", required=True)
    p.add_argument("--things_rdm_path", required=True)
    p.add_argument("--backbone", default="vit_base_patch16_224")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--compute_dtype", default="bfloat16")
    return p


def main(argv=None):
    import scipy.io
    from ..parallel import dist
    args = build_parser().parse_args(argv)
    # pod-ready: compute_rsa_score embeds a strided shard per process and
    # gathers in dataset order; ranks must be real before the gate below
    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # forks re-use the epoch-scan compile
    dist.setup_distributed()
    vit_cfg = vvit.VIT_CONFIGS[args.backbone]
    cfg = ViTTrainConfig(batch_size=args.batch_size,
                         compute_dtype=args.compute_dtype,
                         image_size=vit_cfg.image_size,
                         num_classes=vit_cfg.num_classes or 1000)
    trainer = ViTTrainer(vit_cfg, cfg)
    _, things_images = load_things_for_vit(args.things_csv,
                                           args.things_img_dir,
                                           size=vit_cfg.image_size)
    reference_rdm = np.asarray(
        scipy.io.loadmat(args.things_rdm_path)["RDM48_triplet"], np.float32)

    checkpoints = list_epoch_checkpoints(args.checkpoint_dir)
    if not checkpoints:
        # a wrong --checkpoint_dir would otherwise yield a headerless empty
        # CSV and a success message; the downstream measurement grid then
        # dies far from the actual mistake
        raise SystemExit(f"no checkpoint_epoch_* entries found in "
                         f"{args.checkpoint_dir}")
    rows = []
    for epoch, path in checkpoints:
        ckpt = vit_ckpt.load_checkpoint(path)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        rho, _ = trainer.compute_rsa_score(params, things_images,
                                           reference_rdm,
                                           batch_size=args.batch_size)
        rows.append({
            "checkpoint": f"checkpoint_epoch_{epoch:03d}",
            "epoch": epoch,
            "train_loss": ckpt.get("train_loss"),
            "val_loss": ckpt.get("val_loss"),
            "val_acc": ckpt.get("val_acc"),
            "rsa_score": rho,
        })
        print(f"epoch {epoch}: rsa={rho:.4f}")

    df = pd.DataFrame(rows)
    if dist.is_primary():  # one CSV writer on a pod
        d = os.path.dirname(args.output_csv)
        if d:
            os.makedirs(d, exist_ok=True)
        df.to_csv(args.output_csv, index=False)
        print(f"Wrote {args.output_csv}")
    return df


if __name__ == "__main__":
    main()
