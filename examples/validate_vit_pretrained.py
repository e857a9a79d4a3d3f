"""ViT pretrained-weight fidelity validation (the ViT half of parity).

Given a real ViT-B/16 checkpoint — a timm `vit_base_patch16_224` state
dict, or one of the reference's full training checkpoints
(`checkpoint_epoch_{N:03d}.pth`, train_vit_sgd.py:92-123 — the
model_state_dict is unwrapped and DDP 'module.' prefixes stripped) —
converts it to our param tree (models/convert.py
vit_params_from_timm_state_dict), runs THINGS-48 RSA via the timm
forward_features contract (CLS pooling, measure_single_epoch_perturbation_
effect.py:309-322), and checks the score against the reference's value for
that checkpoint. Default expectation: the reference's epoch-0 RSA of 0.341
(/root/reference/Data/vit_results/rsa_results_final.csv:2); pass --expect
for any other row of that CSV.

Usage:
  python examples/validate_vit_pretrained.py \
      --weights /path/to/checkpoint_epoch_000.pth \
      --things_csv /path/to/things48.csv \
      --things_img_dir /path/to/Things1854 \
      --things_rdm /path/to/RDM48_triplet.mat \
      [--expect 0.341] [--tol 0.10]

Exits 0 if |rsa - expect| <= tol, 1 otherwise. Mirrors
examples/validate_pretrained.py (the CLIP half); both fire the moment real
artifacts land in the environment.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_vit_weights(path: str) -> dict:
    """Torch checkpoint -> flat timm-style {name: ndarray}. Unwraps the
    reference's full-checkpoint container (model under 'model_state_dict'
    next to optimizer/scheduler/scaler state) and strips DDP 'module.'
    prefixes before flattening tensor leaves."""
    import torch
    try:
        obj = torch.jit.load(path, map_location="cpu").eval().state_dict()
    except RuntimeError:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in obj.items()}
    return {k: np.asarray(v.detach().float().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in sd.items()
            if hasattr(v, "detach") or isinstance(v, np.ndarray)}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", required=True,
                    help="timm state dict or reference full checkpoint .pth")
    ap.add_argument("--things_csv", required=True)
    ap.add_argument("--things_img_dir", required=True)
    ap.add_argument("--things_rdm", required=True)
    ap.add_argument("--backbone", default="vit_base_patch16_224")
    ap.add_argument("--expect", type=float, default=0.341,
                    help="reference RSA for this checkpoint "
                         "(rsa_results_final.csv; 0.341 = epoch 0)")
    ap.add_argument("--tol", type=float, default=0.10)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp
    import scipy.io

    from vit_project_tpu.cli.vit_measure import load_things_for_vit
    from vit_project_tpu.core.configs import ViTTrainConfig
    from vit_project_tpu.models import convert, vit as vvit
    from vit_project_tpu.train.vit_loop import ViTTrainer
    import jax

    sd = load_vit_weights(args.weights)
    params = convert.vit_params_from_timm_state_dict(sd)
    n_blocks = len(params["blocks"])
    print(f"Loaded ViT weights: {n_blocks} blocks, "
          f"width {params['patch_b'].shape[0]}")
    vit_cfg = vvit.VIT_CONFIGS[args.backbone]
    width = int(params["patch_b"].shape[0])
    in_rows = int(params["patch_w"].shape[0])
    if (n_blocks, width, in_rows) != (vit_cfg.layers, vit_cfg.width,
                                      vit_cfg.patch * vit_cfg.patch * 3):
        print(f"FAIL: checkpoint geometry (blocks={n_blocks}, width={width}, "
              f"patch_rows={in_rows}) does not match {args.backbone} "
              f"(layers={vit_cfg.layers}, width={vit_cfg.width}, "
              f"patch_rows={vit_cfg.patch * vit_cfg.patch * 3})")
        return 1
    params = jax.tree_util.tree_map(jnp.asarray, params)

    trainer = ViTTrainer(vit_cfg, ViTTrainConfig(
        batch_size=args.batch_size, compute_dtype="bfloat16",
        image_size=vit_cfg.image_size,
        num_classes=vit_cfg.num_classes or 1000))
    _, things_images = load_things_for_vit(args.things_csv,
                                           args.things_img_dir,
                                           size=vit_cfg.image_size)
    reference_rdm = np.asarray(
        scipy.io.loadmat(args.things_rdm)["RDM48_triplet"], np.float32)
    rho, p = trainer.compute_rsa_score(params, things_images, reference_rdm,
                                       batch_size=args.batch_size)
    rho = float(rho)
    print(f"THINGS-48 RSA of converted checkpoint: rho={rho:.4f} "
          f"(p={float(p):.2e}); reference value: {args.expect}")

    if abs(rho - args.expect) <= args.tol:
        print(f"PASS: within ±{args.tol} of the reference value.")
        return 0
    print(f"FAIL: |{rho:.4f} - {args.expect}| > {args.tol} — check the timm "
          "conversion (tests/test_clip_conversion.py TestTimmConversion), "
          "forward_features pooling, and THINGS preprocessing.")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
