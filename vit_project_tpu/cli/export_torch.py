"""Export trained checkpoints back to the torch ecosystem.

The forward converters (models/convert.py) bring OpenAI CLIP .pt archives and
timm state dicts INTO this framework; this CLI is the return path, so a run
finished here drops straight back into the reference's tooling:

- CLIP mode: base CLIP weights + a trained `epoch{N}_dora_params.pth` ->
  adapters baked into the out_proj weights (adapters.dora.bake) -> an
  OpenAI-CLIP-format state dict that `clip.build_model` (the external package
  the reference imports, new_cvpr_train_behavior_things_pipeline.py:21,251-265)
  loads directly.
- ViT mode: one of our `checkpoint_epoch_{N:03d}.pth` / `.orbax` full-state
  checkpoints (ckpt/vit_ckpt.py) -> a timm-format state dict that
  `timm.create_model('vit_base_patch16_224').load_state_dict` (the model the
  reference trains, train_vit_sgd.py:283) accepts.

  python -m vit_project_tpu.cli.export_torch clip \
      --clip_weights ViT-L-14.pt --dora_checkpoint .../epoch98_dora_params.pth \
      --vision_layers 2 --transformer_layers 1 --rank 32 --out clip_hba.pth
  python -m vit_project_tpu.cli.export_torch vit \
      --checkpoint runs/vit/checkpoint_epoch_099.pth \
      --backbone vit_base_patch16_224 --out vit_b16_timm.pth
"""
from __future__ import annotations

import argparse


def export_clip(args) -> str:
    import jax

    from ..adapters import dora as adora
    from ..models import convert as vconvert

    sd = vconvert.load_torch_state_dict(args.clip_weights)
    params, cfg = vconvert.clip_params_from_state_dict(sd)
    spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers,
                           args.vision_layers, args.transformer_layers)
    # init then strict=False-overlay, exactly like the training-side restore
    trainable, static, _ = adora.apply_dora(params, spec, r=args.rank,
                                            key=jax.random.PRNGKey(0))
    from ..ckpt import serialization as ser
    flat = ser.load_flat(args.dora_checkpoint)
    loaded = adora.from_reference_names(flat, spec)
    missing = [f"{t}:{i}" for t, idxs in spec.items() for i in idxs
               if int(i) not in {int(k) for k in loaded.get(t, {})}]
    if missing:
        raise SystemExit(
            f"--dora_checkpoint is missing adapters for blocks {missing}; "
            "check --vision_layers/--transformer_layers/--rank match the run")
    # ...and the converse: adapter entries in the checkpoint OUTSIDE the
    # requested spec would be silently dropped from the bake — a numerically
    # wrong export. The checkpoint defines the run's true layer counts.
    extra = sorted(adora.checkpoint_module_paths(flat)
                   - adora.spec_module_paths(spec))
    if extra:
        raise SystemExit(
            f"--dora_checkpoint contains trained adapters not covered by "
            f"--vision_layers {args.vision_layers} / --transformer_layers "
            f"{args.transformer_layers}: {extra}. Raise the flags to match "
            "the run so every trained adapter is baked.")
    trainable = adora.merge_loaded(trainable, loaded)
    baked = adora.bake(params, trainable, static, alpha=args.alpha,
                       r=args.rank)
    out_sd = vconvert.clip_state_dict_from_params(baked, cfg)
    vconvert.save_torch_state_dict(args.out, out_sd)
    return args.out


def export_vit(args) -> str:
    from ..ckpt import vit_ckpt
    from ..models import convert as vconvert
    from ..models.vit import VIT_CONFIGS

    if args.backbone not in VIT_CONFIGS:
        raise SystemExit(f"unknown --backbone {args.backbone!r}; one of "
                         f"{sorted(VIT_CONFIGS)}")
    cfg = VIT_CONFIGS[args.backbone]
    ckpt = vit_ckpt.load_checkpoint(args.checkpoint)
    sd = vconvert.timm_state_dict_from_vit_params(ckpt["params"],
                                                  patch=cfg.patch)
    vconvert.save_torch_state_dict(args.out, sd)
    return args.out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="mode", required=True)

    pc = sub.add_parser("clip", help="bake DoRA adapters into base CLIP "
                                     "weights, export OpenAI-format .pth")
    pc.add_argument("--clip_weights", required=True,
                    help="base OpenAI CLIP .pt (jit archive or state dict)")
    pc.add_argument("--dora_checkpoint", required=True,
                    help="epoch{N}_dora_params.pth from a training run")
    pc.add_argument("--vision_layers", type=int, default=2,
                    help="adapted vision blocks (reference default 2)")
    pc.add_argument("--transformer_layers", type=int, default=1,
                    help="adapted text blocks (reference default 1)")
    pc.add_argument("--rank", type=int, default=32)
    pc.add_argument("--alpha", type=int, default=16)
    pc.add_argument("--out", required=True, help="output .pth path")

    pv = sub.add_parser("vit", help="export a ViT full-state checkpoint as a "
                                    "timm state dict .pth")
    pv.add_argument("--checkpoint", required=True,
                    help="checkpoint_epoch_{N:03d}.pth or .orbax")
    pv.add_argument("--backbone", default="vit_base_patch16_224",
                    help="model config name (see models.vit.VIT_CONFIGS)")
    pv.add_argument("--out", required=True, help="output .pth path")

    args = ap.parse_args(argv)
    out = export_clip(args) if args.mode == "clip" else export_vit(args)
    print(f"Exported: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
