"""Pretrained-weight + tokenizer fidelity validation.

Given a real OpenAI CLIP ViT-L/14 checkpoint and the CLIP BPE vocab, runs the
un-adapted CLIP-HBA head on the 48 THINGS inference images and checks that
behavioral RSA lands near the reference's epoch-1 value of 0.455
(/root/reference/Data/clip_results/baseline_clip_results_seed1.csv:2). A
large miss means the weight conversion, the tokenizer, or the prompt head
drifted from OpenAI CLIP numerics.

Usage:
  python examples/validate_pretrained.py \
      --clip_weights /path/to/ViT-L-14.pt \
      --bpe_vocab /path/to/bpe_simple_vocab_16e6.txt.gz \
      --inference_csv_file /path/to/spose_embedding66d_rescaled_48val_reordered.csv \
      --img_dir /path/to/Things1854 \
      --rdm /path/to/RDM48_triplet.mat \
      [--expect 0.455] [--tol 0.10]

Exits 0 if |rsa - expect| <= tol, 1 otherwise.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clip_weights", required=True)
    ap.add_argument("--bpe_vocab", required=True)
    ap.add_argument("--inference_csv_file", required=True)
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--rdm", required=True)
    ap.add_argument("--expect", type=float, default=0.455,
                    help="reference epoch-1 RSA (baseline_clip_results_seed1"
                         ".csv:2)")
    ap.add_argument("--tol", type=float, default=0.10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vit_project_tpu.data import things as dthings
    from vit_project_tpu.data.spose66 import classnames66
    from vit_project_tpu.models import clip as vclip
    from vit_project_tpu.models import convert, tokenizer as vtok
    from vit_project_tpu.ops import rsa as vrsa

    tok = vtok.default_tokenizer(args.bpe_vocab)
    if isinstance(tok, vtok.HashTokenizer):
        print(f"FAIL: BPE vocab not found at {args.bpe_vocab} — refusing to "
              "validate with the hash fallback tokenizer.")
        return 1

    sd = convert.load_torch_state_dict(args.clip_weights)
    params, clip_cfg = convert.clip_params_from_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    print(f"Loaded CLIP weights: visual {clip_cfg.visual.layers} layers, "
          f"text {clip_cfg.text.layers} layers")

    prompts = vtok.tokenize(classnames66, tokenizer=tok,
                            context_length=clip_cfg.text.context_length)

    inference = dthings.ThingsInferenceDataset(
        args.inference_csv_file, args.img_dir, args.rdm)
    reference_rdm = inference.load_reference_rdm()

    @jax.jit
    def infer(params, images_u8):
        images = dthings.normalize_uint8(images_u8)
        return vclip.clip_hba_forward(params, images, prompts, clip_cfg,
                                      deterministic=True,
                                      compute_dtype=jnp.bfloat16)

    emb = infer(params, jnp.asarray(inference.images_u8))
    rho, p, _ = vrsa.behavioral_rsa(emb, jnp.asarray(reference_rdm))
    rho = float(rho)
    print(f"epoch-0 behavioral RSA of pretrained CLIP-HBA: rho={rho:.4f} "
          f"(p={float(p):.2e}); reference epoch-1 value: {args.expect}")

    if abs(rho - args.expect) <= args.tol:
        print(f"PASS: within ±{args.tol} of the reference value.")
        return 0
    print(f"FAIL: |{rho:.4f} - {args.expect}| > {args.tol} — check weight "
          "conversion (tests/test_clip_conversion.py), tokenizer, and "
          "prompt-head semantics.")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
