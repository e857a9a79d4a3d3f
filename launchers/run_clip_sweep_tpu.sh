#!/bin/bash
# CLIP-HBA single-epoch perturbation sweep on a TPU VM.
# The 98-run sweep that took the reference ~64 h on a lab GPU
# (main_training_log evidence, SURVEY.md section 6).
#
# Usage:
#   THINGS=/path/to/things BASELINE=/path/to/baseline_artifacts \
#   OUT=/path/to/sweep_out WEIGHTS=/path/to/ViT-L-14.pt VOCAB=/path/bpe.txt.gz \
#   bash launchers/run_clip_sweep_tpu.sh
set -euo pipefail

THINGS="${THINGS:?things data dir}"
BASELINE="${BASELINE:?baseline artifact dir (dora_params/, random_states/)}"
OUT="${OUT:?output base dir}"

exec python -m vit_project_tpu.cli.sweep \
  --csv_file "$THINGS/spose_embedding66d_rescaled_1806train.csv" \
  --img_dir "$THINGS/Things1854" \
  --inference_csv_file "$THINGS/spose_embedding66d_rescaled_48val_reordered.csv" \
  --RDM48_triplet_dir "$THINGS/RDM48_triplet.mat" \
  --clip_weights "${WEIGHTS:-}" \
  --bpe_vocab "${VOCAB:-}" \
  --perturb_type "${PERTURB_TYPE:-random_target}" \
  --perturb_seed "${PERTURB_SEED:-42}" \
  --baseline_dora_directory "$BASELINE/dora_params" \
  --baseline_random_state_path "$BASELINE/random_states" \
  --baseline_split_indices_path "$BASELINE/random_states/dataset_split_indices.pth" \
  --output_base_directory "$OUT" \
  --training_order "${ORDER:-range:1-98}"
