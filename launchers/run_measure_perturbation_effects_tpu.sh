#!/bin/bash
# ViT single-epoch perturbation measurement grid on a TPU VM
# (replaces run_measure_perturbation_effects.slurm).
#
# Usage:
#   CKPT=/path/to/baseline_ckpts METRICS=/path/to/rsa_results.csv \
#   DATA=/path/to/imagenet THINGS=/path/to/things OUT=/path/out.csv \
#   bash launchers/run_measure_perturbation_effects_tpu.sh
set -euo pipefail

CKPT="${CKPT:?baseline checkpoint dir}"
METRICS="${METRICS:?baseline metrics csv with rsa_score column}"
DATA="${DATA:?imagenet path}"
THINGS="${THINGS:?things dir containing things.csv, images/, RDM48_triplet.mat}"
OUT="${OUT:?output csv path}"

exec python -m vit_project_tpu.cli.vit_measure \
  --baseline_checkpoint_dir "$CKPT" \
  --baseline_metrics_csv "$METRICS" \
  --data_path "$DATA" \
  --output_csv "$OUT" \
  --things_csv "$THINGS/things.csv" \
  --things_img_dir "$THINGS/images" \
  --things_rdm_path "$THINGS/RDM48_triplet.mat" \
  --perturbation_types gaussian uniform_gray label_shuffle target_noise \
  --perturb_epochs 5 10 15 16 20 25 30 35 45 70 98 \
  --batch_size "${BATCH:-512}" \
  --num_workers "${WORKERS:-16}"
