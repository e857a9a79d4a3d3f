#!/bin/bash
# ViT-B/16 ImageNet training on a TPU VM.
#
# TPU-native replacement for the reference's SLURM launcher
# (run_vit_sgd_training.slurm: sbatch + singularity + torchrun over 2xA100):
# one process drives all local chips through the data mesh, so there is no
# torchrun equivalent to configure. On a multi-host pod slice, run this same
# script on every host (e.g. `gcloud compute tpus tpu-vm ssh --worker=all`);
# jax.distributed picks up the pod topology from the TPU runtime environment.
#
# Usage: DATA=/path/to/imagenet OUT=/path/to/out bash launchers/run_vit_training_tpu.sh
set -euo pipefail

DATA="${DATA:?set DATA=/path/to/imagenet (train/ + val/ ImageFolders)}"
OUT="${OUT:?set OUT=/path/to/output_dir}"
# reference config: batch 256/GPU x 2 GPUs (run_vit_sgd_training.slurm:53-61)
GLOBAL_BATCH="${GLOBAL_BATCH:-512}"
EPOCHS="${EPOCHS:-100}"
LR="${LR:-0.1}"
WORKERS="${WORKERS:-16}"

# optional: stage the dataset onto local SSD first (the reference rsyncs
# ImageNet to /tmp on the compute node for the same reason)
if [[ -n "${STAGE_TO:-}" ]]; then
  mkdir -p "$STAGE_TO"
  rsync -a --info=progress2 "$DATA/" "$STAGE_TO/"
  DATA="$STAGE_TO"
fi

mkdir -p "$OUT"
exec python -m vit_project_tpu.cli.vit_train \
  --data_path "$DATA" \
  --output_dir "$OUT" \
  --batch_size "$GLOBAL_BATCH" \
  --epochs "$EPOCHS" \
  --lr "$LR" \
  --momentum 0.9 \
  --weight_decay 1e-4 \
  --warmup_epochs 5 \
  --num_workers "$WORKERS" \
  2>&1 | tee -a "$OUT/launch_log.txt"
