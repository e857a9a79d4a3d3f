"""ViT ImageNet full-state checkpointing.

Reference contract (save_checkpoint, train_vit_sgd.py:92-123): every epoch write
`checkpoint_epoch_{N:03d}.pth` + `checkpoint_latest.pth` containing model,
optimizer, scheduler (and GradScaler — not needed in bf16) state plus metrics, and
append one row to `training_metrics.csv`. Auto-resume scans for
`checkpoint_latest.pth` (ref :320-335).
"""
from __future__ import annotations

import os

from . import serialization as ser
from ..core import csvio


def save_checkpoint(epoch: int, params, opt_state, sched_state: dict,
                    train_loss: float, val_loss: float, val_acc: float,
                    output_dir: str, logger=None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    ckpt = {
        "epoch": epoch,
        "params": params,
        "opt_state": opt_state,
        "scheduler_state": sched_state,
        "train_loss": train_loss,
        "val_loss": val_loss,
        "val_acc": val_acc,
    }
    path = os.path.join(output_dir, f"checkpoint_epoch_{epoch:03d}.pth")
    ser.save(path, ckpt)
    ser.save(os.path.join(output_dir, "checkpoint_latest.pth"), ckpt)
    if logger:
        logger.info(f"Saved checkpoint: epoch_{epoch:03d}.pth")
    csvio.append_vit_row(os.path.join(output_dir, "training_metrics.csv"),
                         epoch, train_loss, val_loss, val_acc)
    return path


def load_checkpoint(path: str):
    return ser.load(path)


def latest_checkpoint(output_dir: str) -> str | None:
    p = os.path.join(output_dir, "checkpoint_latest.pth")
    return p if os.path.exists(p) else None
