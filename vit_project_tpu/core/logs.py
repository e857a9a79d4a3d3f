"""Dual file+console logging, format-compatible with the reference logs.

Reference: setup_logger (new_cvpr_train_behavior_things_pipeline.py:51-85) and
setup_main_logger (clip_train_behavior_sweep.py:81-109). Same two-tier scheme:
a per-run logger and an orchestrator ("main") logger.
"""
from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s - %(levelname)s - %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def _is_primary() -> bool:
    try:
        from ..parallel import dist
        return dist.is_primary()
    except Exception:
        return True


def _build(name: str, log_file_path: str) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers = []
    formatter = logging.Formatter(_FORMAT, datefmt=_DATEFMT)

    # the file handler truncates (mode="w") — on a pod only process 0 owns
    # the log file; other processes keep console output only (the reference
    # rank-gates its distributed prints the same way, train_vit_sgd.py:149)
    if _is_primary():
        d = os.path.dirname(log_file_path)
        if d:
            os.makedirs(d, exist_ok=True)
        fh = logging.FileHandler(log_file_path, mode="w")
        fh.setLevel(logging.INFO)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    ch = logging.StreamHandler(sys.stdout)
    ch.setLevel(logging.INFO)
    ch.setFormatter(formatter)
    logger.addHandler(ch)
    return logger


def setup_logger(log_file_path: str) -> logging.Logger:
    """Per-run training logger."""
    return _build("training_logger", log_file_path)


def setup_main_logger(log_file_path: str) -> logging.Logger:
    """Orchestrator logger for multi-run drivers (sweep / lengths)."""
    return _build("main_training_loop", log_file_path)
