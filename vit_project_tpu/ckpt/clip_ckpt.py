"""CLIP-HBA checkpointing: per-epoch DoRA params + "random states".

Mirrors the reference's two per-epoch files (SURVEY.md section 5):
- `epoch{N}_dora_params.pth` — adapter params under reference module-path names
  (save_dora_parameters, new_cvpr...pipeline.py:657-693); N is 1-indexed.
- `epoch{N}_random_states.pth` — everything needed for exact fork/resume. The
  reference saves 5 stateful RNG streams + optimizer state (ref :696-728); here
  that collapses to {epoch, optimizer state pytree, data_seed, rng keys} since all
  JAX randomness is key-derived.
"""
from __future__ import annotations

import os

from . import serialization as ser
from ..adapters import dora as adora


def save_dora_parameters(trainable: dict, dora_parameters_path: str,
                         epoch0: int, logger=None) -> str:
    """Save adapter params for epoch `epoch0` (0-indexed) as epoch{N+1} file.

    The container is a real torch.save archive (ser.save_torch) so the file
    is directly loadable by the reference's torch.load path — these adapter
    files are the artifact reference-side tooling consumes."""
    os.makedirs(dora_parameters_path, exist_ok=True)
    path = os.path.join(dora_parameters_path,
                        f"epoch{epoch0 + 1}_dora_params.pth")
    ser.save_torch(path, adora.to_reference_names(trainable))
    return path


def load_dora_parameters(path: str, trainable: dict, spec: dict, logger=None):
    """strict=False load: overlay whatever adapter entries the file has.

    Accepts both containers (ser.load_flat): torch archives (current writer,
    and checkpoints produced by the reference itself) and this framework's
    older pickle files."""
    flat = ser.load_flat(path)
    loaded = adora.from_reference_names(flat, spec)
    return adora.merge_loaded(trainable, loaded)


def save_random_states(optimizer_state, epoch0: int, random_state_path: str,
                       data_seed: int, rng_keys: dict, logger=None) -> str:
    log = logger.info if logger else print
    os.makedirs(random_state_path, exist_ok=True)
    path = os.path.join(random_state_path,
                        f"epoch{epoch0 + 1}_random_states.pth")
    ser.save(path, {
        "epoch": epoch0,
        "optimizer_state": optimizer_state,
        "data_seed": int(data_seed),
        "rng_keys": rng_keys,
    })
    log(f"Random states saved: {path}")
    return path


def load_random_states(random_state_path: str, epoch1: int, logger=None):
    """Load the epoch{epoch1} (1-indexed) random-state file, or None.

    Mirrors reference load_random_states (new_cvpr...pipeline.py:88-134) which
    warns and returns False on a missing file.
    """
    log = logger.info if logger else print
    path = os.path.join(random_state_path, f"epoch{epoch1}_random_states.pth")
    if not os.path.exists(path):
        log(f"Warning: Random state checkpoint not found: {path}")
        return None
    state = ser.load(path)
    log(f"Random states loaded from: {path}")
    return state
