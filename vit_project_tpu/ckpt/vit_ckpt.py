"""ViT ImageNet full-state checkpointing.

Reference contract (save_checkpoint, train_vit_sgd.py:92-123): every epoch write
`checkpoint_epoch_{N:03d}.pth` + `checkpoint_latest.pth` containing model,
optimizer, scheduler (and GradScaler — not needed in bf16) state plus metrics, and
append one row to `training_metrics.csv`. Auto-resume scans for
`checkpoint_latest.pth` (ref :320-335).

Pod scale: with `sharded=True` (default when jax.process_count() > 1) the
array state goes through the orbax sharded writer (every host writes its own
shards — serialization.save_sharded) into `checkpoint_epoch_{N:03d}.orbax/`
+ `checkpoint_latest.orbax/`, replacing the reference's rank-0-only
torch.save which would have to all-gather a pod-sharded state first.
"""
from __future__ import annotations

import os

from . import serialization as ser
from ..core import csvio


def _is_multiprocess() -> bool:
    import jax
    return jax.process_count() > 1


def _primary() -> bool:
    from ..parallel import dist
    return dist.is_primary()


def save_checkpoint(epoch: int, params, opt_state, sched_state: dict,
                    train_loss: float, val_loss: float, val_acc: float,
                    output_dir: str, logger=None,
                    sharded: bool | None = None) -> str:
    os.makedirs(output_dir, exist_ok=True)
    if sharded is None:
        sharded = _is_multiprocess()
    ckpt = {
        "epoch": epoch,
        "params": params,
        "opt_state": opt_state,
        "scheduler_state": sched_state,
        "train_loss": train_loss,
        "val_loss": val_loss,
        "val_acc": val_acc,
    }
    if sharded:
        # collective: EVERY process must reach this call (each host writes
        # its own shards; orbax barriers internally) — do not gate on rank
        path = os.path.join(output_dir, f"checkpoint_epoch_{epoch:03d}.orbax")
        ser.save_sharded(path, ckpt)
        # 'latest' is a tiny POINTER to the epoch dir, not a second full
        # collective serialization (which would double the per-epoch d2h
        # transfer and shard writes); atomic tmp+rename, primary-only
        if _primary():
            ptr = os.path.join(output_dir, "checkpoint_latest.orbax.ptr")
            tmp = f"{ptr}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(os.path.basename(path))
            os.replace(tmp, ptr)
        wrote = True
    else:
        path = os.path.join(output_dir, f"checkpoint_epoch_{epoch:03d}.pth")
        wrote = _primary()
        if wrote:
            ser.save(path, ckpt)
            # 'latest' is a byte copy of the epoch file, not a second full
            # serialization (halves the per-epoch d2h transfer + write);
            # temp + rename keeps the replace atomic like ser.save
            import shutil
            latest = os.path.join(output_dir, "checkpoint_latest.pth")
            ser.reap_stale_temps(latest)
            tmp = f"{latest}.tmp.{os.getpid()}"
            try:
                shutil.copyfile(path, tmp)
                os.replace(tmp, latest)
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise
    if logger and wrote:  # non-writers must not claim a save they skipped
        logger.info(f"Saved checkpoint: {os.path.basename(path)}")
    # metrics CSV is tiny host data: process 0 only (ref rank-0 gate :92)
    if _primary():
        csvio.append_vit_row(os.path.join(output_dir, "training_metrics.csv"),
                             epoch, train_loss, val_loss, val_acc)
    return path


def load_checkpoint(path: str, template=None):
    if path.endswith(".orbax"):
        return ser.load_sharded(path, template)
    return ser.load(path)


def prune_checkpoints(output_dir: str, keep_last: int, current_epoch: int,
                      logger=None) -> list[str]:
    """Delete per-epoch checkpoints older than the last `keep_last` epochs
    (both container formats). OPT-IN retention for pure-training runs — the
    experimental paradigms need every epoch (sweep forks load epoch N-1,
    vit_measure restores arbitrary epochs), so the default everywhere is
    keep-all. 'latest' (byte copy / pointer) is never touched, and the
    pointer's target epoch is always within the kept window. Primary-only
    (deleting a FINISHED old epoch's files is not a collective)."""
    removed: list[str] = []
    if keep_last <= 0 or not _primary():
        return removed
    import re
    import shutil
    pat = re.compile(r"^checkpoint_epoch_(\d{3,})\.(pth|orbax)$")
    cutoff = current_epoch - keep_last
    for name in os.listdir(output_dir):
        m = pat.match(name)
        if not m or int(m.group(1)) > cutoff:
            continue
        p = os.path.join(output_dir, name)
        try:
            shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
            removed.append(name)
        except OSError:
            pass  # a vanished/locked old file must not kill training
    if removed and logger:
        logger.info(f"Pruned {len(removed)} old checkpoint(s) "
                    f"(keep_last={keep_last})")
    return removed


def epoch_checkpoint(output_dir: str, epoch: int) -> str | None:
    """Resolve `checkpoint_epoch_{N:03d}` in either container format — the
    single-host .pth pickle or the pod-written .orbax directory — picking the
    newer by mtime when both exist (same rule as latest_checkpoint), so
    measurement runs can fork from checkpoints written by pod baselines."""
    cands = []
    for ext in (".orbax", ".pth"):
        p = os.path.join(output_dir, f"checkpoint_epoch_{epoch:03d}{ext}")
        if os.path.exists(p):
            cands.append((os.path.getmtime(p), p))
    return max(cands)[1] if cands else None


def latest_checkpoint(output_dir: str) -> str | None:
    """When both formats exist (e.g. a pod run followed by a single-host
    continuation of the same output_dir), pick the most recently written one
    by mtime — a fixed format preference would silently resume from stale
    state. The orbax 'latest' is a pointer file naming the newest epoch dir
    (one collective write per epoch, not two); legacy trees with a full
    checkpoint_latest.orbax dir still resolve."""
    cands = []
    ptr = os.path.join(output_dir, "checkpoint_latest.orbax.ptr")
    if os.path.exists(ptr):
        with open(ptr) as f:
            target = os.path.join(output_dir, f.read().strip())
        if os.path.exists(target):
            cands.append((os.path.getmtime(ptr), target))
    for name in ("checkpoint_latest.orbax", "checkpoint_latest.pth"):
        p = os.path.join(output_dir, name)
        if os.path.exists(p):
            cands.append((os.path.getmtime(p), p))
    return max(cands)[1] if cands else None
