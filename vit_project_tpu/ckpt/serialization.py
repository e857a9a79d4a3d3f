"""Checkpoint serialization.

Pytrees of jax/numpy arrays <-> single files. File names keep the reference's
layout (`epoch{N}_dora_params.pth`, `epoch{N}_random_states.pth`,
`dataset_split_indices.pth`, `checkpoint_epoch_{N:03d}.pth` — SURVEY.md
section 2.3) so directory structures remain drop-in compatible with the analysis
tooling. The general container is a pickle of numpy pytrees (save/load); the
DoRA adapter files specifically are REAL torch.save archives (save_torch) so
the reference's torch.load path consumes them unchanged, and load_flat reads
either container.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

_WARNED_NO_TORCH = False


def _to_host(obj):
    """Recursively convert jax arrays to numpy for pickling."""
    import jax
    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        out = [_to_host(v) for v in obj]
        if hasattr(obj, "_fields"):  # NamedTuple (e.g. optax states)
            return t(*out)
        return t(out)
    return obj


def reap_stale_temps(path: str) -> None:
    """Delete abandoned `<path>.tmp.*` files older than an hour.

    Only stale temps are reaped (a live racing writer's in-progress temp
    must survive), and the target path is glob-escaped so metacharacters in
    checkpoint names cannot widen the pattern. Shared by save() and any
    other writer using the pid-unique temp + os.replace pattern (e.g. the
    vit_ckpt 'latest' byte copy)."""
    import glob
    import time
    for stale in glob.glob(glob.escape(path) + ".tmp.*"):
        try:
            if time.time() - os.path.getmtime(stale) > 3600:
                os.unlink(stale)
        except OSError:
            pass


def save(path: str, tree) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    # pid-unique temp name: two writers racing on the same target (e.g. a
    # mis-gated multi-process caller on a shared FS) each complete their own
    # file and the atomic replace keeps whichever finished last INTACT,
    # instead of interleaving into one corrupt .tmp.
    reap_stale_temps(path)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump(_to_host(tree), f, protocol=4)
        os.replace(tmp, path)  # atomic: a crash never leaves a truncated file
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_torch(path: str, flat: dict) -> None:
    """Write a flat {name: array} mapping as a torch.save archive.

    Used for the files the reference ecosystem consumes directly — above all
    `epoch{N}_dora_params.pth`, which the reference loads with plain
    torch.load + load_state_dict(strict=False) (new_cvpr...pipeline.py:
    1156-1171). Values become real torch tensors so torch.load works even
    with weights_only=True. Same atomic pid-unique temp + os.replace
    discipline as save(). Dtypes torch can't view (e.g. ml_dtypes bfloat16
    numpy) are widened to float32.

    torch is optional: on hosts without it (the core deps are torch-free)
    this degrades to the pickle container, which load_flat reads back
    identically — only direct consumption by the reference's torch.load
    needs the torch archive, and that requires torch anyway."""
    try:
        import torch
    except ImportError:
        global _WARNED_NO_TORCH
        if not _WARNED_NO_TORCH:
            import logging
            logging.getLogger("vit_project_tpu").warning(
                "torch unavailable: writing %s (and subsequent adapter "
                "checkpoints) in the native pickle container instead of a "
                "torch archive; load_flat reads both.", path)
            _WARNED_NO_TORCH = True
        save(path, dict(flat))
        _mark_pickle_container_dir(path)
        return
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    out = {}
    for k, v in flat.items():
        a = np.ascontiguousarray(np.asarray(_to_host(v)))
        if not a.flags.writeable:  # torch refuses read-only views
            a = a.copy()
        try:
            out[k] = torch.from_numpy(a)
        except TypeError:
            out[k] = torch.from_numpy(a.astype(np.float32))
    reap_stale_temps(path)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        torch.save(out, tmp)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _mark_pickle_container_dir(path: str) -> None:
    """Drop a one-time README next to a .pth written as a pickle container
    (torch-less hosts): if the tree is later copied to a torch host, the
    reference's torch.load fails opaquely, and the once-per-process warning
    on the WRITING host is long gone. The marker names the conversion path."""
    d = os.path.dirname(path) or "."
    marker = os.path.join(d, "PICKLE_CONTAINER.README")
    if os.path.exists(marker):
        return
    try:
        with open(marker, "w") as f:
            f.write(
                "The .pth files in this directory were written WITHOUT torch "
                "installed, so they are Python pickle containers, not torch "
                "archives. vit_project_tpu's ckpt.serialization.load_flat "
                "reads them directly; for the reference's torch.load, "
                "convert on a torch host:\n"
                "  from vit_project_tpu.ckpt import serialization as s\n"
                "  s.save_torch(path, s.load_flat(path))\n")
    except OSError:
        pass  # best-effort: a read-only or vanished dir must not fail saves


# torch's pre-1.6 (non-zip) serialization starts with this pickled magic
# number; pickle.load on such a file "succeeds" and returns the int, which
# would otherwise surface as a misleading "expected a flat dict, got int"
_TORCH_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


def load_flat(path: str) -> dict:
    """Load a flat {name: ndarray} mapping from any of the containers this
    path may hold: this framework's pickle (older runs), a torch>=1.6 zip
    archive (save_torch output and reference-side checkpoints alike), or a
    legacy pre-1.6 torch archive."""
    import zipfile
    if zipfile.is_zipfile(path):  # torch>=1.6 archives are zip containers
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
    else:
        try:
            with open(path, "rb") as f:
                obj = pickle.load(f)
        except Exception as e:
            # NOT a torch zip and NOT our pickle: a truncated/corrupt file.
            # Surface the real diagnosis instead of falling through to an
            # opaque torch error (or ModuleNotFoundError on torch-less hosts).
            raise ValueError(
                f"{path}: not a torch archive (zip or legacy) and unreadable "
                f"as a pickle checkpoint — likely truncated or corrupt "
                f"({e!r})") from e
        # the type check keeps array-valued pickles (e.g. a bare ndarray)
        # from turning `==` into an ambiguous-truth ValueError and lets them
        # reach the flat-dict diagnosis below
        if isinstance(obj, int) and obj == _TORCH_LEGACY_MAGIC:
            # legacy torch format: a magic-number pickle followed by more
            # pickles + raw storage bytes — only torch.load parses the rest
            try:
                import torch
            except ImportError as e:
                raise ValueError(
                    f"{path}: a legacy (pre-1.6) torch archive — reading it "
                    "requires torch, which is not installed on this host. "
                    "Re-save it with torch>=1.6 (zip container) or this "
                    "framework's pickle container") from e
            obj = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(obj, dict):
        raise TypeError(f"{path}: expected a flat dict, got {type(obj)}")
    return {k: np.asarray(v.detach().float().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in obj.items()}


# -- pod-scale (multi-host) checkpointing -------------------------------------
# The pickle container above is single-host: np.asarray on a multi-host global
# array is not addressable from one process. On a TPU pod, use the orbax-backed
# sharded writer: every host writes only its own array shards (OCDBT/tensorstore
# under the hood), and restore re-assembles global arrays against a sharding
# template. Replaces the reference's rank-0-only torch.save
# (train_vit_sgd.py:92-123), which on a pod would have to all-gather first.

def save_sharded(path: str, tree) -> None:
    """Write `tree` as an orbax sharded checkpoint DIRECTORY at `path`.

    Works single-host too (useful for very large trees); multi-host requires
    jax.distributed to be initialized (parallel/dist.py)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_sharded(path: str, template=None):
    """Restore an orbax checkpoint. `template` (a pytree of arrays or
    jax.ShapeDtypeStruct with .sharding) controls the on-device placement of
    the restored arrays — pass the current state tree to restore shard-for-
    shard on a pod; None restores host numpy arrays."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(path)
    import jax

    def _abstract(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=getattr(x, "sharding", None))
        return x  # scalars / strings restore as-is

    abstract = jax.tree_util.tree_map(_abstract, template)
    return ckptr.restore(path, abstract)


def tree_equal(a, b) -> bool:
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))
