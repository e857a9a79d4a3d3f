"""ctypes bindings for the native image-decode core (native/fastimage.cpp).

The native library is optional: `available()` reports whether libfastimage.so is
built (run `make -C native`); callers fall back to the PIL path otherwise. The
native path is deterministic under the same (seed, epoch, index) contract as the
Python loader but is NOT byte-identical to PIL (different bilinear filter taps),
so a run must stick to one decoder — the loaders pin the choice at construction.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

MODE_RESIZE = 0          # THINGS: Resize((size, size))
MODE_RRC_FLIP = 1        # ImageNet train: RandomResizedCrop + h-flip
MODE_CENTER_CROP = 2     # ImageNet val: shorter-side resize + center crop

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libfastimage.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get("FASTIMAGE_SO", _lib_path())
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.fi_transform.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8)]
    lib.fi_transform.restype = ctypes.c_int
    lib.fi_transform_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    lib.fi_transform_batch.restype = ctypes.c_int
    if hasattr(lib, "fi_transform_mem_batch"):  # fi_version >= 2
        lib.fi_transform_mem_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.fi_transform_mem_batch.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def mem_available() -> bool:
    """True when the library also exposes the memory-decode API
    (fi_version >= 2) — the packed-dataset loaders must check THIS at
    construction so a stale v1 .so fails fast, not at the first batch."""
    lib = _load()
    return lib is not None and hasattr(lib, "fi_transform_mem_batch")


def transform(path: str, mode: int, out_h: int, out_w: int,
              resize_to: int = 256, seed: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastimage.so not built (make -C native)")
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.fi_transform(
        path.encode(), mode, out_h, out_w, resize_to, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"fastimage failed ({rc}) on {path}")
    return out


def transform_batch(paths: list[str], mode: int, out_h: int, out_w: int,
                    seeds, resize_to: int = 256,
                    threads: int = 16) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastimage.so not built (make -C native)")
    n = len(paths)
    seeds = np.ascontiguousarray(np.asarray(seeds, np.uint64))
    if len(seeds) != n:
        # the native loop indexes seeds[i] for every path — a short array
        # would be an out-of-bounds read inside libfastimage, not a Python
        # error
        raise ValueError(f"seeds ({len(seeds)}) must match paths ({n})")
    if mode == MODE_CENTER_CROP and max(out_h, out_w) > resize_to:
        # mode 2 center-crops the resize_to-short-side image; a larger crop
        # would memcpy from negative offsets in the C++ core
        raise ValueError(f"center crop {out_h}x{out_w} exceeds resize_to="
                         f"{resize_to}; pass a proportionally larger "
                         f"resize_to")
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.fi_transform_batch(
        arr, n, mode, out_h, out_w, resize_to,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if failed:
        raise IOError(f"fastimage: {failed}/{n} images failed to decode")
    return out


def transform_mem_batch(buffers, mode: int, out_h: int, out_w: int,
                        seeds, resize_to: int = 256,
                        threads: int = 16) -> np.ndarray:
    """Like transform_batch, but decodes ENCODED BYTES (memoryview/bytes of
    JPEG/PNG) instead of file paths — the packed-dataset hot path: records
    feed straight from the mmapped shard with zero per-image file opens."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libfastimage.so not built (make -C native)")
    if not hasattr(lib, "fi_transform_mem_batch"):
        raise RuntimeError("libfastimage.so predates the memory-decode API "
                           "(rebuild: make -C native)")
    n = len(buffers)
    seeds = np.ascontiguousarray(np.asarray(seeds, np.uint64))
    if len(seeds) != n:
        raise ValueError(f"seeds ({len(seeds)}) must match buffers ({n})")
    if mode == MODE_CENTER_CROP and max(out_h, out_w) > resize_to:
        raise ValueError(f"center crop {out_h}x{out_w} exceeds resize_to="
                         f"{resize_to}; pass a proportionally larger "
                         f"resize_to")
    # materialize each record as a contiguous uint8 view; keep the np arrays
    # alive for the duration of the native call
    views = [np.frombuffer(b, np.uint8) for b in buffers]
    ptrs = (ctypes.c_void_p * n)(
        *[v.ctypes.data_as(ctypes.c_void_p).value for v in views])
    lens = (ctypes.c_size_t * n)(*[v.size for v in views])
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    failed = lib.fi_transform_mem_batch(
        ptrs, lens, n, mode, out_h, out_w, resize_to,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if failed:
        raise IOError(f"fastimage: {failed}/{n} buffers failed to decode")
    return out
