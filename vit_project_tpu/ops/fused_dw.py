"""Fused dW + bias-grad: one streaming pass over the cotangent.

Round-3's step trace (BENCHLOG.md) shows a 24.4 ms/step bandwidth-bound
"reduces/converts" bucket for ViT-B/16 b256: bias gradients (sum of the
cotangent over rows) and LN stat reductions, each a separate loop nest
re-reading [B*S, D_out] tensors that the dW matmuls ALSO stream. XLA does
not fuse a row-sum epilogue into a dot, so every bias grad pays a full
extra HBM pass over its cotangent (~8 GB/step across the 48 biases).

This kernel computes dW = x^T @ g AND db = sum_rows(g) in ONE K-streaming
pass: the grid walks row blocks of (x, g); each step issues a
[D_in, bN] x [bN, D_out] MXU dot into a resident f32 VMEM accumulator and
folds the block's row-sum into db while g is already in VMEM — the row-sum
becomes free bandwidth-wise. Sequential TPU grid + constant out index_map
keep the accumulators resident across steps (same revisit pattern as
ops/layernorm.py's partial reductions).

Wired as an opt-in custom VJP over ops.nn.dense (set_dense_dw_fused /
ViTTrainConfig.fused_dw): the forward and the dx matmul stay on XLA's path
(their fusion groups already run at 91%/94% of peak); only (dW, db)
production moves into the kernel. The reference has no native kernels of
its own (SURVEY.md section 2) — its bias grads ride cuBLAS beta-accumulation
inside torch's backward; this is the TPU-native equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nn import round_up_multiple as _round_up

# VMEM working-set budget for picking the row-block size (bytes); the chip
# has ~16 MB/core — leave headroom for Mosaic's own buffers
_VMEM_BUDGET = 13 * 1024 * 1024


def _dw_db_kernel(x_ref, g_ref, dw_ref, db_ref):
    # grid is (jo, ji, i): the dW COLUMN tile is the OUTER dim so the db
    # block (indexed (0, jo)) keeps one block index for the entire
    # (ji, i) sub-sweep — on compiled TPU an output block is flushed when
    # its index changes and is NOT re-fetched on a later revisit, so a
    # non-consecutive revisit (e.g. db under a (ji, jo, i) order with
    # ji > 1) would overwrite the accumulated values with stale buffer
    # contents. With jo outer, both outputs only ever see consecutive
    # revisits.
    ji = pl.program_id(1)                             # dW row-tile index
    i = pl.program_id(2)                              # K-block index (inner)
    xb = x_ref[...]                                   # [bN, bDin]
    gb = g_ref[...]                                   # [bN, bDout]
    part = jax.lax.dot_general(
        xb, gb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [bDin, bDout]
    dbp = jnp.sum(gb.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        dw_ref[...] += part

    # db is independent of the dW row tile — accumulate once (ji == 0); the
    # (0, jo) block revisits untouched on later ji sweeps
    @pl.when(jnp.logical_and(ji == 0, i == 0))
    def _db_init():
        db_ref[...] = jnp.zeros_like(db_ref)
        db_ref[0:1, :] = dbp

    @pl.when(jnp.logical_and(ji == 0, i > 0))
    def _db_acc():
        db_ref[0:1, :] += dbp


def _tile_candidates(dp: int) -> list[int]:
    """Multiples of 128 that divide dp, descending, capped at 2048."""
    return [t for t in range(min(dp, 2048), 127, -128)
            if t % 128 == 0 and dp % t == 0]


def _pick_tiles(d_in: int, d_out: int, itemsize: int
                ) -> tuple[int, int, int]:
    """(bDin, bDout, bN) maximizing the dW tile then the K depth, under the
    VMEM budget with EVERYTHING double-buffered (Mosaic allocates two
    copies of streamed inputs AND of revisited outputs — measured: a full
    [3072,768] f32 accumulator alone exceeds the 16 MB scoped limit)."""
    best = None
    for bdi in _tile_candidates(d_in):
        for bdo in _tile_candidates(d_out):
            for bn in (512, 256, 128):
                need = (2 * bdi * bdo * 4
                        + bdi * bdo * 4   # the dot's result buffer ("part")
                                          # lives in VMEM before the +=
                        + 2 * bn * (bdi + bdo) * itemsize
                        + 2 * 8 * bdo * 4)
                if need > _VMEM_BUDGET:
                    continue
                key = (bdi * bdo, bn)
                if best is None or key > best[0]:
                    best = (key, (bdi, bdo, bn))
                break
    if best is None:
        return 128, 128, 128
    return best[1]


def dw_db_pallas(x2d: jax.Array, g2d: jax.Array,
                 interpret: bool | None = None
                 ) -> tuple[jax.Array, jax.Array]:
    """x2d: [N, D_in], g2d: [N, D_out] -> (dW [D_in, D_out] f32,
    db [D_out] f32). Zero-pads rows/lanes to tile multiples (zero rows
    contribute nothing to either sum). Grid: (row tiles, col tiles,
    K blocks) with K innermost — each dW tile accumulates in a resident
    f32 VMEM block across its K sweep."""
    N, Din = x2d.shape
    _, Dout = g2d.shape
    Dip, Dop = _round_up(Din, 128), _round_up(Dout, 128)
    bDin, bDout, bN = _pick_tiles(Dip, Dop, x2d.dtype.itemsize)
    Np = _round_up(N, bN)
    x2d = jnp.pad(x2d, ((0, Np - N), (0, Dip - Din)))
    g2d = jnp.pad(g2d, ((0, Np - N), (0, Dop - Dout)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (Dop // bDout, Dip // bDin, Np // bN)
    dw, db = pl.pallas_call(
        _dw_db_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bN, bDin), lambda jo, ji, i: (i, ji),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bN, bDout), lambda jo, ji, i: (i, jo),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bDin, bDout), lambda jo, ji, i: (ji, jo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bDout), lambda jo, ji, i: (0, jo),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Dip, Dop), jnp.float32),
            jax.ShapeDtypeStruct((8, Dop), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Dip * Dop,
            bytes_accessed=(Np * (Dip + Dop) * x2d.dtype.itemsize
                            + Dip * Dop * 4),
            transcendentals=0,
        ),
    )(x2d, g2d)
    return dw[:Din, :Dout], db[0, :Dout]


@jax.custom_vjp
def dense_dw_fused(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """x @ w + b with the (dW, db) production fused into one Pallas pass.

    Forward is identical to ops.nn.dense (XLA keeps its epilogue fusions);
    only the backward's weight/bias gradients change producer."""
    y = jnp.dot(x, w.astype(x.dtype))
    return y + b.astype(y.dtype)


def _fwd(x, w, b):
    # b rides along only for its dtype (a bare np.dtype is not a JAX type)
    return dense_dw_fused(x, w, b), (x, w, b)


def _bwd(res, g):
    x, w, b = res
    b_dtype = b.dtype
    # dx stays an XLA dot (the dx bucket already runs at ~94% of peak)
    dx = jax.lax.dot_general(
        g, w.astype(g.dtype),
        (((g.ndim - 1,), (1,)), ((), ())))
    x2d = x.reshape(-1, x.shape[-1])
    g2d = g.reshape(-1, g.shape[-1])
    dw, db = dw_db_pallas(x2d, g2d)
    return dx, dw.astype(w.dtype), db.astype(b_dtype)


dense_dw_fused.defvjp(_fwd, _bwd)
