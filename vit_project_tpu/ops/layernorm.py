"""Fused LayerNorm with a hand-written Pallas VJP.

XLA's autodiff of LayerNorm re-reads the input several times on the backward
pass (recompute xhat, two row reductions for dx, plus full-tensor reductions
for dscale/dbias). This kernel does the whole backward in ONE pass over the
[rows, D] tensor per grid block, emitting dx plus per-block partial
dscale/dbias that XLA sums afterwards (a [n_blocks, D] reduction — tiny).
The forward stores only (mean, rstd) row stats as extra residuals; x itself
is the transformer residual stream and is alive anyway.

Replaces the torch LayerNorm inside the reference's external CLIP/timm models
(SURVEY.md section 2: the reference has no native kernels of its own; this is
the TPU-native equivalent of cuDNN's fused LN). BENCHLOG.md round-1 ablation
bounded total LN cost at ~20 ms/step for ViT-B/16 b256 with a fused VJP named
as the next lever.

MEASURED RESULT (round 2, v5e, ViT-B/16 b256): wiring this into every block
LN made the step SLOWER — 220 -> 261 ms/step. The pallas_call boundary stops
XLA from fusing the LN into the neighboring residual-add/matmul fusions, and
that lost fusion costs more than the one-pass backward saves. Kept as a
tested opt-in (and as the kernel-authoring pattern for row-stat + partial-
reduction outputs); ops.nn.layer_norm stays on the XLA path. See BENCHLOG.md
'Rejected experiments'.

Mosaic layout notes: row stats are stored [Np, 1] f32 (block (R, 1) — a
lane-1 column is allowed when it equals the full array dim); the partial
dscale/dbias live in an [8-padded n_blocks, D] array with an (8, D) block
revisited by 8 consecutive programs, each writing its own row (sequential TPU
grid => no copy-in/out between same-block steps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .nn import round_up_multiple as _round_up  # noqa: E402


def _ln_fwd_kernel(x_ref, sc_ref, bi_ref, y_ref, mu_ref, rs_ref, *,
                   eps: float, n_rows: int, R: int):
    b = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)                      # [R, D]
    # mask padded tail rows: unspecified VMEM bits must not produce nan/inf
    # stats that the backward would replay
    rmask = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + b * R) < n_rows
    x = jnp.where(rmask, x, 0.0)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xc * rstd) * sc_ref[...].astype(jnp.float32) \
        + bi_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rs_ref[...] = rstd


def _ln_bwd_kernel(x_ref, sc_ref, mu_ref, rs_ref, dy_ref, dx_ref, dsc_ref,
                   dbi_ref, *, n_rows: int, R: int):
    b = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)                      # [R, D]
    dy = dy_ref[...].astype(jnp.float32)
    rmask = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + b * R) < n_rows
    x = jnp.where(rmask, x, 0.0)
    dy = jnp.where(rmask, dy, 0.0)
    mu = mu_ref[...]                                        # [R, 1]
    rstd = rs_ref[...]
    xhat = (x - mu) * rstd
    g = dy * sc_ref[...].astype(jnp.float32)
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[...] = ((g - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)
    # one partial row per program inside the revisited (8, D) block
    dsc_ref[pl.ds(b % 8, 1)] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbi_ref[pl.ds(b % 8, 1)] = jnp.sum(dy, axis=0, keepdims=True)


@functools.lru_cache(maxsize=None)
def _ln_calls(N: int, D: int, dtype_name: str, eps: float, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    R = 256                                   # rows per grid block
    Np = _round_up(N, R)
    n_b = Np // R
    n_b8 = _round_up(n_b, 8)
    xspec = pl.BlockSpec((R, D), lambda b: (b, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((8, D), lambda b: (b // 8, 0),
                         memory_space=pltpu.VMEM)
    yshp = jax.ShapeDtypeStruct((Np, D), dtype)
    sshp = jax.ShapeDtypeStruct((Np, 1), jnp.float32)
    gshp = jax.ShapeDtypeStruct((n_b8, D), jnp.float32)

    fwd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps, n_rows=N, R=R),
        grid=(n_b,),
        in_specs=[xspec, pspec, pspec],
        out_specs=(xspec, sspec, sspec),
        out_shape=(yshp, sshp, sshp),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * Np * D,
            bytes_accessed=2 * Np * D * dtype.itemsize,
            transcendentals=Np),
    )
    bwd = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, n_rows=N, R=R),
        grid=(n_b,),
        in_specs=[xspec, pspec, sspec, sspec, xspec],
        out_specs=(xspec, gspec, gspec),
        out_shape=(yshp, gshp, gshp),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * Np * D,
            bytes_accessed=3 * Np * D * dtype.itemsize,
            transcendentals=0),
    )
    return fwd, bwd, Np, n_b


@functools.lru_cache(maxsize=None)
def _ln_fused_fn(eps: float, interpret: bool):
    @jax.custom_vjp
    def f(x2, scale, bias):
        fwd, _, Np, _ = _ln_calls(x2.shape[0], x2.shape[1], x2.dtype.name,
                                  eps, interpret)
        xp = jnp.pad(x2, ((0, Np - x2.shape[0]), (0, 0)))
        y, _, _ = fwd(xp, scale[None], bias[None])
        return y[:x2.shape[0]]

    def f_fwd(x2, scale, bias):
        fwd, _, Np, _ = _ln_calls(x2.shape[0], x2.shape[1], x2.dtype.name,
                                  eps, interpret)
        xp = jnp.pad(x2, ((0, Np - x2.shape[0]), (0, 0)))
        y, mu, rs = fwd(xp, scale[None], bias[None])
        return y[:x2.shape[0]], (xp, scale, bias, mu, rs)

    def f_bwd(res, dy):
        xp, scale, bias, mu, rs = res
        N = dy.shape[0]
        _, bwd, Np, n_b = _ln_calls(N, xp.shape[1], xp.dtype.name, eps,
                                    interpret)
        dyp = jnp.pad(dy, ((0, Np - N), (0, 0)))
        dx, dsc_p, dbi_p = bwd(xp, scale[None], mu, rs, dyp)
        # rows >= n_b of the 8-padded partials are unwritten garbage
        dsc = jnp.sum(dsc_p[:n_b], axis=0).astype(scale.dtype)
        dbi = jnp.sum(dbi_p[:n_b], axis=0).astype(bias.dtype)
        return dx[:N], dsc, dbi

    f.defvjp(f_fwd, f_bwd)
    return f


def layer_norm_fused(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float = 1e-5,
                     interpret: bool | None = None) -> jax.Array:
    """LayerNorm over the last axis with a fused one-pass Pallas VJP.

    Same semantics as ops.nn.layer_norm (f32 stats, output in x.dtype).
    x: [..., D]; leading axes are flattened into grid rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    y = _ln_fused_fn(eps, interpret)(x2, scale, bias)
    return y.reshape(shape)
