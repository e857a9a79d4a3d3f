"""Fused multi-head self-attention.

TPU-first design: ViT sequence lengths here are short and fixed (197 tokens for
ViT-B/16, 257 for ViT-L/14, 77 for the CLIP text tower), so instead of a tiled
long-sequence flash kernel we use a *whole-sequence* fused Pallas kernel: one grid
program per (batch, head) computes QK^T -> masked online-stable softmax -> PV
entirely in VMEM (a 384x384 f32 score tile is ~0.6 MB, far under the ~16 MB VMEM
budget). This removes the HBM round-trips for scores/probs that a naive XLA lowering
can emit, while keeping both matmuls on the MXU.

The backward pass is a Pallas kernel too (two generations: _mha_bwd_pallas
recomputes the probability tile from q/k/v; the production flash3 path
_flash3_bwd_kernel replays it from saved row-LSE residuals) — flash-style
rematerialization in VMEM, no [S, S] residuals ever reach HBM, wired up with
jax.custom_vjp. The round-3 step trace (BENCHLOG.md) shows both directions
running as Pallas programs at their dh=64 shape caps.

Replaces the reference's reliance on torch's fused SDPA/cuDNN attention inside the
external CLIP / timm models (SURVEY.md section 2: the reference has no native code of
its own).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nn import round_up_multiple as _pad_to

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Reference (pure-XLA) implementation — used on CPU and as the VJP recompute.
# ---------------------------------------------------------------------------

def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array, *,
                  causal: bool = False) -> jax.Array:
    """q, k, v: [B, H, S, Dh] -> [B, H, S, Dh]. Softmax in f32."""
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        S = q.shape[2]
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int,
                causal: bool):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [S, S]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < valid_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _mha_pallas_raw(q: jax.Array, k: jax.Array, v: jax.Array,
                    causal: bool) -> jax.Array:
    B, H, S, Dh = q.shape
    scale = 1.0 / (Dh ** 0.5)
    Sp = _pad_to(S, 128)
    Dp = _pad_to(Dh, 128)

    def prep(x):
        x = x.reshape(B * H, S, Dh)
        return jnp.pad(x, ((0, 0), (0, Sp - S), (0, Dp - Dh)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    spec = pl.BlockSpec((1, Sp, Dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, valid_len=S, causal=causal),
        grid=(B * H,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Sp, Dp), q.dtype),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * Sp * Dp,
            bytes_accessed=4 * B * H * Sp * Dp * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp,
        ),
    )(qp, kp, vp)
    return out[:, :S, :Dh].reshape(B, H, S, Dh)


# ---------------------------------------------------------------------------
# Pallas backward kernel: per-(batch, head) program recomputes the probability
# tile in VMEM (flash-style rematerialization) and emits dq, dk, dv without ever
# materializing an [S, S] tensor in HBM.
# ---------------------------------------------------------------------------

def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                    scale: float, valid_len: int, causal: bool):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < valid_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)           # [S, S]

    # dv = p^T @ do
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dp = do @ v^T ; ds = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 * scale).astype(dk_ref.dtype)


def _mha_bwd_pallas(q, k, v, do, causal):
    B, H, S, Dh = q.shape
    scale = 1.0 / (Dh ** 0.5)
    Sp = _pad_to(S, 128)
    Dp = _pad_to(Dh, 128)

    def prep(x):
        x = x.reshape(B * H, S, Dh)
        return jnp.pad(x, ((0, 0), (0, Sp - S), (0, Dp - Dh)))

    spec = pl.BlockSpec((1, Sp, Dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B * H, Sp, Dp), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, scale=scale, valid_len=S,
                          causal=causal),
        grid=(B * H,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Sp * Sp * Dp,
            bytes_accessed=8 * B * H * Sp * Dp * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp,
        ),
    )(prep(q), prep(k), prep(v), prep(do))

    def unprep(x):
        return x[:, :S, :Dh].reshape(B, H, S, Dh)

    return unprep(dq), unprep(dk), unprep(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha_pallas(q, k, v, causal):
    return _mha_pallas_raw(q, k, v, causal)


def _mha_fwd(q, k, v, causal):
    return _mha_pallas_raw(q, k, v, causal), (q, k, v)


def _mha_bwd(causal, res, do):
    q, k, v = res
    dq, dk, dv = _mha_bwd_pallas(q, k, v, do, causal)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def mha_bwd_reference(q, k, v, do, causal=False):
    """XLA reference backward (used by tests to validate the kernel)."""
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        S = q.shape[2]
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    dof = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_mha_pallas.defvjp(_mha_fwd, _mha_bwd)


def mha_fused_xla(q: jax.Array, k: jax.Array, v: jax.Array, *,
                  causal: bool = False) -> jax.Array:
    """XLA attention with input-dtype score/prob storage and f32 softmax stats.

    For bf16 inputs this halves the [B,H,S,S] HBM traffic vs an f32-softmax
    formulation while keeping the max/sum reductions in f32; for f32 inputs it is
    numerically the plain softmax attention. Measured on v5e at ViT sequence
    lengths (197/257), this beats both the whole-sequence Pallas kernel below and
    jax's bundled flash-attention kernel (which is tuned for long sequences) —
    see BENCHLOG.md.
    """
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / dh ** 0.5)
    sf = s.astype(jnp.float32)
    if causal:
        S = q.shape[2]
        sf = jnp.where(jnp.tril(jnp.ones((S, S), dtype=bool)), sf, _NEG_INF)
    m = jnp.max(sf, axis=-1, keepdims=True)
    e = jnp.exp(sf - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def attention_core(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   causal: bool = False,
                   use_pallas: bool | None = None) -> jax.Array:
    """Fused scaled-dot-product attention over [B, H, S, Dh] tensors.

    Default (use_pallas=None/False) is the XLA fused path — measured fastest at
    these short ViT sequence lengths. use_pallas=True opts into the hand-written
    whole-sequence Pallas kernels (fwd + flash-style bwd), kept for longer
    sequences and as the kernel-authoring reference.
    """
    if use_pallas:
        return _mha_pallas(q, k, v, causal)
    return mha_fused_xla(q, k, v, causal=causal)


# ---------------------------------------------------------------------------
# Layout-native packed flash attention (the production TPU path).
#
# Takes q/k/v in the PACKED [B, S, D] layout the projections naturally emit
# (heads are dh-lane slices of D), so no [B,S,H,dh] -> [B,H,S,dh] relayout is
# ever materialized in HBM — on v5e those boundary transposes cost more than
# the kernel saves (measured: a [G,S,dh]-layout kernel LOST 30 ms/step to
# them, BENCHLOG.md round 2). One grid program per batch element computes all
# H heads: bf16 MXU dots with f32 accumulation, f32 online softmax, and
# out-of-range rows/cols handled by in-kernel masks instead of padded copies.
# The backward recomputes p in-kernel (flash-style: no [S,S] residual is ever
# written to HBM, killing the ~240 MB/layer probability tensor XLA's lowering
# stores). Measured on v5e at ViT-B/16 batch 256: 280 -> 231 ms/step vs the
# fused-XLA path (874 -> 1107 img/s).
#
# q must be PRESCALED by 1/sqrt(dh) (the caller folds the scale into the
# q-projection weights, saving an [B,S,D] elementwise pass).
# ---------------------------------------------------------------------------

def _attn_masks(Sq: int, S: int, dh: int, causal: bool):
    """In-kernel masks shared by every flash kernel below.

    kmask [Sq, Sq] hides out-of-range (and, when causal, future) key columns
    of the score tile; rmask [Sq, dh] zeroes out-of-range block rows of the
    operand slices — those rows read unspecified bits, and zeroing keeps the
    stored log-sum-exp stats finite (the backward replays them) and stops
    garbage rows from poisoning the dk/dv accumulations (0-masked do rows
    already zero every padded row's contribution algebraically)."""
    kmask = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sq), 1) < S
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sq), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sq), 1)
        kmask = jnp.logical_and(kmask, col <= row)
    rmask = jax.lax.broadcasted_iota(jnp.int32, (Sq, dh), 0) < S
    return kmask, rmask


def _attn_fwd_head(q, k, v, kmask):
    """Masked online-softmax attention for one head tile (q PRESCALED).

    Returns (o [Sq, dh] f32, lse [Sq] f32) — the caller writes them to its
    own output slices."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(kmask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = jnp.sum(e, axis=-1, keepdims=True)
    p = (e * (1.0 / r)).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    return o, (m + jnp.log(r))[:, 0]


def _attn_bwd_head(q, k, v, do, lse, kmask):
    """One head tile of the flash backward. Replays the forward's
    log-sum-exp stats: p = exp(s - lse) without recomputing the max/sum
    reductions (measured ~7 ms/step at ViT-B/16 b256, BENCHLOG.md). With qs
    already prescaled, s = qs @ k^T means the cotangents are exactly
    dqs = ds @ k and dk = ds^T @ qs — no extra scale anywhere.

    Returns (dq, dk, dv) as [Sq, dh] f32 tiles."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(kmask, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])                          # f32 [Sq, Sq]
    pb = p.astype(do.dtype)
    dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    c = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - c)).astype(do.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dq, dk, dv


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, heads: int,
                      S: int, Sq: int, causal: bool):
    dh = q_ref.shape[-1] // heads
    kmask, rmask = _attn_masks(Sq, S, dh, causal)
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = jnp.where(rmask, q_ref[0, :, sl], 0)
        k = k_ref[0, :, sl]
        v = jnp.where(rmask, v_ref[0, :, sl], 0)
        o, lse = _attn_fwd_head(q, k, v, kmask)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, :, h] = lse


def _flash_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dq_ref, dk_ref,
                      dv_ref, *, heads: int, S: int, Sq: int, causal: bool):
    dh = q_ref.shape[-1] // heads
    kmask, rmask = _attn_masks(Sq, S, dh, causal)
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = jnp.where(rmask, q_ref[0, :, sl], 0)
        k = jnp.where(rmask, k_ref[0, :, sl], 0)
        v = jnp.where(rmask, v_ref[0, :, sl], 0)
        do = jnp.where(rmask, do_ref[0, :, sl], 0)
        dq, dk, dv = _attn_bwd_head(q, k, v, do, lse_ref[0, :, h], kmask)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


@functools.lru_cache(maxsize=None)
def _flash_calls(B: int, S: int, D: int, heads: int, causal: bool,
                 dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    sub = 16 if dtype == jnp.bfloat16 else 8
    Sq = _pad_to(S, sub)
    dh = D // heads
    spec = pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, Sq, heads), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, S, D), dtype)
    lshp = jax.ShapeDtypeStruct((B, Sq, heads), jnp.float32)

    fwd = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, heads=heads, S=S, Sq=Sq,
                          causal=causal),
        grid=(B,),
        in_specs=[spec] * 3, out_specs=(spec, lspec), out_shape=(shp, lshp),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * Sq * Sq * dh,
            bytes_accessed=8 * B * S * D * dtype.itemsize,
            transcendentals=B * heads * Sq * Sq),
    )
    bwd = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, heads=heads, S=S, Sq=Sq,
                          causal=causal),
        grid=(B,),
        in_specs=[spec] * 4 + [lspec], out_specs=(spec,) * 3,
        out_shape=(shp, shp, shp),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * B * heads * Sq * Sq * dh,
            bytes_accessed=14 * B * S * D * dtype.itemsize,
            transcendentals=B * heads * Sq * Sq),
    )
    return fwd, bwd


@functools.lru_cache(maxsize=None)
def _flash_mha_packed_fn(heads: int, causal: bool, interpret: bool):
    @jax.custom_vjp
    def f(qs, k, v):
        fwd, _ = _flash_calls(qs.shape[0], qs.shape[1], qs.shape[2], heads,
                              causal, qs.dtype.name, interpret)
        return fwd(qs, k, v)[0]

    def f_fwd(qs, k, v):
        fwd, _ = _flash_calls(qs.shape[0], qs.shape[1], qs.shape[2], heads,
                              causal, qs.dtype.name, interpret)
        o, lse = fwd(qs, k, v)
        return o, (qs, k, v, lse)

    def f_bwd(res, do):
        qs, k, v, lse = res
        _, bwd = _flash_calls(qs.shape[0], qs.shape[1], qs.shape[2], heads,
                              causal, qs.dtype.name, interpret)
        dq, dk, dv = bwd(qs, k, v, do.astype(qs.dtype), lse)
        return dq, dk, dv

    f.defvjp(f_fwd, f_bwd)
    return f


def flash_mha_packed(q_scaled: jax.Array, k: jax.Array, v: jax.Array, *,
                     num_heads: int, causal: bool = False,
                     interpret: bool | None = None) -> jax.Array:
    """Fused MHSA core on packed [B, S, D] tensors (heads = lane slices).

    q_scaled MUST already include the 1/sqrt(dh) score scale (fold it into
    the q-projection weight+bias). Returns [B, S, D]. Differentiable via a
    flash-style recompute backward (no [S,S] residual)."""
    D = q_scaled.shape[-1]
    if D % num_heads != 0:  # a partial head would leave output lanes unwritten
        raise ValueError(f"flash_mha_packed: D={D} is not divisible by "
                         f"num_heads={num_heads}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_mha_packed_fn(num_heads, causal, interpret)(q_scaled, k, v)


# ---------------------------------------------------------------------------
# Single-tensor packed qkv flash attention: takes the [B, S, 3D] output of ONE
# fused qkv projection (q lanes [0:D] PRESCALED by 1/sqrt(dh), k at [D:2D],
# v at [2D:3D]) and emits [B, S, D]. vs flash_mha_packed this removes two of
# the three projection matmuls per layer in the forward ([.,768]x[768,768]x3
# -> [.,768]x[768,2304], a better MXU shape) and collapses the three dq/dk/dv
# weight-grad paths into one packed [B,S,3D] cotangent -> one dW matmul.
# ---------------------------------------------------------------------------

def _flash3_fwd_kernel(qkv_ref, o_ref, lse_ref, *, heads: int, S: int,
                       Sq: int, D: int, causal: bool):
    dh = D // heads
    kmask, rmask = _attn_masks(Sq, S, dh, causal)
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = jnp.where(rmask, qkv_ref[0, :, sl], 0)
        k = qkv_ref[0, :, D + h * dh:D + (h + 1) * dh]
        v = jnp.where(rmask, qkv_ref[0, :, 2 * D + h * dh:
                                     2 * D + (h + 1) * dh], 0)
        o, lse = _attn_fwd_head(q, k, v, kmask)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, :, h] = lse


def _flash3_bwd_kernel(qkv_ref, do_ref, lse_ref, dqkv_ref, *, heads: int,
                       S: int, Sq: int, D: int, causal: bool):
    dh = D // heads
    kmask, rmask = _attn_masks(Sq, S, dh, causal)
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = jnp.where(rmask, qkv_ref[0, :, sl], 0)
        k = jnp.where(rmask, qkv_ref[0, :, D + h * dh:D + (h + 1) * dh], 0)
        v = jnp.where(rmask, qkv_ref[0, :, 2 * D + h * dh:
                                     2 * D + (h + 1) * dh], 0)
        do = jnp.where(rmask, do_ref[0, :, sl], 0)
        dq, dk, dv = _attn_bwd_head(q, k, v, do, lse_ref[0, :, h], kmask)
        dqkv_ref[0, :, sl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, D + h * dh:D + (h + 1) * dh] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * D + h * dh:2 * D + (h + 1) * dh] = \
            dv.astype(dqkv_ref.dtype)


@functools.lru_cache(maxsize=None)
def _flash3_calls(B: int, S: int, D3: int, heads: int, causal: bool,
                  dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    D = D3 // 3
    sub = 16 if dtype == jnp.bfloat16 else 8
    Sq = _pad_to(S, sub)
    qkv_spec = pl.BlockSpec((1, Sq, D3), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, Sq, heads), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    oshp = jax.ShapeDtypeStruct((B, S, D), dtype)
    qkvshp = jax.ShapeDtypeStruct((B, S, D3), dtype)
    lshp = jax.ShapeDtypeStruct((B, Sq, heads), jnp.float32)
    dh = D // heads

    fwd = pl.pallas_call(
        functools.partial(_flash3_fwd_kernel, heads=heads, S=S, Sq=Sq, D=D,
                          causal=causal),
        grid=(B,),
        in_specs=[qkv_spec], out_specs=(ospec, lspec), out_shape=(oshp, lshp),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * Sq * Sq * dh,
            bytes_accessed=5 * B * S * D * dtype.itemsize,
            transcendentals=B * heads * Sq * Sq),
    )
    bwd = pl.pallas_call(
        functools.partial(_flash3_bwd_kernel, heads=heads, S=S, Sq=Sq, D=D,
                          causal=causal),
        grid=(B,),
        in_specs=[qkv_spec, ospec, lspec], out_specs=qkv_spec,
        out_shape=qkvshp,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * B * heads * Sq * Sq * dh,
            bytes_accessed=8 * B * S * D * dtype.itemsize,
            transcendentals=B * heads * Sq * Sq),
    )
    return fwd, bwd


@functools.lru_cache(maxsize=None)
def _flash_mha_packed_qkv_fn(heads: int, causal: bool, interpret: bool):
    @jax.custom_vjp
    def f(qkv):
        fwd, _ = _flash3_calls(qkv.shape[0], qkv.shape[1], qkv.shape[2],
                               heads, causal, qkv.dtype.name, interpret)
        return fwd(qkv)[0]

    def f_fwd(qkv):
        fwd, _ = _flash3_calls(qkv.shape[0], qkv.shape[1], qkv.shape[2],
                               heads, causal, qkv.dtype.name, interpret)
        o, lse = fwd(qkv)
        return o, (qkv, lse)

    def f_bwd(res, do):
        qkv, lse = res
        _, bwd = _flash3_calls(qkv.shape[0], qkv.shape[1], qkv.shape[2],
                               heads, causal, qkv.dtype.name, interpret)
        return (bwd(qkv, do.astype(qkv.dtype), lse),)

    f.defvjp(f_fwd, f_bwd)
    return f


def flash_mha_packed_qkv(qkv_scaled: jax.Array, *, num_heads: int,
                         causal: bool = False,
                         interpret: bool | None = None) -> jax.Array:
    """Fused MHSA core on a single packed [B, S, 3D] qkv tensor.

    Lanes [0:D] are q PRESCALED by 1/sqrt(dh), [D:2D] k, [2D:3D] v (heads =
    dh-lane slices within each third — exactly the layout one
    [D, 3D]-weight projection emits). Returns [B, S, D]. The backward emits
    one packed [B, S, 3D] cotangent, so the projection's weight gradient is
    a single matmul."""
    D3 = qkv_scaled.shape[-1]
    if D3 % 3 != 0 or (D3 // 3) % num_heads != 0:
        # a misaligned packing shifts every k/v lane slice (or leaves
        # output lanes unwritten) with no error — fail loudly instead
        raise ValueError(f"flash_mha_packed_qkv: last dim {D3} must be "
                         f"3*D with D divisible by num_heads={num_heads}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_mha_packed_qkv_fn(num_heads, causal, interpret)(qkv_scaled)


def mha_fused_xla_bshd(q: jax.Array, k: jax.Array, v: jax.Array, *,
                       causal: bool = False) -> jax.Array:
    """Head-batched attention directly on [B, S, H, Dh] tensors.

    Same math as mha_fused_xla, but the head dimension is contracted in place
    by the batched einsums so no explicit [B,S,H,Dh] -> [B,H,S,Dh] transpose
    is ever materialized (XLA folds the layout into the matmul operand reads).
    """
    dh = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (1.0 / dh ** 0.5)
    sf = s.astype(jnp.float32)
    if causal:
        S = q.shape[1]
        sf = jnp.where(jnp.tril(jnp.ones((S, S), dtype=bool)), sf, _NEG_INF)
    m = jnp.max(sf, axis=-1, keepdims=True)
    e = jnp.exp(sf - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def attention_core_bshd(q: jax.Array, k: jax.Array, v: jax.Array, *,
                        causal: bool = False,
                        use_pallas: bool | None = None) -> jax.Array:
    """Attention over [B, S, H, Dh] tensors (head-minor layout).

    This is the hot-path entry used by the ViT/CLIP blocks: the projections
    emit q/k/v head-minor and the output feeds the out-projection after a free
    reshape, so no head transposes appear in the compiled step. The Pallas
    opt-in transposes at the boundary (the kernel wants [B, H, S, Dh])."""
    if use_pallas:
        o = _mha_pallas(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                        v.transpose(0, 2, 1, 3), causal)
        return o.transpose(0, 2, 1, 3)
    return mha_fused_xla_bshd(q, k, v, causal=causal)
