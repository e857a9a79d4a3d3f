"""Fused multi-head self-attention.

TPU-first design: ViT sequence lengths here are short and fixed (197 tokens for
ViT-B/16, 257 for ViT-L/14, 77 for the CLIP text tower), so instead of a tiled
long-sequence flash kernel we use a *whole-sequence* fused Pallas kernel: one grid
program per (batch, head) computes QK^T -> masked online-stable softmax -> PV
entirely in VMEM (a 384x384 f32 score tile is ~0.6 MB, far under the ~16 MB VMEM
budget). This removes the HBM round-trips for scores/probs that a naive XLA lowering
can emit, while keeping both matmuls on the MXU.

The backward pass recomputes probabilities in XLA (flash-style rematerialization:
no [S, S] residuals are saved), wired up with jax.custom_vjp.

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

_NEG_INF = -1e30


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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


def multi_head_attention(x: jax.Array, p: dict, num_heads: int, *,
                         causal: bool = False,
                         use_pallas: bool | None = None) -> jax.Array:
    """Full MHSA block: fused QKV projection, attention core, output projection.

    x: [B, S, D]. p: {qkv_w [D, 3D], qkv_b [3D], out_w [D, D], out_b [D]}.
    The output projection may be DoRA-adapted, in which case p contains
    'out_dora' handled by the caller (see adapters/dora.py) — this function
    only consumes plain out_w/out_b.
    """
    B, S, D = x.shape
    dh = D // num_heads
    qkv = jnp.dot(x, p["qkv_w"].astype(x.dtype)) + p["qkv_b"].astype(x.dtype)
    qkv = qkv.reshape(B, S, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    o = attention_core(q, k, v, causal=causal, use_pallas=use_pallas)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
    return jnp.dot(o, p["out_w"].astype(x.dtype)) + p["out_b"].astype(x.dtype)
