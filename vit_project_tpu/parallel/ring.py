"""Ring attention: context-parallel attention over a sequence-sharded mesh.

The GSPMD sequence-parallel path (parallel/mesh.seq_sharding) lets XLA insert
an ALL-GATHER of k/v before every attention — each device then holds the full
[B, S, H, Dh] k and v. Ring attention is the ICI-native alternative (the
scaling-book collective pattern; no reference counterpart — the reference is
dp-only, SURVEY.md section 2.2): k/v blocks ROTATE around the ring of
sequence shards, one `ppermute` hop per step, while each device folds every
visiting block into its queries' ONLINE softmax (the flash-attention
recurrence, kept in f32). Peak per-device k/v is ONE block instead of the
full sequence, and each hop's transfer overlaps the current block's matmuls
— the lever for context lengths whose k/v outgrow a chip.

Written with jnp inside `jax.shard_map` (MXU einsums; the pallas flash kernel
stays the single-device path — it has no GSPMD partitioning rule).

The BACKWARD is ring-native too (memory_efficient=True, the default): a
custom_vjp whose forward saves only each device's own q/k/v shards, the
output, and the per-row log-sum-exp, and whose backward re-rotates the k/v
blocks around the ring a second time — recomputing each visiting block's
softmax probabilities from the saved LSE (the flash-attention backward),
accumulating dq locally while dk/dv accumulators TRAVEL WITH their blocks
and take one final ppermute hop home. Peak per-device backward state is one
k/v block + one dk/dv block, instead of the full-sequence k/v that
lax.scan's linearization would hold as residuals (one visiting block per
step x n steps). memory_efficient=False keeps that naive linearization as a
debugging oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG = -1e30  # finite mask value (exp underflows to exactly 0 after shift)


def _block_mask(qidx, kidx, s_valid, causal):
    """[s_q, s_k] validity mask for one (query block, key block) pair,
    addressed by GLOBAL token positions."""
    mask = jnp.ones((qidx.shape[0], kidx.shape[0]), bool)
    if s_valid is not None:
        mask = mask & (kidx[None, :] < s_valid)
    if causal:
        mask = mask & (kidx[None, :] <= qidx[:, None])
    return mask


def ring_attention_bshd(q: jax.Array, k: jax.Array, v: jax.Array, mesh,
                        axis: str = "model", *, s_valid: int | None = None,
                        causal: bool = False,
                        batch_axis: str | None = "data",
                        memory_efficient: bool = True) -> jax.Array:
    """Attention over [B, S_pad, H, Dh] tensors whose S_pad axis is sharded
    over mesh axis `axis` (and B over `batch_axis`, if the mesh has one).

    S_pad must divide evenly by the axis size (pad the token stream first —
    vit_encode does); `s_valid` masks the padded tail: keys with global index
    >= s_valid never receive weight, so valid rows are EXACTLY the dense
    attention of the unpadded sequence (padded rows are garbage the caller
    slices off). `causal` masks kidx > qidx by global position. Math matches
    ops.attention.mha_fused_xla_bshd to f32-accumulation tolerance.
    """
    n = mesh.shape[axis]
    if q.shape[1] % n != 0:
        raise ValueError(f"S_pad ({q.shape[1]}) must divide the '{axis}' "
                         f"axis ({n}); pad the sequence first")
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        batch_axis = None
    spec = P(batch_axis, axis, None, None)
    lse_spec = P(batch_axis, axis, None)
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def local_fwd(q_loc, k_loc, v_loc):
        # q_loc: [b, s_loc, H, Dh] — this device's query block (fixed);
        # k_loc/v_loc start as its own block and rotate around the ring.
        my = jax.lax.axis_index(axis)
        s_loc = q_loc.shape[1]
        b, _, h, _ = q_loc.shape
        qidx = my * s_loc + jnp.arange(s_loc)                   # global q pos
        qf = q_loc.astype(jnp.float32) * scale

        m0 = jnp.full((b, h, s_loc, 1), _NEG, jnp.float32)
        l0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
        a0 = jnp.zeros(q_loc.shape, jnp.float32)

        def fold(m, l, acc, k_cur, v_cur, j):
            """Fold k/v block j (global shard (my - j) mod n) into the
            online softmax."""
            kidx = ((my - j) % n) * s_loc + jnp.arange(s_loc)   # global k pos
            s = jnp.einsum("bqhd,bkhd->bhqk", qf,
                           k_cur.astype(jnp.float32))
            mask = _block_mask(qidx, kidx, s_valid, causal)
            s = jnp.where(mask, s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            # masked entries contribute EXACTLY zero (robust even when a
            # whole step is masked and m_new is still _NEG)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            corr = jnp.exp(m - m_new)                           # [b,h,q,1]
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.einsum("bhqk,bkhd->bqhd", p,
                            v_cur.astype(jnp.float32))
            acc = acc * corr.transpose(0, 2, 1, 3) + pv
            return m_new, l, acc

        def step(carry, j):
            # rotate FIRST, then fold: the resident block (j=0) is folded
            # outside the loop, so the ring does exactly n-1 hops — the
            # final block is not rotated onward just to be discarded
            m, l, acc, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            m, l, acc = fold(m, l, acc, k_cur, v_cur, j)
            return (m, l, acc, k_cur, v_cur), None

        m, l, acc = fold(m0, l0, a0, k_loc, v_loc, 0)
        if n > 1:
            (m, l, acc, _, _), _ = jax.lax.scan(
                step, (m, l, acc, k_loc, v_loc), jnp.arange(1, n))
        lq = l.transpose(0, 2, 1, 3)                            # [b,q,h,1]
        out = jnp.where(lq > 0, acc / jnp.where(lq > 0, lq, 1.0), 0.0)
        # lse per VALID q row = m + log(l); +inf for fully-masked (padded)
        # rows so the backward's exp(s - lse) is exactly 0 there.
        lse = jnp.where(l > 0, m + jnp.log(jnp.where(l > 0, l, 1.0)),
                        jnp.inf)                                # [b,h,q,1]
        return out.astype(q_loc.dtype), lse[..., 0].transpose(0, 2, 1)

    def local_bwd(q_loc, k_loc, v_loc, out_loc, lse_loc, dout_loc):
        """Flash-attention backward, ring form. dq accumulates on this
        device (its query block never moves); each visiting k/v block's
        dk/dv accumulator rotates WITH the block and, after the last fold,
        takes one more hop to land on the block's owner."""
        my = jax.lax.axis_index(axis)
        s_loc = q_loc.shape[1]
        qidx = my * s_loc + jnp.arange(s_loc)
        qf = q_loc.astype(jnp.float32) * scale
        do = dout_loc.astype(jnp.float32)
        # delta[b,h,q,1] = rowwise <dout, out> (the softmax-jacobian term)
        delta = jnp.sum(do * out_loc.astype(jnp.float32),
                        axis=-1).transpose(0, 2, 1)[..., None]
        lse = lse_loc.transpose(0, 2, 1)[..., None]             # [b,h,q,1]

        def fold_bwd(dq, dk_acc, dv_acc, k_cur, v_cur, j):
            kidx = ((my - j) % n) * s_loc + jnp.arange(s_loc)
            kf = k_cur.astype(jnp.float32)
            vf = v_cur.astype(jnp.float32)
            s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
            mask = _block_mask(qidx, kidx, s_valid, causal)
            # exact softmax probs recomputed from the saved lse
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
            dv_acc = dv_acc + jnp.einsum("bhqk,bqhd->bkhd", p, do)
            dp = jnp.einsum("bqhd,bkhd->bhqk", do, vf)
            ds = p * (dp - delta)
            dq = dq + jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * scale
            dk_acc = dk_acc + jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
            return dq, dk_acc, dv_acc

        dq0 = jnp.zeros(q_loc.shape, jnp.float32)
        z = jnp.zeros(k_loc.shape, jnp.float32)
        dq, dk_acc, dv_acc = fold_bwd(dq0, z, z, k_loc, v_loc, 0)

        def step(carry, j):
            dq, dk_acc, dv_acc, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            dk_acc = jax.lax.ppermute(dk_acc, axis, perm)
            dv_acc = jax.lax.ppermute(dv_acc, axis, perm)
            dq, dk_acc, dv_acc = fold_bwd(dq, dk_acc, dv_acc, k_cur, v_cur, j)
            return (dq, dk_acc, dv_acc, k_cur, v_cur), None

        if n > 1:
            (dq, dk_acc, dv_acc, _, _), _ = jax.lax.scan(
                step, (dq, dk_acc, dv_acc, k_loc, v_loc), jnp.arange(1, n))
            # block b's accumulator sits on device b-1 after n-1 hops
            # (it was folded by devices b, b+1, ..., b-1 in turn); one more
            # hop delivers it home.
            dk_acc = jax.lax.ppermute(dk_acc, axis, perm)
            dv_acc = jax.lax.ppermute(dv_acc, axis, perm)
        return (dq.astype(q_loc.dtype), dk_acc.astype(k_loc.dtype),
                dv_acc.astype(v_loc.dtype))

    fwd_sm = jax.shard_map(local_fwd, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=(spec, lse_spec), check_vma=False)

    if not memory_efficient:
        return fwd_sm(q, k, v)[0]

    bwd_sm = jax.shard_map(
        local_bwd, mesh=mesh,
        in_specs=(spec, spec, spec, spec, lse_spec, spec),
        out_specs=(spec, spec, spec), check_vma=False)

    @jax.custom_vjp
    def attn(q, k, v):
        return fwd_sm(q, k, v)[0]

    def attn_fwd(q, k, v):
        out, lse = fwd_sm(q, k, v)
        return out, (q, k, v, out, lse)

    def attn_bwd(res, dout):
        q, k, v, out, lse = res
        return bwd_sm(q, k, v, out, lse, dout)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(q, k, v)


def pad_seq(x: jax.Array, n: int) -> tuple[jax.Array, int]:
    """Zero-pad axis 1 of [B, S, ...] up to a multiple of n; returns
    (padded, original S). Padded key rows are masked inside ring attention
    (s_valid) and padded query rows never mix into valid tokens (attention is
    the only token-mixing op), so the caller just slices [:, :S] at the end."""
    S = x.shape[1]
    pad = (-S) % n
    if pad == 0:
        return x, S
    widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, widths), S
