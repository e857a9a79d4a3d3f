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
stays the single-device path — it has no GSPMD partitioning rule). The
backward is lax.scan's linearization, which keeps each visiting k/v block as
a residual (in total = one full k/v, the same footprint the all-gather path
pays); a remat'd/pallas ring backward can drop that later if long-context
training needs it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG = -1e30  # finite mask value (exp underflows to exactly 0 after shift)


def ring_attention_bshd(q: jax.Array, k: jax.Array, v: jax.Array, mesh,
                        axis: str = "model", *, s_valid: int | None = None,
                        causal: bool = False,
                        batch_axis: str | None = "data") -> jax.Array:
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
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)

    def local(q_loc, k_loc, v_loc):
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
        perm = [(i, (i + 1) % n) for i in range(n)]

        def fold(m, l, acc, k_cur, v_cur, j):
            """Fold k/v block j (global shard (my - j) mod n) into the
            online softmax."""
            kidx = ((my - j) % n) * s_loc + jnp.arange(s_loc)   # global k pos
            s = jnp.einsum("bqhd,bkhd->bhqk", qf,
                           k_cur.astype(jnp.float32))
            mask = jnp.ones((s_loc, s_loc), bool)
            if s_valid is not None:
                mask = mask & (kidx[None, :] < s_valid)
            if causal:
                mask = mask & (kidx[None, :] <= qidx[:, None])
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
        return out.astype(q_loc.dtype)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)


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
