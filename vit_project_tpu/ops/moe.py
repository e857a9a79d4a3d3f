"""Mixture-of-Experts MLP (Switch-style top-1 routing), expert-parallel ready.

The reference has no MoE (SURVEY.md section 2 — its models are dense ViTs);
this is forward-looking capability so the framework's parallelism matrix covers
expert parallelism (ep) alongside dp/tp/pp/sp. The design is the GShard/Switch
einsum formulation, which is the TPU-native shape of MoE:

- routing, dispatch and combine are dense einsums over STATIC shapes
  ([tokens, experts, capacity] one-hots) — no sorting, no ragged gathers, no
  data-dependent control flow, so the whole layer jits into one XLA program
  and the MXU runs the expert FFNs as one batched [E, C, D] x [E, D, H]
  contraction;
- expert weights are stacked on a leading E axis; sharding that axis over an
  'expert' mesh axis (parallel/mesh.py shard_vit_params_ep) makes GSPMD place
  each expert's FFN on its own device group and insert the dispatch/combine
  collectives (the all-to-all of classic expert parallelism) from the
  shardings alone;
- over-capacity tokens are DROPPED (their expert output is zero) and ride the
  transformer's residual connection — standard Switch semantics that keeps
  every shape static.

Aux load-balancing loss is the Switch loss: E * sum_e f_e * p_e, where f_e is
the fraction of tokens dispatched to expert e and p_e the mean router
probability of e. Minimized (= 1) when routing is uniform.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_moe_mlp(key, width: int, hidden: int, n_experts: int) -> dict:
    """Stacked expert FFN params + router.

    Per-expert init matches the dense block's trunc-normal(0.02) so a 1-expert
    MoE block is statistically the dense block."""
    from . import nn as vnn
    ks = jax.random.split(key, 3)
    tn = vnn.trunc_normal
    return {
        "router_w": tn(ks[0], (width, n_experts)),
        "fc1_w": tn(ks[1], (n_experts, width, hidden)),
        "fc1_b": jnp.zeros((n_experts, hidden)),
        "fc2_w": tn(ks[2], (n_experts, hidden, width)),
        "fc2_b": jnp.zeros((n_experts, width)),
    }


def expert_capacity(n_tokens: int, n_experts: int,
                    capacity_factor: float) -> int:
    """Static per-expert token capacity, padded to a multiple of 8 so the
    [E, C, D] expert batch keeps MXU-friendly sublane alignment."""
    c = int(n_tokens * capacity_factor / n_experts) + 1
    return max(8, ((c + 7) // 8) * 8)


def moe_mlp(x: jax.Array, p: dict, *, act,
            capacity_factor: float = 1.25,
            topk: int = 1) -> tuple[jax.Array, jax.Array]:
    """Top-1 (Switch) or top-2 (GShard) MoE FFN over the token axis.

    x: [B, S, D] -> (y [B, S, D], aux_loss scalar). Routing runs in f32
    (router logits are small and precision-sensitive); expert FFNs run in
    x.dtype like the dense MLP path (ops/nn.py dense).

    topk=2 follows GShard: each token is dispatched to its best TWO experts,
    combine weights renormalized over the pair (g_i / (g1 + g2)); second
    choices queue BEHIND every first choice of that expert for capacity, so
    load spikes shed the lower-priority copies first. The aux loss stays the
    first-choice Switch loss either way.
    """
    if topk not in (1, 2):
        raise ValueError(f"topk must be 1 or 2, got {topk}")
    if topk == 2 and p["router_w"].shape[-1] < 2:
        raise ValueError("topk=2 needs at least 2 experts")
    B, S, D = x.shape
    T = B * S
    E = p["router_w"].shape[-1]
    # capacity scales with topk (GShard): top-2 dispatches 2T assignments,
    # so unscaled slots would shed ~(2 - cf)/2 of them — almost all second
    # choices — even under a perfectly uniform router
    C = expert_capacity(T, E, capacity_factor * topk)
    xt = x.reshape(T, D)

    logits = jnp.dot(xt.astype(jnp.float32), p["router_w"])        # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)                        # [T]
    gate = jnp.max(probs, axis=-1)                                 # [T]

    onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)      # [T, E]
    # position of each token within its expert's queue (0-based); tokens past
    # the capacity are dropped (Switch): earlier tokens win, matching the
    # sequential-queue semantics of the original implementation
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0                # [T, E]
    keep = onehot * (pos < C)                                      # [T, E]
    pos_oh = jax.nn.one_hot(jnp.max(pos, axis=-1).astype(jnp.int32), C,
                            dtype=jnp.float32)                     # [T, C]
    dispatch = keep[:, :, None] * pos_oh[:, None, :]               # [T, E, C]

    if topk == 2:
        # mask the top-1 LOGIT (not the prob): a saturated router can
        # underflow every non-top prob to exactly 0 in f32, and an argmax
        # over the zeroed probs would return expert 0 — possibly the first
        # choice again, double-dispatching the token and stealing a
        # capacity slot from another token's real second choice
        logits2 = logits - onehot * 2e30
        expert2 = jnp.argmax(logits2, axis=-1)                     # [T]
        gate2 = jnp.take_along_axis(probs, expert2[:, None],
                                    axis=-1)[:, 0]
        oh2 = jax.nn.one_hot(expert2, E, dtype=jnp.float32)
        # second choices queue behind ALL first choices of that expert
        first_total = jnp.sum(onehot, axis=0, keepdims=True)       # [1, E]
        pos2 = (jnp.cumsum(oh2, axis=0) + first_total) * oh2 - 1.0
        keep2 = oh2 * (pos2 < C)
        pos2_oh = jax.nn.one_hot(jnp.max(pos2, axis=-1).astype(jnp.int32),
                                 C, dtype=jnp.float32)
        dispatch2 = keep2[:, :, None] * pos2_oh[:, None, :]
        # GShard combine renormalization over the selected pair
        denom = jnp.maximum(gate + gate2, 1e-9)
        gate, gate2 = gate / denom, gate2 / denom

    combine = dispatch * gate[:, None, None]                       # [T, E, C]
    if topk == 2:
        # one fused dispatch/combine pair covers both choices (slot one-hots
        # are disjoint, so addition is exact)
        dispatch = dispatch + dispatch2
        combine = combine + dispatch2 * gate2[:, None, None]

    # dispatch: [T,E,C] x [T,D] -> [E,C,D]; with tokens 'data'-sharded and the
    # expert weights 'expert'-sharded GSPMD lowers this pair of einsums to the
    # expert-parallel all-to-all
    xe = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), xt)
    h = act(jnp.einsum("ecd,edh->ech", xe, p["fc1_w"].astype(x.dtype))
            + p["fc1_b"][:, None, :].astype(x.dtype))
    ye = (jnp.einsum("ech,ehd->ecd", h, p["fc2_w"].astype(x.dtype))
          + p["fc2_b"][:, None, :].astype(x.dtype))
    yt = jnp.einsum("tec,ecd->td", combine.astype(x.dtype), ye)

    # Switch aux loss: E * sum_e (token fraction_e) * (mean router prob_e).
    # Uses the PRE-capacity assignment (f_e counts intent, not survivors),
    # per the Switch Transformer formulation.
    f = jnp.mean(onehot, axis=0)                                   # [E]
    pbar = jnp.mean(probs, axis=0)                                 # [E]
    aux = E * jnp.sum(f * pbar)
    return yt.reshape(B, S, D), aux.astype(jnp.float32)
