"""Sequence parallelism (token-sharded activations) and MoE / expert
parallelism (ops/moe.py, parallel/mesh.py seq_sharding / shard_vit_params_ep).

The reference is dense and has no sp/ep (SURVEY.md section 2.2) — these are
beyond-reference capability tests: every mode must reproduce the plain dp
numbers (same math, different placement) on the 8-virtual-device CPU mesh.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_project_tpu.core.configs import ViTTrainConfig
from vit_project_tpu.models import vit as vvit
from vit_project_tpu.ops import moe as vmoe
from vit_project_tpu.parallel import mesh as vmesh
from vit_project_tpu.train.vit_loop import ViTTrainer, sgd_init

TINY = vvit.ViTConfig(patch=8, width=32, layers=2, heads=2, image_size=32,
                      num_classes=10)  # seq_len = 17: does NOT divide the
                                       # model axis — exercises GSPMD's
                                       # ragged token shard
MOE_TINY = dataclasses.replace(TINY, moe_experts=4)


def _rand_batch(n=8, image=32, classes=10, seed=0):
    rs = np.random.RandomState(seed)
    return (rs.randint(0, 255, (n, image, image, 3), np.uint8),
            rs.randint(0, classes, n).astype(np.int32))


# ---------------------------------------------------------------- sequence ---

def test_sp_forward_matches_unsharded():
    params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
    imgs = jnp.asarray(np.random.RandomState(1).randn(4, 32, 32, 3),
                       jnp.float32)
    ref = jax.jit(lambda p, x: vvit.vit_classify(p, x, TINY))(params, imgs)

    mesh = vmesh.make_mesh(n_data=2, n_model=4)
    ss = vmesh.seq_sharding(mesh)
    p_sh = vmesh.replicate(mesh, params)
    x_sh = jax.device_put(imgs, vmesh.data_sharding(mesh))
    got = jax.jit(lambda p, x: vvit.vit_classify(p, x, TINY, seq_shard=ss))(
        p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_train_step_matches_dp():
    tcfg = ViTTrainConfig(batch_size=8, compute_dtype="float32")
    imgs, labels = _rand_batch()
    pkey = jax.random.PRNGKey(3)

    results = []
    for sp in (1, 2):
        cfg = dataclasses.replace(tcfg, sp_devices=sp)
        mesh = vmesh.make_mesh(n_data=8 // sp, n_model=sp)
        tr = ViTTrainer(TINY, cfg, mesh)
        params = vmesh.replicate(mesh, vvit.init_vit_params(
            jax.random.PRNGKey(0), TINY))
        buf = vmesh.replicate(mesh, sgd_init(params))
        si, sl = tr.shard(imgs, labels)
        step = tr._make_train_step(None)
        params, buf, loss = step(params, buf, si, sl, 0.1, pkey, 0.1)
        results.append((jax.tree_util.tree_map(np.asarray, params),
                        float(loss)))
    (p_dp, l_dp), (p_sp, l_sp) = results
    assert np.isclose(l_dp, l_sp, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_sp)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_seq_sharding_requires_model_axis():
    with pytest.raises(ValueError, match="model"):
        vmesh.seq_sharding(vmesh.make_mesh(n_data=8))


# -------------------------------------------------------------------- ring ---

class TestRingAttention:
    """parallel/ring.py vs the dense XLA attention oracle."""

    def _qkv(self, B=4, S=24, H=2, dh=8, seed=0):
        rs = np.random.RandomState(seed)
        return tuple(jnp.asarray(rs.randn(B, S, H, dh), jnp.float32)
                     for _ in range(3))

    def test_matches_dense(self):
        from vit_project_tpu.parallel import ring as vring
        from vit_project_tpu.ops import attention as vattn
        mesh = vmesh.make_mesh(n_data=2, n_model=4)
        q, k, v = self._qkv()
        ref = vattn.mha_fused_xla_bshd(q, k, v)
        got = jax.jit(lambda q, k, v: vring.ring_attention_bshd(
            q, k, v, mesh, "model"))(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_padded_and_causal_match_dense(self):
        from vit_project_tpu.parallel import ring as vring
        from vit_project_tpu.ops import attention as vattn
        mesh = vmesh.make_mesh(n_data=2, n_model=4)
        q, k, v = self._qkv(S=17)
        qp, s = vring.pad_seq(q, 8)
        kp, _ = vring.pad_seq(k, 8)
        vp, _ = vring.pad_seq(v, 8)
        assert qp.shape[1] == 24 and s == 17
        for causal in (False, True):
            ref = vattn.mha_fused_xla_bshd(q, k, v, causal=causal)
            got = jax.jit(lambda q, k, v: vring.ring_attention_bshd(
                q, k, v, mesh, "model", s_valid=17, causal=causal))(
                qp, kp, vp)[:, :17]
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)

    def test_gradients_match_dense(self):
        from vit_project_tpu.parallel import ring as vring
        from vit_project_tpu.ops import attention as vattn
        mesh = vmesh.make_mesh(n_data=2, n_model=4)
        q, k, v = self._qkv()
        g_ref = jax.grad(lambda q, k, v: jnp.sum(
            vattn.mha_fused_xla_bshd(q, k, v) ** 2), argnums=(0, 1, 2))(
            q, k, v)
        g_got = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            vring.ring_attention_bshd(q, k, v, mesh, "model") ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_ref, g_got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)

    def test_gradients_padded_causal_match_dense(self):
        """The ring backward (custom_vjp, lse-recompute) under masking:
        padded-tail keys AND causal masks, grads vs the dense oracle.
        Padded QUERY rows receive garbage grads by design — compare only the
        valid [:17] rows (callers slice the same way)."""
        from vit_project_tpu.parallel import ring as vring
        from vit_project_tpu.ops import attention as vattn
        mesh = vmesh.make_mesh(n_data=2, n_model=4)
        q, k, v = self._qkv(S=17)
        qp, s = vring.pad_seq(q, 8)
        kp, _ = vring.pad_seq(k, 8)
        vp, _ = vring.pad_seq(v, 8)
        for causal in (False, True):
            g_ref = jax.grad(lambda q, k, v: jnp.sum(
                vattn.mha_fused_xla_bshd(q, k, v, causal=causal) ** 2),
                argnums=(0, 1, 2))(q, k, v)
            g_got = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                vring.ring_attention_bshd(
                    q, k, v, mesh, "model", s_valid=17,
                    causal=causal)[:, :17] ** 2),
                argnums=(0, 1, 2)))(qp, kp, vp)
            for a, b in zip(g_ref, g_got):
                # atol 3e-6: on exactly-zero oracle entries (a causal row's
                # self-only softmax has ds == 0 analytically) the lse-replay
                # p = exp(s - lse) is 1 +- 1 ulp, leaving ~1e-6 residue
                np.testing.assert_allclose(np.asarray(b)[:, :17],
                                           np.asarray(a),
                                           rtol=1e-5, atol=3e-6)

    def test_memory_efficient_backward_matches_naive(self):
        """custom_vjp ring backward == lax.scan linearization (the retained
        oracle path), bit-for-bit up to f32 reassociation."""
        from vit_project_tpu.parallel import ring as vring
        mesh = vmesh.make_mesh(n_data=2, n_model=4)
        q, k, v = self._qkv()

        def grads(me):
            return jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                vring.ring_attention_bshd(
                    q, k, v, mesh, "model",
                    memory_efficient=me) ** 2),
                argnums=(0, 1, 2)))(q, k, v)

        for a, b in zip(grads(False), grads(True)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)

    def test_memory_efficient_backward_memory_drops(self):
        """The point of the custom_vjp: backward residuals are O(one block)
        per device, not the O(full k/v) the scan linearization keeps. At 8
        sequence shards the compiled grad program's temp allocation must
        drop by well over the 3x asserted here (measured ~7.7x)."""
        from vit_project_tpu.parallel import ring as vring
        mesh = vmesh.make_mesh(n_data=1, n_model=8)
        rs = np.random.RandomState(0)
        q, k, v = (jnp.asarray(rs.randn(2, 8 * 256, 4, 64), jnp.float32)
                   for _ in range(3))

        def temp_bytes(me):
            f = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
                vring.ring_attention_bshd(
                    q, k, v, mesh, "model", batch_axis=None,
                    memory_efficient=me) ** 2), argnums=(0, 1, 2)))
            ma = f.lower(q, k, v).compile().memory_analysis()
            if ma is None:
                pytest.skip("backend exposes no memory_analysis")
            return ma.temp_size_in_bytes

        naive, efficient = temp_bytes(False), temp_bytes(True)
        assert efficient * 3 < naive, (efficient, naive)

    def test_nondividing_seq_rejected(self):
        from vit_project_tpu.parallel import ring as vring
        mesh = vmesh.make_mesh(n_data=2, n_model=4)
        q, k, v = self._qkv(S=17)
        with pytest.raises(ValueError, match="pad"):
            vring.ring_attention_bshd(q, k, v, mesh, "model")


def test_sp_ring_train_step_matches_dp():
    """Full sp+ring train step (S=17 -> padded to 18 over 2 shards) must
    reproduce the plain dp step."""
    imgs, labels = _rand_batch()
    pkey = jax.random.PRNGKey(3)

    def run(ring):
        cfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                             sp_devices=2 if ring else 1, sp_ring=ring)
        mesh = vmesh.make_mesh(n_data=4 if ring else 8,
                               n_model=2 if ring else 1)
        tr = ViTTrainer(TINY, cfg, mesh)
        params = vmesh.replicate(mesh, vvit.init_vit_params(
            jax.random.PRNGKey(0), TINY))
        buf = vmesh.replicate(mesh, sgd_init(params))
        si, sl = tr.shard(imgs, labels)
        params, _, loss = tr._make_train_step(None)(
            params, buf, si, sl, 0.1, pkey, 0.1)
        return jax.tree_util.tree_map(np.asarray, params), float(loss)

    p_ref, l_ref = run(False)
    p_got, l_got = run(True)
    assert np.isclose(l_ref, l_got, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_ring_attn_requires_seq_shard():
    params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="seq_shard"):
        vvit.vit_classify(params, imgs, TINY, ring_attn=True)


# --------------------------------------------------------------------- moe ---

def _np_moe_oracle(x, p, act, capacity_factor):
    """Sequential-queue top-1 MoE: the semantics moe_mlp's einsum dispatch
    must reproduce (earlier tokens win capacity; dropped tokens output 0)."""
    B, S, D = x.shape
    T = B * S
    E = p["router_w"].shape[1]
    C = vmoe.expert_capacity(T, E, capacity_factor)
    xt = x.reshape(T, D).astype(np.float64)
    logits = xt @ np.asarray(p["router_w"], np.float64)
    z = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = z / z.sum(axis=1, keepdims=True)
    eidx = probs.argmax(axis=1)
    gate = probs.max(axis=1)
    y = np.zeros_like(xt)
    counts = np.zeros(E, int)
    for t in range(T):
        e = eidx[t]
        if counts[e] >= C:
            continue
        counts[e] += 1
        h = act(xt[t] @ np.asarray(p["fc1_w"][e], np.float64)
                + np.asarray(p["fc1_b"][e], np.float64))
        y[t] = gate[t] * (h @ np.asarray(p["fc2_w"][e], np.float64)
                          + np.asarray(p["fc2_b"][e], np.float64))
    onehot = np.eye(E)[eidx]
    aux = E * float((onehot.mean(axis=0) * probs.mean(axis=0)).sum())
    return y.reshape(B, S, D), aux


def test_moe_mlp_matches_sequential_oracle():
    rs = np.random.RandomState(0)
    p = jax.tree_util.tree_map(
        jnp.asarray, vmoe.init_moe_mlp(jax.random.PRNGKey(1), 16, 32, 4))
    x = jnp.asarray(rs.randn(2, 9, 16), jnp.float32)
    relu = lambda v: jnp.maximum(v, 0)  # same fn applies to numpy arrays
    y, aux = jax.jit(lambda x, p: vmoe.moe_mlp(x, p, act=relu,
                                               capacity_factor=1.25))(x, p)
    y_ref, aux_ref = _np_moe_oracle(np.asarray(x), p,
                                    lambda v: np.maximum(v, 0), 1.25)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)
    assert np.isclose(float(aux), aux_ref, rtol=1e-5)


def test_moe_capacity_drops_late_tokens():
    # router forced to expert 0 for every token; capacity 8 < 20 tokens
    D, E = 8, 2
    p = jax.tree_util.tree_map(
        jnp.asarray, vmoe.init_moe_mlp(jax.random.PRNGKey(0), D, 16, E))
    p["router_w"] = jnp.zeros((D, E)).at[:, 0].set(10.0)
    p["fc2_b"] = p["fc2_b"] + 1.0  # make expert output nonzero everywhere
    # positive inputs => positive expert-0 logit => every token routes there
    x = jnp.asarray(np.abs(np.random.RandomState(0).randn(1, 20, D)) + 0.1,
                    jnp.float32)
    y, _ = vmoe.moe_mlp(x, p, act=lambda v: jnp.maximum(v, 0),
                        capacity_factor=0.5)
    C = vmoe.expert_capacity(20, E, 0.5)
    assert C == 8
    norms = np.linalg.norm(np.asarray(y[0]), axis=-1)
    assert (norms[:C] > 0).all(), "in-capacity tokens must get expert output"
    assert (norms[C:] == 0).all(), "over-capacity tokens must be dropped"


def _np_moe_top2_oracle(x, p, act, capacity_factor):
    """GShard top-2 oracle: all first choices queue first (token order),
    then all second choices; combine weights renormalized over the pair;
    capacity scales with topk like moe_mlp."""
    B, S, D = x.shape
    T = B * S
    E = p["router_w"].shape[1]
    C = vmoe.expert_capacity(T, E, capacity_factor * 2)
    xt = x.reshape(T, D).astype(np.float64)
    logits = xt @ np.asarray(p["router_w"], np.float64)
    z = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = z / z.sum(axis=1, keepdims=True)
    e1 = probs.argmax(axis=1)
    g1 = probs.max(axis=1)
    logits2 = logits.copy()
    logits2[np.arange(T), e1] = -np.inf   # mask the logit, not the prob
    e2 = logits2.argmax(axis=1)
    g2 = probs[np.arange(T), e2]
    denom = np.maximum(g1 + g2, 1e-9)
    g1, g2 = g1 / denom, g2 / denom

    def ffn(e, t):
        h = act(xt[t] @ np.asarray(p["fc1_w"][e], np.float64)
                + np.asarray(p["fc1_b"][e], np.float64))
        return h @ np.asarray(p["fc2_w"][e], np.float64) + np.asarray(
            p["fc2_b"][e], np.float64)

    y = np.zeros_like(xt)
    # first choices consume capacity in token order (dropped ones still
    # consume their queue position only in the einsum formulation when
    # pos < C — i.e. they do NOT: the queue advances but slots >= C vanish;
    # second choices start AFTER the full first-choice count)
    n1 = np.zeros(E, int)
    for t in range(T):
        if n1[e1[t]] < C:
            y[t] += g1[t] * ffn(e1[t], t)
        n1[e1[t]] += 1
    pos2 = n1.copy()  # second choices queue behind ALL first choices
    for t in range(T):
        if pos2[e2[t]] < C:
            y[t] += g2[t] * ffn(e2[t], t)
        pos2[e2[t]] += 1
    return y.reshape(B, S, D)


def test_moe_top2_matches_sequential_oracle():
    rs = np.random.RandomState(2)
    p = jax.tree_util.tree_map(
        jnp.asarray, vmoe.init_moe_mlp(jax.random.PRNGKey(4), 16, 32, 4))
    x = jnp.asarray(rs.randn(2, 11, 16), jnp.float32)
    relu = lambda v: jnp.maximum(v, 0)
    y, aux = jax.jit(lambda x, p: vmoe.moe_mlp(
        x, p, act=relu, capacity_factor=0.9, topk=2))(x, p)
    y_ref = _np_moe_top2_oracle(np.asarray(x), p,
                                lambda v: np.maximum(v, 0), 0.9)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)
    assert np.isfinite(float(aux))


def test_moe_top2_ep_train_step_runs():
    cfg2 = dataclasses.replace(MOE_TINY, moe_topk=2)
    tcfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                          moe_experts=4, ep_devices=2)
    mesh = vmesh.make_mesh(n_data=4, n_expert=2)
    tr = ViTTrainer(cfg2, tcfg, mesh)
    params = vmesh.shard_vit_params_ep(mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), cfg2))
    buf = vmesh.shard_vit_params_ep(mesh, sgd_init(params))
    imgs, labels = _rand_batch()
    si, sl = tr.shard(imgs, labels)
    params, buf, loss = tr._make_train_step(None)(
        params, buf, si, sl, 0.1, jax.random.PRNGKey(1), 0.1)
    assert np.isfinite(float(loss))


def test_moe_top2_saturated_router_no_double_dispatch():
    """A saturated router (non-top probs underflow to exactly 0 in f32)
    must still send the token's second choice to a DIFFERENT expert: a
    prob-space re-argmax returns expert 0 — here the first choice again —
    and the phantom second copy advances expert 0's second-choice queue,
    evicting the LAST real second choice (token 7 at position C). The
    oracle implements the correct (logit-masked) semantics."""
    D, E = 2, 2
    p = jax.tree_util.tree_map(
        jnp.asarray, vmoe.init_moe_mlp(jax.random.PRNGKey(0), D, 8, E))
    # feature 0 drives expert 0 (hard), feature 1 drives expert 1 (mild)
    p["router_w"] = jnp.asarray([[100.0, 0.0], [0.0, 1.0]], jnp.float32)
    p["fc2_b"] = p["fc2_b"] + 1.0
    x = np.zeros((1, 16, D), np.float32)
    x[0, 0] = [4.0, 0.0]    # token 0: logits [400, 0] -> probs [1, 0]
    x[0, 1:] = [0.0, 1.0]   # tokens 1..15: expert 1 first, expert 0 second
    C = vmoe.expert_capacity(16, E, 0.4 * 2)
    assert C == 8  # e0 queue: 1 first + 15 second choices; pos 8+ shed —
    # the buggy phantom at pos 1 would evict token 7 (real pos 7 -> 8)
    relu = lambda v: jnp.maximum(v, 0)
    y, _ = vmoe.moe_mlp(jnp.asarray(x), p, act=relu, capacity_factor=0.4,
                        topk=2)
    y_ref = _np_moe_top2_oracle(np.asarray(x), p,
                                lambda v: np.maximum(v, 0), 0.4)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-6)


def test_moe_topk_guards():
    p = vmoe.init_moe_mlp(jax.random.PRNGKey(0), 8, 16, 1)
    x = jnp.zeros((1, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="topk"):
        vmoe.moe_mlp(x, p, act=lambda v: v, topk=3)
    with pytest.raises(ValueError, match="2 experts"):
        vmoe.moe_mlp(x, p, act=lambda v: v, topk=2)


def test_moe_uniform_routing_aux_is_one():
    # symmetric router -> uniform probs; aux = E * sum_e f_e * (1/E) = 1
    D, E = 8, 4
    p = jax.tree_util.tree_map(
        jnp.asarray, vmoe.init_moe_mlp(jax.random.PRNGKey(0), D, 16, E))
    p["router_w"] = jnp.zeros((D, E))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, D), jnp.float32)
    _, aux = vmoe.moe_mlp(x, p, act=lambda v: v, capacity_factor=2.0)
    assert np.isclose(float(aux), 1.0, atol=1e-6)


# -------------------------------------------------------------- expert par ---

def test_ep_train_step_matches_replicated():
    tcfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                          moe_experts=4)
    imgs, labels = _rand_batch(classes=10)
    pkey = jax.random.PRNGKey(3)

    results = []
    for ep in (1, 2):
        cfg = dataclasses.replace(tcfg, ep_devices=ep)
        mesh = vmesh.make_mesh(n_data=8 // ep, n_expert=ep)
        tr = ViTTrainer(MOE_TINY, cfg, mesh)
        params = vvit.init_vit_params(jax.random.PRNGKey(0), MOE_TINY)
        if ep > 1:
            params = vmesh.shard_vit_params_ep(mesh, params)
            buf = vmesh.shard_vit_params_ep(mesh, sgd_init(params))
        else:
            params = vmesh.replicate(mesh, params)
            buf = vmesh.replicate(mesh, sgd_init(params))
        si, sl = tr.shard(imgs, labels)
        step = tr._make_train_step(None)
        params, buf, loss = step(params, buf, si, sl, 0.1, pkey, 0.1)
        results.append((jax.tree_util.tree_map(np.asarray, params),
                        float(loss)))
    (p_rep, l_rep), (p_ep, l_ep) = results
    assert np.isfinite(l_rep) and np.isclose(l_rep, l_ep, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_rep),
                    jax.tree_util.tree_leaves(p_ep)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_ep_weights_live_sharded():
    mesh = vmesh.make_mesh(n_data=2, n_expert=4)
    params = vmesh.shard_vit_params_ep(mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), MOE_TINY))
    moe_block = next(bp for bp in params["blocks"] if "moe" in bp)
    spec = moe_block["moe"]["fc1_w"].sharding.spec
    assert spec[0] == "expert"
    assert moe_block["moe"]["router_w"].sharding.spec == ()
    # dense blocks replicate
    dense_block = next(bp for bp in params["blocks"] if "moe" not in bp)
    assert dense_block["qkv_w"].sharding.spec == ()


def test_moe_model_has_dense_and_sparse_blocks():
    cfg = dataclasses.replace(TINY, moe_experts=2, layers=4, moe_every=2)
    params = vvit.init_vit_params(jax.random.PRNGKey(0), cfg)
    kinds = ["moe" if "moe" in bp else "dense" for bp in params["blocks"]]
    assert kinds == ["dense", "moe", "dense", "moe"]
    assert params["blocks"][1]["moe"]["fc1_w"].shape == (2, 32, 128)


def test_clip_sp_train_and_eval_match_dp():
    """Visual-tower sequence parallelism (gather AND ring) must reproduce
    the plain dp CLIP-HBA train step and eval loss. Tiny CLIP S=5 over a
    2-way sequence axis exercises both the ragged GSPMD shard and the ring
    pad (5 -> 6)."""
    from vit_project_tpu.models import clip as vclip
    from vit_project_tpu.adapters import dora as adora
    from vit_project_tpu.train.clip_loop import ClipHBATrainer

    ccfg = vclip.tiny_clip_config(width=32, layers=2, heads=2, patch=16,
                                  image_size=32, embed_dim=16)
    cparams = vclip.init_clip_params(jax.random.PRNGKey(0), ccfg)
    spec = adora.dora_spec(ccfg.visual.layers, ccfg.text.layers, 1, 1)
    rs = np.random.RandomState(0)
    prompts = rs.randint(1, 500, (66, ccfg.text.context_length)).astype(
        np.int32)
    imgs = rs.randint(0, 255, (8, 32, 32, 3), np.uint8)
    tgts = rs.rand(8, 66).astype(np.float32)

    results = []
    for sp, ring in ((False, False), (True, False), (True, True)):
        mesh = (vmesh.make_mesh(n_data=4, n_model=2) if sp
                else vmesh.make_mesh(n_data=8))
        trainable, static, acfg = adora.apply_dora(
            cparams, spec, r=4, key=jax.random.PRNGKey(1))
        tr = ClipHBATrainer(ccfg, cparams, acfg, static, prompts, lr=3e-4,
                            compute_dtype=jnp.float32, mesh=mesh,
                            sp=sp, sp_ring=ring)
        trainable = tr.prepare_state(trainable)
        opt_state = tr.init_opt_state(trainable)
        bi, bt, valid = tr._prep_batch(imgs, tgts)
        step = tr._train_step("random_target")
        trainable, opt_state, loss, ok = step(
            trainable, opt_state, tr.params, tr.static, bi, bt, valid,
            jax.random.PRNGKey(2), jax.random.PRNGKey(3))
        ev = tr._eval_step(trainable, tr.params, tr.static, bi, bt, valid)
        results.append((jax.tree_util.tree_map(np.asarray, trainable),
                        float(loss), float(ev)))

    (t_dp, l_dp, e_dp) = results[0]
    for t_sp, l_sp, e_sp in results[1:]:
        assert np.isclose(l_dp, l_sp, rtol=1e-5)
        assert np.isclose(e_dp, e_sp, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(t_dp),
                        jax.tree_util.tree_leaves(t_sp)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_batched_forks_refuse_sp():
    from vit_project_tpu.models import clip as vclip
    from vit_project_tpu.adapters import dora as adora
    from vit_project_tpu.train.clip_loop import ClipHBATrainer
    from vit_project_tpu.train import multi_fork as mf

    ccfg = vclip.tiny_clip_config()
    cparams = vclip.init_clip_params(jax.random.PRNGKey(0), ccfg)
    spec = adora.dora_spec(1, 1, 1, 1)
    _, static, acfg = adora.apply_dora(cparams, spec, r=4,
                                       key=jax.random.PRNGKey(1))
    prompts = np.ones((66, ccfg.text.context_length), np.int32)
    tr = ClipHBATrainer(ccfg, cparams, acfg, static, prompts, lr=3e-4,
                        mesh=vmesh.make_mesh(n_data=4, n_model=2),
                        sp=True)
    with pytest.raises(ValueError, match="sequence"):
        mf._build_batched_programs(tr, "random_target")


# ------------------------------------------------------------ compositions ---

def test_sp_composes_with_zero1():
    """sp (token-sharded activations over 'model') + ZeRO-1 (momentum over
    'data') together still reproduce the plain dp step."""
    imgs, labels = _rand_batch()
    pkey = jax.random.PRNGKey(3)

    def run(sp, zero1):
        cfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                             sp_devices=2 if sp else 1, zero1=zero1)
        mesh = vmesh.make_mesh(n_data=4 if sp else 8, n_model=2 if sp else 1)
        tr = ViTTrainer(TINY, cfg, mesh)
        params = vmesh.replicate(mesh, vvit.init_vit_params(
            jax.random.PRNGKey(0), TINY))
        buf = (vmesh.shard_opt_state(mesh, sgd_init(params)) if zero1
               else vmesh.replicate(mesh, sgd_init(params)))
        si, sl = tr.shard(imgs, labels)
        params, _, loss = tr._make_train_step(None)(
            params, buf, si, sl, 0.1, pkey, 0.1)
        return jax.tree_util.tree_map(np.asarray, params), float(loss)

    p_ref, l_ref = run(sp=False, zero1=False)
    p_got, l_got = run(sp=True, zero1=True)
    assert np.isclose(l_ref, l_got, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sp_composes_with_grad_accum():
    """sp + grad_accum reproduces the plain dp step (the accum microbatches
    stay token-sharded)."""
    imgs, labels = _rand_batch()
    pkey = jax.random.PRNGKey(3)

    def run(sp):
        cfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                             sp_devices=2 if sp else 1,
                             grad_accum=2 if sp else 1)
        mesh = vmesh.make_mesh(n_data=4 if sp else 8, n_model=2 if sp else 1)
        tr = ViTTrainer(TINY, cfg, mesh)
        params = vmesh.replicate(mesh, vvit.init_vit_params(
            jax.random.PRNGKey(0), TINY))
        buf = vmesh.replicate(mesh, sgd_init(params))
        si, sl = tr.shard(imgs, labels)
        params, _, loss = tr._make_train_step(None)(
            params, buf, si, sl, 0.1, pkey, 0.1)
        return jax.tree_util.tree_map(np.asarray, params), float(loss)

    p_ref, l_ref = run(False)
    p_got, l_got = run(True)
    assert np.isclose(l_ref, l_got, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_ep_composes_with_grad_accum():
    """ep + grad_accum trains (finite, learning); per-microbatch capacity
    means no exact-equality claim (see batch_grads docstring)."""
    tcfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                          moe_experts=4, ep_devices=2, grad_accum=2)
    mesh = vmesh.make_mesh(n_data=4, n_expert=2)
    tr = ViTTrainer(MOE_TINY, tcfg, mesh)
    params = vmesh.shard_vit_params_ep(mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), MOE_TINY))
    buf = vmesh.shard_vit_params_ep(mesh, sgd_init(params))
    imgs, labels = _rand_batch()
    si, sl = tr.shard(imgs, labels)
    step = tr._make_train_step(None)
    losses = []
    for i in range(3):
        params, buf, loss = step(params, buf, si, sl, 0.1,
                                 jax.random.PRNGKey(i), 0.1)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses) and losses[-1] < losses[0]


def test_moe_composes_with_grad_accum_and_remat():
    """MoE + grad_accum + remat trains (finite, loss decreases on a fixed
    batch). Not an equivalence test: routing capacity and the aux term are
    per-microbatch under grad_accum (see batch_grads docstring)."""
    cfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                         moe_experts=4, grad_accum=2, remat=True)
    tr = ViTTrainer(MOE_TINY, cfg, vmesh.make_mesh(n_data=8))
    params = vmesh.replicate(tr.mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), MOE_TINY))
    buf = vmesh.replicate(tr.mesh, sgd_init(params))
    imgs, labels = _rand_batch()
    si, sl = tr.shard(imgs, labels)
    step = tr._make_train_step(None)
    losses = []
    for i in range(4):
        params, buf, loss = step(params, buf, si, sl, 0.1,
                                 jax.random.PRNGKey(i), 0.1)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_sp_ring_composes_with_remat():
    """jax.checkpoint around a block containing shard_map(ring) must still
    reproduce the dp forward/backward."""
    imgs, labels = _rand_batch()
    pkey = jax.random.PRNGKey(3)

    def run(ring):
        cfg = ViTTrainConfig(batch_size=8, compute_dtype="float32",
                             sp_devices=2 if ring else 1, sp_ring=ring,
                             remat=ring)
        mesh = vmesh.make_mesh(n_data=4 if ring else 8,
                               n_model=2 if ring else 1)
        tr = ViTTrainer(TINY, cfg, mesh)
        params = vmesh.replicate(mesh, vvit.init_vit_params(
            jax.random.PRNGKey(0), TINY))
        buf = vmesh.replicate(mesh, sgd_init(params))
        si, sl = tr.shard(imgs, labels)
        params, _, loss = tr._make_train_step(None)(
            params, buf, si, sl, 0.1, pkey, 0.1)
        return jax.tree_util.tree_map(np.asarray, params), float(loss)

    p_ref, l_ref = run(False)
    p_got, l_got = run(True)
    assert np.isclose(l_ref, l_got, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_ep_sharded_orbax_roundtrip(tmp_path):
    """Expert-sharded trees go through the collective orbax writer and come
    back bit-equal (the pod checkpoint path for MoE runs)."""
    from vit_project_tpu.ckpt import serialization as ser
    mesh = vmesh.make_mesh(n_data=2, n_expert=4)
    params = vmesh.shard_vit_params_ep(mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), MOE_TINY))
    path = str(tmp_path / "ep_state.orbax")
    ser.save_sharded(path, {"params": params, "epoch": 7})
    restored = ser.load_sharded(path, {"params": params, "epoch": 0})
    assert restored["epoch"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_moe_checkpoint_roundtrip(tmp_path):
    """MoE param trees ride the generic checkpoint pytree path unchanged."""
    from vit_project_tpu.ckpt import vit_ckpt
    params = vvit.init_vit_params(jax.random.PRNGKey(0), MOE_TINY)
    buf = sgd_init(params)
    vit_ckpt.save_checkpoint(3, params, buf, {"last_epoch": 3}, 1.0, 2.0,
                             50.0, str(tmp_path), sharded=False)
    ckpt = vit_ckpt.load_checkpoint(
        vit_ckpt.latest_checkpoint(str(tmp_path)))
    assert ckpt["epoch"] == 3
    got = ckpt["params"]["blocks"][1]["moe"]["fc1_w"]
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(params["blocks"][1]["moe"]["fc1_w"]))


# ------------------------------------------------------------------ guards ---

def test_mode_guards():
    with pytest.raises(ValueError, match="at most one"):
        vmesh.make_mesh(n_data=2, n_model=2, n_expert=2)
    with pytest.raises(ValueError, match="MoE model"):
        ViTTrainer(TINY, ViTTrainConfig(batch_size=8, ep_devices=2))
    with pytest.raises(ValueError, match="second mesh axis"):
        ViTTrainer(TINY, ViTTrainConfig(batch_size=8, sp_devices=2,
                                        pp_stages=2))
    with pytest.raises(ValueError, match="pipeline"):
        ViTTrainer(MOE_TINY, ViTTrainConfig(batch_size=8, pp_stages=2,
                                            pp_micro=2))
    # sp_ring needs sp; ring pads, so it refuses MoE (capacity competition)
    with pytest.raises(ValueError, match="sp_devices"):
        ViTTrainer(TINY, ViTTrainConfig(batch_size=8, sp_ring=True))
    with pytest.raises(ValueError, match="expert capacity"):
        ViTTrainer(MOE_TINY, ViTTrainConfig(batch_size=8, sp_devices=2,
                                            sp_ring=True))
    with pytest.raises(ValueError, match="expert capacity"):
        vvit.vit_encode(vvit.init_vit_params(jax.random.PRNGKey(0), MOE_TINY),
                        jnp.zeros((2, 32, 32, 3), jnp.float32), MOE_TINY,
                        seq_shard=vmesh.seq_sharding(
                            vmesh.make_mesh(n_data=4, n_model=2)),
                        ring_attn=True)
    # zero1 pins params replicated / momentum data-sharded — defeats ep
    with pytest.raises(ValueError, match="zero1"):
        ViTTrainer(MOE_TINY, ViTTrainConfig(batch_size=8, ep_devices=2,
                                            moe_experts=4, zero1=True))
    # a caller-supplied mesh without the 'expert' axis would silently
    # replicate the experts — must raise like the pp mesh check
    with pytest.raises(ValueError, match="'expert' axis"):
        ViTTrainer(MOE_TINY, ViTTrainConfig(batch_size=8, ep_devices=2,
                                            moe_experts=4),
                   vmesh.make_mesh(n_data=8))
    # CLIP sp on a meshless trainer: clear error, not an AttributeError
    from vit_project_tpu.models import clip as vclip
    from vit_project_tpu.adapters import dora as adora
    from vit_project_tpu.train.clip_loop import ClipHBATrainer
    ccfg = vclip.tiny_clip_config()
    cparams = vclip.init_clip_params(jax.random.PRNGKey(0), ccfg)
    _, static, acfg = adora.apply_dora(cparams, adora.dora_spec(1, 1, 1, 1),
                                       r=4, key=jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="mesh"):
        ClipHBATrainer(ccfg, cparams, acfg, static,
                       np.ones((66, ccfg.text.context_length), np.int32),
                       lr=3e-4, mesh=None, sp=True)
    # the two MoE config surfaces must agree when both are given
    from vit_project_tpu.train.vit_loop import run_vit_training
    with pytest.raises(ValueError, match="disagrees"):
        run_vit_training(ViTTrainConfig(batch_size=8, moe_experts=8),
                         vit_cfg=MOE_TINY)
