"""Unit tests for the ops layer: nn primitives, attention, DoRA math, RSA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.io  # noqa: F401  (ensures scipy present)
from scipy.stats import spearmanr, rankdata

from vit_project_tpu.ops import nn as vnn
from vit_project_tpu.ops import attention as attn
from vit_project_tpu.ops import dora as vdora
from vit_project_tpu.ops import rsa as vrsa


class TestNN:
    def test_layer_norm_matches_manual(self):
        x = np.random.RandomState(0).randn(4, 7, 32).astype(np.float32)
        scale = np.random.RandomState(1).randn(32).astype(np.float32)
        bias = np.random.RandomState(2).randn(32).astype(np.float32)
        got = vnn.layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        want = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_patch_embed_equals_conv(self):
        """conv(stride=kernel=patch) == reshape+matmul."""
        rs = np.random.RandomState(0)
        B, H, W, C, P, D = 2, 8, 8, 3, 4, 16
        img = rs.randn(B, H, W, C).astype(np.float32)
        kernel = rs.randn(D, C, P, P).astype(np.float32)  # torch conv layout
        bias = rs.randn(D).astype(np.float32)
        w = vnn.conv_kernel_to_patch_matrix(kernel)
        got = vnn.patch_embed(jnp.asarray(img), jnp.asarray(w), jnp.asarray(bias), P)
        # direct conv with lax
        out = jax.lax.conv_general_dilated(
            jnp.asarray(img), jnp.asarray(np.transpose(kernel, (2, 3, 1, 0))),
            window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        want = np.asarray(out).reshape(B, -1, D) + bias
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_quick_gelu(self):
        x = jnp.linspace(-3, 3, 7)
        got = vnn.quick_gelu(x)
        want = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


class TestAttention:
    def test_reference_softmax_attention(self):
        rs = np.random.RandomState(0)
        q = rs.randn(2, 3, 5, 8).astype(np.float32)
        k = rs.randn(2, 3, 5, 8).astype(np.float32)
        v = rs.randn(2, 3, 5, 8).astype(np.float32)
        got = attn.mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        want = np.einsum("bhqk,bhkd->bhqd", p, v)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_causal_mask(self):
        rs = np.random.RandomState(1)
        q = jnp.asarray(rs.randn(1, 1, 4, 8).astype(np.float32))
        out = attn.mha_reference(q, q, q, causal=True)
        # row 0 attends only to itself -> equals v[0]
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0],
                                   np.asarray(q)[0, 0, 0], atol=1e-5)

    def test_pallas_interpret_matches_reference(self):
        """Run the Pallas kernel in interpreter mode on CPU and compare."""
        from jax.experimental.pallas import tpu as pltpu
        rs = np.random.RandomState(2)
        q = jnp.asarray(rs.randn(2, 2, 13, 16).astype(np.float32))
        k = jnp.asarray(rs.randn(2, 2, 13, 16).astype(np.float32))
        v = jnp.asarray(rs.randn(2, 2, 13, 16).astype(np.float32))
        want = attn.mha_reference(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            got = attn._mha_pallas_raw(q, k, v, causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_vjp_matches_reference_grad(self):
        rs = np.random.RandomState(3)
        q = jnp.asarray(rs.randn(1, 2, 6, 8).astype(np.float32))
        k = jnp.asarray(rs.randn(1, 2, 6, 8).astype(np.float32))
        v = jnp.asarray(rs.randn(1, 2, 6, 8).astype(np.float32))

        def loss_ref(q, k, v):
            return jnp.sum(attn.mha_reference(q, k, v) ** 2)

        gref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        # the hand-written bwd math must match XLA autodiff
        o = attn.mha_reference(q, k, v)
        gcustom = attn.mha_bwd_reference(q, k, v, 2 * o)
        for a, b in zip(gref, gcustom):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("causal", [False, True])
    def test_pallas_bwd_kernel_matches_reference(self, causal):
        """The flash-style Pallas backward kernel (interpret mode on CPU) vs the
        XLA reference backward."""
        from jax.experimental.pallas import tpu as pltpu
        rs = np.random.RandomState(4)
        shp = (2, 3, 13, 16)
        q = jnp.asarray(rs.randn(*shp).astype(np.float32))
        k = jnp.asarray(rs.randn(*shp).astype(np.float32))
        v = jnp.asarray(rs.randn(*shp).astype(np.float32))
        do = jnp.asarray(rs.randn(*shp).astype(np.float32))
        want = attn.mha_bwd_reference(q, k, v, do, causal)
        with pltpu.force_tpu_interpret_mode():
            got = attn._mha_bwd_pallas(q, k, v, do, causal)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestDoRA:
    """Validate DoRA against an independently-written torch oracle implementing
    the reference equations (DoRALayer, new_cvpr...pipeline.py:407-481)."""

    def test_init_decomposition(self):
        rs = np.random.RandomState(0)
        w = rs.randn(16, 12).astype(np.float32)  # [in, out]
        tr, buf = vdora.dora_init(jax.random.PRNGKey(0), jnp.asarray(w), r=4)
        # m = column norms, D unit columns, D*m == w
        np.testing.assert_allclose(np.asarray(tr["m"]),
                                   np.linalg.norm(w, axis=0), rtol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(buf["D"]), axis=0),
            np.ones(12), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(buf["D"]) * np.asarray(tr["m"]),
                                   w, rtol=1e-5)

    def test_kaiming_bounds(self):
        tr, _ = vdora.dora_init(jax.random.PRNGKey(1),
                                jnp.ones((64, 48)), r=8)
        A = np.asarray(tr["delta_D_A"])  # [8, 48] -> bound 1/sqrt(48)
        B = np.asarray(tr["delta_D_B"])  # [64, 8] -> bound 1/sqrt(8)
        assert np.abs(A).max() <= 1 / np.sqrt(48) + 1e-6
        assert np.abs(B).max() <= 1 / np.sqrt(8) + 1e-6
        # and they are not degenerate
        assert np.abs(A).max() > 0.5 / np.sqrt(48)

    def test_adapted_weight_against_torch_oracle(self):
        import torch
        rs = np.random.RandomState(0)
        in_f, out_f, r, alpha = 10, 6, 3, 16
        w = rs.randn(in_f, out_f).astype(np.float32)
        A = rs.randn(r, out_f).astype(np.float32)
        B = rs.randn(in_f, r).astype(np.float32)
        m = rs.rand(out_f).astype(np.float32) + 0.5

        tr = {"m": jnp.asarray(m), "delta_D_A": jnp.asarray(A),
              "delta_D_B": jnp.asarray(B)}
        D = jnp.asarray(w) / jnp.linalg.norm(jnp.asarray(w), axis=0)
        got = vdora.dora_weight(tr, D, alpha=alpha, r=r)

        # torch oracle: the reference weight property, written from the equations
        tw = torch.tensor(w)
        tD = tw / torch.norm(tw, dim=0)
        delta = (torch.tensor(B) @ torch.tensor(A)) * (alpha / r)
        Dn = tD + delta
        norms = torch.norm(Dn, dim=0, keepdim=True) + 1e-8
        want = (Dn / norms) * torch.tensor(m)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_dropout_on_delta_not_activations(self):
        """With dropout_p=1.0 every delta entry is dropped -> W = m * colnorm(D)."""
        rs = np.random.RandomState(0)
        w = rs.randn(8, 4).astype(np.float32)
        tr, buf = vdora.dora_init(jax.random.PRNGKey(0), jnp.asarray(w), r=2)
        wfull = vdora.dora_weight(tr, buf["D"], alpha=16, r=2,
                                  dropout_p=0.9999999, deterministic=False,
                                  dropout_key=jax.random.PRNGKey(1))
        # D already unit columns -> colnorm(D) = D, so W == D * m == original w
        np.testing.assert_allclose(np.asarray(wfull), w, rtol=1e-3, atol=1e-4)

    def test_param_count_vit_l14(self):
        """rank 32, out_proj 1024x1024 (x2 visual) + 768x768 (x1 text)
        -> 183,040 trainable params (reference log evidence)."""
        def n(in_f, out_f, r=32):
            return out_f + r * out_f + in_f * r
        total = 2 * n(1024, 1024) + n(768, 768)
        assert total == 183040


class TestRSA:
    def test_rdm_matches_numpy(self):
        rs = np.random.RandomState(0)
        emb = rs.randn(48, 66).astype(np.float32)
        got = np.asarray(vrsa.rdm_from_embeddings(jnp.asarray(emb)))
        want = 1 - np.corrcoef(emb)
        np.fill_diagonal(want, 0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_rankdata_with_ties(self):
        a = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0])
        got = np.asarray(vrsa.rankdata_average(jnp.asarray(a)))
        want = rankdata(a)
        np.testing.assert_allclose(got, want)

    def test_spearman_matches_scipy_with_ties(self):
        rs = np.random.RandomState(0)
        # quantize to force ties (the human triplet RDM has ties)
        x = (np.round(rs.rand(1128) * 20) / 20).astype(np.float32)
        y = (np.round(rs.rand(1128) * 20) / 20 + 0.3 * x).astype(np.float32)
        rho, p = vrsa.spearman(jnp.asarray(x), jnp.asarray(y))
        want_rho, want_p = spearmanr(x, y)
        np.testing.assert_allclose(float(rho), want_rho, atol=1e-5)
        np.testing.assert_allclose(float(p), want_p, rtol=1e-4, atol=1e-12)

    def test_behavioral_rsa_end_to_end_vs_scipy(self):
        rs = np.random.RandomState(1)
        emb = rs.randn(48, 66).astype(np.float32)
        ref_rdm = rs.rand(48, 48).astype(np.float32)
        ref_rdm = (ref_rdm + ref_rdm.T) / 2
        np.fill_diagonal(ref_rdm, 0)
        rho, p, model_rdm = vrsa.behavioral_rsa(jnp.asarray(emb),
                                                jnp.asarray(ref_rdm))
        want_rdm = 1 - np.corrcoef(emb)
        np.fill_diagonal(want_rdm, 0)
        iu = np.triu_indices_from(ref_rdm, k=1)
        want_rho, want_p = spearmanr(ref_rdm[iu], want_rdm[iu])
        np.testing.assert_allclose(float(rho), want_rho, atol=1e-5)
        np.testing.assert_allclose(float(p), want_p, rtol=1e-3, atol=1e-12)


class TestFusedXlaAttention:
    """The DEFAULT attention path (mha_fused_xla) against the reference."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference(self, causal):
        rs = np.random.RandomState(5)
        q = jnp.asarray(rs.randn(2, 3, 9, 16).astype(np.float32))
        k = jnp.asarray(rs.randn(2, 3, 9, 16).astype(np.float32))
        v = jnp.asarray(rs.randn(2, 3, 9, 16).astype(np.float32))
        got = attn.mha_fused_xla(q, k, v, causal=causal)
        want = attn.mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_default_dispatch_is_fused_xla(self):
        rs = np.random.RandomState(6)
        q = jnp.asarray(rs.randn(1, 2, 5, 8).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(attn.attention_core(q, q, q)),
            np.asarray(attn.mha_fused_xla(q, q, q)))


class TestFlashMhaPacked:
    """The layout-native packed flash kernel (ops/attention.py
    flash_mha_packed): q/k/v in [B,S,D] with heads as lane slices, in-kernel
    tail masks instead of padded copies, flash-style recompute backward.
    Runs in interpret mode on CPU — the same kernel code that runs compiled
    on the TPU (where it measured 280 -> 231 ms/step at ViT-B/16 b256)."""

    def _ref(self, q, k, v, B, S, H, dh, causal):
        q4, k4, v4 = (t.reshape(B, S, H, dh).transpose(0, 2, 1, 3)
                      for t in (q, k, v))
        o = attn.mha_reference(q4, k4, v4, causal=causal)
        return o.transpose(0, 2, 1, 3).reshape(B, S, D_PACK)

    @pytest.mark.parametrize("causal", [False, True])
    def test_fwd_and_bwd_match_reference(self, causal):
        B, S, H, dh = 2, 13, 2, 16           # odd S exercises the tail masks
        global D_PACK
        D_PACK = H * dh
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q, k, v, do = [jax.random.normal(kk, (B, S, D_PACK)) for kk in ks]
        scale = 1.0 / dh ** 0.5

        def packed(q, k, v):
            return attn.flash_mha_packed(q * scale, k, v, num_heads=H,
                                         causal=causal)

        got = packed(q, k, v)
        want = self._ref(q, k, v, B, S, H, dh, causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        g1 = jax.grad(lambda *a: (packed(*a) * do).sum(),
                      argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: (self._ref(*a, B, S, H, dh, causal)
                                  * do).sum(), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_block_forward_pallas_matches_xla(self):
        from vit_project_tpu.models import vit as vvit
        cfg = vvit.ViTConfig(patch=8, width=64, layers=2, heads=2,
                             image_size=32, num_classes=10)
        p = vvit.init_vit_params(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
        la = vvit.vit_classify(p, imgs, cfg, use_pallas=False)
        lb = vvit.vit_classify(p, imgs, cfg, use_pallas=True)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-5)


class TestFusedLayerNorm:
    """layer_norm_fused (Pallas one-pass VJP) vs the XLA layer_norm oracle."""

    @pytest.mark.parametrize("shape,dtype", [
        ((3, 9, 64), jnp.float32),       # padded tail rows (27 % 256 != 0)
        ((2, 300, 128), jnp.float32),    # 600 rows -> 3 blocks, padded
        ((4, 16, 256), jnp.bfloat16),
    ])
    def test_matches_reference_fwd_and_grads(self, shape, dtype):
        from vit_project_tpu.ops import layernorm as vln
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(*shape), dtype)
        scale = jnp.asarray(1.0 + 0.1 * rs.randn(shape[-1]), jnp.float32)
        bias = jnp.asarray(0.1 * rs.randn(shape[-1]), jnp.float32)
        do = jnp.asarray(rs.randn(*shape), jnp.float32)

        y = vln.layer_norm_fused(x, scale, bias)
        want = vnn.layer_norm(x, scale, bias)
        tol = 2e-6 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(want, np.float32), atol=tol)

        def loss_fused(x, s, b):
            return jnp.sum(vln.layer_norm_fused(x, s, b).astype(jnp.float32)
                           * do)

        def loss_ref(x, s, b):
            return jnp.sum(vnn.layer_norm(x, s, b).astype(jnp.float32) * do)

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        # dscale/dbias are 100s-of-rows reductions: allow summation-order noise
        gtol = 1e-4 if dtype == jnp.float32 else 5e-2
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-5, atol=gtol)


class TestFlashMhaPackedQkv:
    """Single-tensor packed qkv flash kernel (flash_mha_packed_qkv): one
    [B,S,3D] input from ONE fused projection, one [B,S,3D] cotangent out."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_fwd_and_bwd_match_reference(self, causal):
        B, S, H, dh = 2, 13, 2, 16           # odd S exercises the tail masks
        D = H * dh
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q, k, v, do = [jax.random.normal(kk, (B, S, D)) for kk in ks]
        scale = 1.0 / dh ** 0.5

        def packed3(q, k, v):
            qkv = jnp.concatenate([q * scale, k, v], axis=-1)
            return attn.flash_mha_packed_qkv(qkv, num_heads=H, causal=causal)

        def ref(q, k, v):
            q4, k4, v4 = (t.reshape(B, S, H, dh).transpose(0, 2, 1, 3)
                          for t in (q, k, v))
            o = attn.mha_reference(q4, k4, v4, causal=causal)
            return o.transpose(0, 2, 1, 3).reshape(B, S, D)

        got = packed3(q, k, v)
        want = ref(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        g1 = jax.grad(lambda *a: (packed3(*a) * do).sum(),
                      argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: (ref(*a) * do).sum(),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_matches_three_tensor_kernel(self):
        B, S, H, dh = 3, 16, 4, 8
        D = H * dh
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q, k, v = [jax.random.normal(kk, (B, S, D)) for kk in ks]
        scale = 1.0 / dh ** 0.5
        a = attn.flash_mha_packed(q * scale, k, v, num_heads=H)
        b = attn.flash_mha_packed_qkv(
            jnp.concatenate([q * scale, k, v], axis=-1), num_heads=H)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestEntryPointGuards:
    """Misuse must fail loudly, not return garbage lanes or NaN columns."""

    def test_flash_packed_rejects_indivisible_heads(self):
        q = jnp.zeros((1, 8, 20))
        with pytest.raises(ValueError, match="not divisible"):
            attn.flash_mha_packed(q, q, q, num_heads=3)

    def test_flash_packed_qkv_rejects_misaligned_width(self):
        with pytest.raises(ValueError, match="3\\*D"):
            attn.flash_mha_packed_qkv(jnp.zeros((1, 8, 64)), num_heads=4)
        with pytest.raises(ValueError, match="3\\*D"):
            attn.flash_mha_packed_qkv(jnp.zeros((1, 8, 60)), num_heads=8)

    def test_dora_init_zero_column_stays_finite(self):
        w = np.random.RandomState(0).randn(16, 8).astype(np.float32)
        w[:, 3] = 0.0   # pruned output column
        tr, buf = vdora.dora_init(jax.random.PRNGKey(0), jnp.asarray(w), r=2)
        assert np.isfinite(np.asarray(buf["D"])).all()
        assert np.allclose(np.asarray(buf["D"])[:, 3], 0.0)
        # nonzero columns keep their exact (epsilon-free) unit norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(buf["D"])[:, 0]), 1.0, rtol=1e-6)

    def test_dora_weight_requires_dropout_key(self):
        w = jnp.asarray(np.random.RandomState(1).randn(16, 8),
                        dtype=jnp.float32)
        tr, buf = vdora.dora_init(jax.random.PRNGKey(0), w, r=2)
        with pytest.raises(ValueError, match="dropout_key"):
            vdora.dora_weight(tr, buf["D"], alpha=16, r=2, dropout_p=0.1,
                              deterministic=False)


class TestFusedDW:
    """Streaming Pallas dW+bias-grad kernel (ops/fused_dw.py): one pass over
    the cotangent produces both the weight grad and the bias grad that XLA
    otherwise computes as a separate bandwidth-bound reduction (round-3
    trace: the 24.4 ms reduces/converts bucket)."""

    def test_kernel_matches_oracle(self):
        from vit_project_tpu.ops import fused_dw as fdw
        rs = np.random.RandomState(0)
        # last shape forces BOTH dW dims to tile (ji > 1 and jo > 1): the
        # regime where a wrong grid order would flush the db accumulator
        # between non-consecutive revisits on hardware
        for (N, Din, Dout) in [(50, 768, 2304), (197, 64, 1000),
                               (300, 256, 768), (64, 2048, 2560)]:
            x = jnp.asarray(rs.randn(N, Din).astype(np.float32))
            g = jnp.asarray(rs.randn(N, Dout).astype(np.float32))
            dw, db = fdw.dw_db_pallas(x, g, interpret=True)
            np.testing.assert_allclose(
                np.asarray(dw), np.asarray(x).T @ np.asarray(g),
                rtol=2e-5, atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(db), np.asarray(g).sum(0), rtol=2e-5, atol=2e-4)

    def test_custom_vjp_matches_dense_autodiff(self):
        from vit_project_tpu.ops import fused_dw as fdw
        rs = np.random.RandomState(1)
        w = jnp.asarray(rs.randn(128, 256).astype(np.float32))
        b = jnp.asarray(rs.randn(256).astype(np.float32))
        x = jnp.asarray(rs.randn(4, 37, 128).astype(np.float32))

        def loss_fused(x, w, b):
            return jnp.sum(jnp.sin(fdw.dense_dw_fused(x, w, b)))

        def loss_ref(x, w, b):
            return jnp.sum(jnp.sin(x @ w + b))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-5, atol=2e-4)

    def test_train_step_equivalence_and_flag_restore(self):
        """A ViT train step with fused_dw trains the same f32 trajectory as
        the XLA path, and the trace-time toggle round-trips."""
        from vit_project_tpu.core.configs import ViTTrainConfig
        from vit_project_tpu.models import vit as vvit
        from vit_project_tpu.train.vit_loop import ViTTrainer, sgd_init
        from vit_project_tpu.ops import nn as vnn
        rs = np.random.RandomState(2)
        cfg = vvit.ViTConfig(patch=8, width=64, layers=2, heads=2,
                             image_size=32, num_classes=10)
        imgs = rs.randint(0, 255, (8, 32, 32, 3), np.uint8)
        lbls = rs.randint(0, 10, 8).astype(np.int32)

        from vit_project_tpu.parallel import mesh as vmesh

        def run(fused):
            # fused_dw is single-chip only (guard tested below); pin a
            # 1-device mesh under the 8-virtual-device test env
            tr = ViTTrainer(cfg, ViTTrainConfig(
                batch_size=8, compute_dtype="float32", image_size=32,
                num_classes=10, fused_dw=fused),
                vmesh.make_mesh(n_data=1, devices=jax.devices()[:1]))
            try:
                params = vvit.init_vit_params(jax.random.PRNGKey(0), cfg)
                step = tr._make_train_step(None)
                p2, _, loss = step(params, sgd_init(params),
                                   jnp.asarray(imgs), jnp.asarray(lbls),
                                   0.1, jax.random.PRNGKey(1), 0.1)
                return float(loss), p2
            finally:
                vnn.set_dense_dw_fused(False)

        l0, p0 = run(False)
        l1, p1 = run(True)
        assert abs(l0 - l1) < 1e-6
        for a, c in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-4)
        assert vnn._DW_FUSED is False  # toggle restored

    def test_fused_dw_refuses_multidevice_mesh(self):
        """The kernel has no GSPMD rule — a sharded mesh must refuse up
        front instead of silently all-gathering operands."""
        import pytest
        from vit_project_tpu.core.configs import ViTTrainConfig
        from vit_project_tpu.models import vit as vvit
        from vit_project_tpu.train.vit_loop import ViTTrainer
        from vit_project_tpu.ops import nn as vnn
        cfg = vvit.ViTConfig(patch=8, width=64, layers=2, heads=2,
                             image_size=32, num_classes=10)
        with pytest.raises(ValueError, match="single-chip"):
            ViTTrainer(cfg, ViTTrainConfig(
                batch_size=8, compute_dtype="float32", image_size=32,
                num_classes=10, fused_dw=True))
        assert vnn._DW_FUSED is False
