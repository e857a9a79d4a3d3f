"""Model-layer tests: block numerics vs a torch oracle, CLIP-HBA forward contract,
DoRA adapter integration, converters, tokenizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.models import vit as vvit
from vit_project_tpu.models import clip as vclip
from vit_project_tpu.models import convert as vconvert
from vit_project_tpu.models import tokenizer as vtok
from vit_project_tpu.adapters import dora as adora
from vit_project_tpu.data.spose66 import SPOSE_DIMENSIONS_66


def _np(x):
    return np.asarray(x)


class TestBlockVsTorch:
    """Our pre-norm transformer block against torch nn.MultiheadAttention."""

    @pytest.mark.parametrize("quick_gelu", [False, True])
    def test_block_forward_matches_torch(self, quick_gelu):
        import torch
        import torch.nn as tnn

        W, H, S, B = 32, 4, 10, 2
        rs = np.random.RandomState(0)
        p = vvit.init_block(jax.random.PRNGKey(0), W, 4)
        # randomize LN affine so the test is not trivial
        p["ln1"]["scale"] = jnp.asarray(rs.rand(W).astype(np.float32) + 0.5)
        p["ln2"]["bias"] = jnp.asarray(rs.randn(W).astype(np.float32) * 0.1)
        x = rs.randn(B, S, W).astype(np.float32)

        got = vvit.block_forward(p, jnp.asarray(x), H, quick_gelu=quick_gelu,
                                 use_pallas=False)

        # torch oracle
        attn = tnn.MultiheadAttention(W, H, batch_first=True)
        with torch.no_grad():
            attn.in_proj_weight.copy_(torch.tensor(_np(p["qkv_w"]).T))
            attn.in_proj_bias.copy_(torch.tensor(_np(p["qkv_b"])))
            attn.out_proj.weight.copy_(torch.tensor(_np(p["out_w"]).T))
            attn.out_proj.bias.copy_(torch.tensor(_np(p["out_b"])))
        ln1 = tnn.LayerNorm(W)
        ln2 = tnn.LayerNorm(W)
        with torch.no_grad():
            ln1.weight.copy_(torch.tensor(_np(p["ln1"]["scale"])))
            ln1.bias.copy_(torch.tensor(_np(p["ln1"]["bias"])))
            ln2.weight.copy_(torch.tensor(_np(p["ln2"]["scale"])))
            ln2.bias.copy_(torch.tensor(_np(p["ln2"]["bias"])))
        fc1 = tnn.Linear(W, 4 * W)
        fc2 = tnn.Linear(4 * W, W)
        with torch.no_grad():
            fc1.weight.copy_(torch.tensor(_np(p["fc1_w"]).T))
            fc1.bias.copy_(torch.tensor(_np(p["fc1_b"])))
            fc2.weight.copy_(torch.tensor(_np(p["fc2_w"]).T))
            fc2.bias.copy_(torch.tensor(_np(p["fc2_b"])))

        xt = torch.tensor(x)
        with torch.no_grad():
            h = ln1(xt)
            a, _ = attn(h, h, h, need_weights=False)
            xt2 = xt + a
            h2 = ln2(xt2)
            if quick_gelu:
                m = fc2(fc1(h2) * torch.sigmoid(1.702 * fc1(h2)))
            else:
                m = fc2(torch.nn.functional.gelu(fc1(h2)))
            want = xt2 + m
        np.testing.assert_allclose(_np(got), want.numpy(), rtol=1e-4, atol=1e-4)

    def test_causal_block_matches_torch(self):
        import torch
        import torch.nn as tnn
        W, H, S = 16, 2, 7
        rs = np.random.RandomState(1)
        p = vvit.init_block(jax.random.PRNGKey(1), W, 4)
        x = rs.randn(1, S, W).astype(np.float32)
        got = vvit.block_forward(p, jnp.asarray(x), H, quick_gelu=True,
                                 causal=True, use_pallas=False)
        attn = tnn.MultiheadAttention(W, H, batch_first=True)
        with torch.no_grad():
            attn.in_proj_weight.copy_(torch.tensor(_np(p["qkv_w"]).T))
            attn.in_proj_bias.copy_(torch.tensor(_np(p["qkv_b"])))
            attn.out_proj.weight.copy_(torch.tensor(_np(p["out_w"]).T))
            attn.out_proj.bias.copy_(torch.tensor(_np(p["out_b"])))
        mask = torch.triu(torch.full((S, S), float("-inf")), diagonal=1)
        xt = torch.tensor(x)
        with torch.no_grad():
            h = torch.nn.functional.layer_norm(xt, (W,))
            a, _ = attn(h, h, h, attn_mask=mask, need_weights=False)
            h2 = torch.nn.functional.layer_norm(xt + a, (W,))
            f1 = h2 @ torch.tensor(_np(p["fc1_w"])) + torch.tensor(_np(p["fc1_b"]))
            f1 = f1 * torch.sigmoid(1.702 * f1)
            m = f1 @ torch.tensor(_np(p["fc2_w"])) + torch.tensor(_np(p["fc2_b"]))
            want = xt + a + m
        np.testing.assert_allclose(_np(got), want.numpy(), rtol=1e-4, atol=1e-4)

    def test_remat_grads_match(self):
        """remat=True must be a pure memory/FLOPs tradeoff: loss and grads
        bit-identical to the plain forward (jax.checkpoint replays the same
        math with the same keys)."""
        cfg = vvit.ViTConfig(patch=8, width=32, layers=3, heads=2,
                             image_size=32, num_classes=5)
        p = vvit.init_vit_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3)
                        .astype(np.float32))
        y = jnp.asarray([1, 3])

        def loss(p, remat):
            lo = vvit.vit_classify(p, x, cfg, use_pallas=False, remat=remat)
            lp = jax.nn.log_softmax(lo)
            return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))

        l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(p)
        l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(p)
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(_np(a), _np(b))

    def test_clip_remat_grads_match(self):
        """Same remat invariance for the CLIP tower path."""
        from vit_project_tpu.models import clip as vclip
        cfg = vclip.tiny_clip_config()
        p = vclip.init_clip_params(jax.random.PRNGKey(1), cfg)
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32))
        prompts = jnp.asarray(rs.randint(1, 400, (5, cfg.text.context_length))
                              .astype(np.int32))

        def loss(p, remat):
            s = vclip.clip_hba_forward(p, x, prompts, cfg, use_pallas=False,
                                       remat=remat)
            return jnp.mean(s ** 2)

        l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(p)
        l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(p)
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(_np(a), _np(b))

    def test_tp_layout_auto_routes_to_xla_path(self):
        """TP params store qkv_w head-aligned as [D, 3, D]
        (shard_vit_params_tp); block_forward must route that layout to the
        XLA attention path even when the caller asks for pallas (the flash
        kernel would flatten the model-sharded minor axis) and produce the
        same output as the canonical [D, 3D] layout."""
        W, H, S = 16, 2, 7
        rs = np.random.RandomState(2)
        p = vvit.init_block(jax.random.PRNGKey(2), W, 4)
        x = jnp.asarray(rs.randn(2, S, W).astype(np.float32))
        want = vvit.block_forward(p, x, H, quick_gelu=False, use_pallas=False)
        p3 = dict(p, qkv_w=p["qkv_w"].reshape(W, 3, W),
                  qkv_b=p["qkv_b"].reshape(3, W))
        for up in (True, None):
            got = vvit.block_forward(p3, x, H, quick_gelu=False,
                                     use_pallas=up)
            np.testing.assert_allclose(_np(got), _np(want), rtol=1e-6,
                                       atol=1e-6)


class TestViTClassifier:
    def test_logits_and_features(self):
        cfg = vvit.ViTConfig(patch=8, width=32, layers=2, heads=2,
                             image_size=32, num_classes=10)
        p = vvit.init_vit_params(jax.random.PRNGKey(0), cfg)
        img = jnp.asarray(np.random.RandomState(0)
                          .randn(2, 32, 32, 3).astype(np.float32))
        logits = vvit.vit_classify(p, img, cfg, use_pallas=False)
        assert logits.shape == (2, 10)
        cls = vvit.forward_features(p, img, cfg, pool="token", use_pallas=False)
        avg = vvit.forward_features(p, img, cfg, pool="avg", use_pallas=False)
        assert cls.shape == (2, 32) and avg.shape == (2, 32)
        assert not np.allclose(_np(cls), _np(avg))

    def test_timm_converter_shapes(self):
        """Build a timm-style state dict and verify conversion runs forward."""
        rs = np.random.RandomState(0)
        W, L, P, N = 32, 2, 8, (32 // 8) ** 2 + 1
        sd = {
            "patch_embed.proj.weight": rs.randn(W, 3, P, P).astype(np.float32),
            "patch_embed.proj.bias": rs.randn(W).astype(np.float32),
            "cls_token": rs.randn(1, 1, W).astype(np.float32),
            "pos_embed": rs.randn(1, N, W).astype(np.float32),
            "norm.weight": np.ones(W, np.float32),
            "norm.bias": np.zeros(W, np.float32),
            "head.weight": rs.randn(10, W).astype(np.float32),
            "head.bias": np.zeros(10, np.float32),
        }
        for i in range(L):
            pre = f"blocks.{i}"
            sd |= {
                f"{pre}.norm1.weight": np.ones(W, np.float32),
                f"{pre}.norm1.bias": np.zeros(W, np.float32),
                f"{pre}.attn.qkv.weight": rs.randn(3 * W, W).astype(np.float32),
                f"{pre}.attn.qkv.bias": np.zeros(3 * W, np.float32),
                f"{pre}.attn.proj.weight": rs.randn(W, W).astype(np.float32),
                f"{pre}.attn.proj.bias": np.zeros(W, np.float32),
                f"{pre}.norm2.weight": np.ones(W, np.float32),
                f"{pre}.norm2.bias": np.zeros(W, np.float32),
                f"{pre}.mlp.fc1.weight": rs.randn(4 * W, W).astype(np.float32),
                f"{pre}.mlp.fc1.bias": np.zeros(4 * W, np.float32),
                f"{pre}.mlp.fc2.weight": rs.randn(W, 4 * W).astype(np.float32),
                f"{pre}.mlp.fc2.bias": np.zeros(W, np.float32),
            }
        p = vconvert.vit_params_from_timm_state_dict(sd, layers=L)
        cfg = vvit.ViTConfig(patch=P, width=W, layers=L, heads=2,
                             image_size=32, num_classes=10)
        img = jnp.asarray(rs.randn(2, 32, 32, 3).astype(np.float32))
        logits = vvit.vit_classify(p, img, cfg, use_pallas=False)
        assert logits.shape == (2, 10)
        assert np.isfinite(_np(logits)).all()


class TestClipHBA:
    def test_forward_contract(self):
        """model(images) -> [B, 66] finite scores; text tower EOT pooling."""
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        prompts = vtok.tokenize(list(SPOSE_DIMENSIONS_66),
                                context_length=cfg.text.context_length)
        # clip vocab ids exceed tiny vocab; clamp for the tiny test model
        prompts = np.minimum(prompts, cfg.text.vocab_size - 1)
        img = jnp.asarray(np.random.RandomState(0)
                          .randn(3, 32, 32, 3).astype(np.float32))
        scores = vclip.clip_hba_forward(params, img, jnp.asarray(prompts), cfg,
                                        use_pallas=False)
        assert scores.shape == (3, 66)
        assert np.isfinite(_np(scores)).all()
        # logit-scaled cosine: |score| <= exp(logit_scale)
        assert np.abs(_np(scores)).max() <= np.exp(
            float(params["logit_scale"])) + 1e-3

    def test_pos_embedding_flag(self):
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        img = jnp.asarray(np.random.RandomState(0)
                          .randn(1, 32, 32, 3).astype(np.float32))
        with_pos = vclip.encode_image(params, img, cfg, use_pallas=False,
                                      use_pos_embedding=True)
        without = vclip.encode_image(params, img, cfg, use_pallas=False,
                                     use_pos_embedding=False)
        assert not np.allclose(_np(with_pos), _np(without))

    def test_dora_adapters_change_output_and_grads_flow(self):
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, static, acfg = adora.apply_dora(
            params, spec, r=4, key=jax.random.PRNGKey(1))
        prompts = jnp.asarray(np.random.RandomState(0)
                              .randint(1, 500, (5, cfg.text.context_length)))
        img = jnp.asarray(np.random.RandomState(1)
                          .randn(2, 32, 32, 3).astype(np.float32))

        def fwd(tr):
            ad = adora.assemble(tr, static)
            s = vclip.clip_hba_forward(params, img, prompts, cfg, adapters=ad,
                                       adapter_cfg=acfg, use_pallas=False)
            return jnp.sum(s ** 2)

        g = jax.grad(fwd)(trainable)
        norms = [float(jnp.linalg.norm(x))
                 for x in jax.tree_util.tree_leaves(g)]
        assert all(n > 0 for n in norms), norms
        # kaiming-initialized A/B => adapted forward differs from frozen forward
        base = vclip.clip_hba_forward(params, img, prompts, cfg,
                                      use_pallas=False)
        ad = adora.assemble(trainable, static)
        adapted = vclip.clip_hba_forward(params, img, prompts, cfg, adapters=ad,
                                         adapter_cfg=acfg, use_pallas=False)
        assert not np.allclose(_np(base), _np(adapted))

    def test_bake_merges_adapters_into_plain_weights(self):
        """adapters/dora.bake: the no-adapter forward of the baked tree equals
        the adapted forward (deterministic), giving zero-overhead inference;
        unadapted blocks and the input tree itself are untouched."""
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, static, acfg = adora.apply_dora(
            params, spec, r=4, key=jax.random.PRNGKey(1))
        # move off the init point so the test covers trained adapters
        trainable = jax.tree_util.tree_map(
            lambda x: x + 0.05 * jnp.sin(jnp.arange(x.size, dtype=jnp.float32)
                                         ).reshape(x.shape), trainable)
        prompts = jnp.asarray(np.random.RandomState(0)
                              .randint(1, 500, (5, cfg.text.context_length)))
        img = jnp.asarray(np.random.RandomState(1)
                          .randn(2, 32, 32, 3).astype(np.float32))
        ad = adora.assemble(trainable, static)
        adapted = vclip.clip_hba_forward(params, img, prompts, cfg,
                                         adapters=ad, adapter_cfg=acfg,
                                         use_pallas=False)
        orig_out_w = _np(params["visual"]["blocks"][-1]["out_w"]).copy()
        baked = adora.bake(params, trainable, static,
                           alpha=acfg["alpha"], r=acfg["r"])
        plain = vclip.clip_hba_forward(baked, img, prompts, cfg,
                                       use_pallas=False)
        np.testing.assert_allclose(_np(plain), _np(adapted),
                                   rtol=1e-5, atol=1e-5)
        # the source tree is not mutated; only adapted blocks differ
        np.testing.assert_array_equal(
            _np(params["visual"]["blocks"][-1]["out_w"]), orig_out_w)
        assert not np.allclose(
            _np(baked["visual"]["blocks"][-1]["out_w"]), orig_out_w)
        np.testing.assert_array_equal(
            _np(baked["visual"]["blocks"][0]["out_w"]),
            _np(params["visual"]["blocks"][0]["out_w"]))

    def test_reference_name_roundtrip(self):
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, static, _ = adora.apply_dora(
            params, spec, r=4, key=jax.random.PRNGKey(1))
        flat = adora.to_reference_names(trainable)
        assert f"clip_model.visual.transformer.resblocks.{cfg.visual.layers-1}" \
               ".attn.out_proj.m" in flat
        back = adora.from_reference_names(flat, spec)
        merged = adora.merge_loaded(trainable, back)
        for tower in trainable:
            for idx in trainable[tower]:
                for k in trainable[tower][idx]:
                    np.testing.assert_array_equal(
                        _np(merged[tower][idx][k]), _np(trainable[tower][idx][k]))


class TestTokenizer:
    def test_hash_fallback_deterministic_and_framed(self):
        toks = vtok.tokenize(["a photo of a dog", "a photo of a dog"])
        assert (toks[0] == toks[1]).all()
        assert toks[0, 0] == vtok.SOT
        eot_pos = int(np.argmax(toks[0]))
        assert toks[0, eot_pos] == vtok.EOT or toks[0, 0] == vtok.SOT
        # argmax finds EOT (largest id) — the text-tower pooling contract
        assert toks[0].max() == vtok.SOT or toks[0].max() == vtok.EOT

    def test_truncation(self):
        long = " ".join(["word"] * 200)
        # default truncate=False RAISES like clip.tokenize (a silently cut
        # prompt would embed differently where the reference fails loudly)
        with pytest.raises(RuntimeError, match="too long"):
            vtok.tokenize([long], context_length=16)
        toks = vtok.tokenize([long], context_length=16, truncate=True)
        assert toks.shape == (1, 16)
        assert toks[0, -1] == vtok.EOT

    def test_bpe_tokenizer_with_synthetic_vocab(self, tmp_path):
        """Merge 'h e' -> 'he', 'l l' -> 'll', 'he ll' -> 'hell', plus word-final
        'hell o</w>' -> 'hello</w>'."""
        vocab = tmp_path / "bpe.txt"
        vocab.write_text("#version\nh e\nl l\nhe ll\nhell o</w>\n")
        tok = vtok.ClipTokenizer(str(vocab))
        ids = tok.encode("hello")
        assert len(ids) == 1
        assert tok.decoder[ids[0]] == "hello</w>"
        assert tok.decode(ids).strip() == "hello"
        # unknown structure falls back to chars
        ids2 = tok.encode("hel")
        assert len(ids2) >= 1


class TestFrozenPrefixSplit:
    """clip_visual_prefix/suffix + encode_text_prefix/suffix: the split-tower
    forward must reproduce the full tower exactly — including the dropout-mask
    stream (absolute block indices feed the same fold_in) — so the frozen-
    prefix cache (train/clip_loop.py build_prefix_cache) is a pure perf lever."""

    def _setup(self, vision_layers=1, transformer_layers=1):
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers,
                               vision_layers, transformer_layers)
        trainable, static, acfg = adora.apply_dora(
            params, spec, r=4, key=jax.random.PRNGKey(1))
        ad = adora.assemble(trainable, static)
        prompts = jnp.asarray(np.random.RandomState(0)
                              .randint(1, 500, (5, cfg.text.context_length)))
        img = jnp.asarray(np.random.RandomState(1)
                          .randn(3, 32, 32, 3).astype(np.float32))
        return cfg, params, ad, acfg, prompts, img

    def test_suffix_forward_matches_full(self):
        cfg, params, ad, acfg, prompts, img = self._setup()
        full = vclip.clip_hba_forward(params, img, prompts, cfg, adapters=ad,
                                      adapter_cfg=acfg, use_pallas=False)
        vh = vvit.clip_visual_prefix(params["visual"], img, cfg.visual,
                                     n_suffix=1, use_pallas=False)
        th, eot = vclip.encode_text_prefix(params, prompts, cfg, n_suffix=1,
                                           use_pallas=False)
        split = vclip.clip_hba_suffix_forward(
            params, vh, th, eot, cfg, n_vis_suffix=1, n_txt_suffix=1,
            adapters=ad, adapter_cfg=acfg, use_pallas=False)
        np.testing.assert_allclose(_np(split), _np(full), rtol=2e-5, atol=2e-5)

    def test_dropout_stream_identical(self):
        """Same dropout key => same masks: absolute block indexing keeps the
        per-block fold_in stream of the split forward equal to the full one."""
        cfg, params, ad, acfg, prompts, img = self._setup()
        key = jax.random.PRNGKey(7)
        acfg = dict(acfg, dropout=0.5)
        full = vclip.clip_hba_forward(params, img, prompts, cfg, adapters=ad,
                                      adapter_cfg=acfg, dropout_key=key,
                                      deterministic=False, use_pallas=False)
        vh = vvit.clip_visual_prefix(params["visual"], img, cfg.visual,
                                     n_suffix=1, use_pallas=False)
        th, eot = vclip.encode_text_prefix(params, prompts, cfg, n_suffix=1,
                                           use_pallas=False)
        split = vclip.clip_hba_suffix_forward(
            params, vh, th, eot, cfg, n_vis_suffix=1, n_txt_suffix=1,
            adapters=ad, adapter_cfg=acfg, dropout_key=key,
            deterministic=False, use_pallas=False)
        np.testing.assert_allclose(_np(split), _np(full), rtol=2e-5, atol=2e-5)

    def test_whole_tower_split_edge(self):
        """n_suffix == layers: the prefix is just the stem/embeddings and the
        suffix runs every block — still equal to the full forward."""
        cfg, params, ad, acfg, prompts, img = self._setup(
            vision_layers=2, transformer_layers=2)
        L = cfg.visual.layers
        full = vclip.clip_hba_forward(params, img, prompts, cfg, adapters=ad,
                                      adapter_cfg=acfg, use_pallas=False)
        vh = vvit.clip_visual_prefix(params["visual"], img, cfg.visual,
                                     n_suffix=L, use_pallas=False)
        th, eot = vclip.encode_text_prefix(params, prompts, cfg,
                                           n_suffix=cfg.text.layers,
                                           use_pallas=False)
        split = vclip.clip_hba_suffix_forward(
            params, vh, th, eot, cfg, n_vis_suffix=L,
            n_txt_suffix=cfg.text.layers, adapters=ad, adapter_cfg=acfg,
            use_pallas=False)
        np.testing.assert_allclose(_np(split), _np(full), rtol=2e-5, atol=2e-5)

    def test_adapters_below_split_rejected(self):
        """An adapter on a block below the prefix/suffix boundary would be
        silently excluded from the cached forward — must raise."""
        cfg, params, ad, acfg, prompts, img = self._setup(
            vision_layers=2, transformer_layers=1)
        vh = vvit.clip_visual_prefix(params["visual"], img, cfg.visual,
                                     n_suffix=1, use_pallas=False)
        th, eot = vclip.encode_text_prefix(params, prompts, cfg, n_suffix=1,
                                           use_pallas=False)
        with pytest.raises(ValueError, match="below the prefix/suffix split"):
            vclip.clip_hba_suffix_forward(
                params, vh, th, eot, cfg, n_vis_suffix=1, n_txt_suffix=1,
                adapters=ad, adapter_cfg=acfg, use_pallas=False)

    def test_bad_n_suffix_rejected(self):
        cfg, params, _, _, prompts, img = self._setup()
        with pytest.raises(ValueError, match="outside"):
            vvit.clip_visual_prefix(params["visual"], img, cfg.visual,
                                    n_suffix=cfg.visual.layers + 1)
        with pytest.raises(ValueError, match="outside"):
            vclip.encode_text_prefix(params, prompts, cfg, n_suffix=-1)
