"""The one-program epoch scan must be bit-identical to the per-step path
(same per-batch perturb/dropout key streams, same NaN-guard semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.adapters import dora as adora
from vit_project_tpu.core.prng import batch_perturb_key
from vit_project_tpu.models import clip as vclip
from vit_project_tpu.train.clip_loop import ClipHBATrainer


@pytest.mark.parametrize("kind", ["none", "random_target", "label_shuffle"])
def test_epoch_scan_matches_per_step(kind):
    cfg = vclip.tiny_clip_config()
    params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
    spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
    trainable, static, acfg = adora.apply_dora(params, spec, r=4,
                                               key=jax.random.PRNGKey(1))
    prompts = np.random.RandomState(0).randint(
        1, 400, (66, cfg.text.context_length)).astype(np.int32)
    # mesh=None forces the single-device scan-capable trainer
    trainer = ClipHBATrainer(cfg, params, acfg, static, prompts, lr=3e-4,
                             compute_dtype=jnp.float32, mesh=None)

    rs = np.random.RandomState(2)
    n, bsz = 40, 16  # 2 full batches + partial 8
    imgs, tgts = trainer.upload_dataset(
        rs.randint(0, 255, (n, 32, 32, 3), np.uint8),
        rs.rand(n, 66).astype(np.float32))
    order = rs.permutation(n)
    batch_list = [order[s:s + bsz] for s in range(0, n, bsz)]
    training_run, perturb_seed = 3, 11
    dropout_epoch_key = jax.random.fold_in(jax.random.PRNGKey(7), 0)

    # --- per-step path
    tr_a = jax.tree_util.tree_map(jnp.array, trainable)
    opt_a = trainer.init_opt_state(tr_a)
    step = trainer._train_step_resident(kind)
    losses_a = []
    for bi, idx in enumerate(batch_list):
        bidx, valid = trainer._prep_idx(idx, bsz)
        pkey = batch_perturb_key(perturb_seed, training_run, bi)
        dkey = jax.random.fold_in(dropout_epoch_key, bi)
        tr_a, opt_a, loss, ok = step(tr_a, opt_a, trainer.params,
                                     trainer.static, imgs, tgts, bidx, valid,
                                     pkey, dkey)
        assert bool(ok)
        losses_a.append(float(loss))

    # --- scan path
    tr_b = jax.tree_util.tree_map(jnp.array, trainable)
    opt_b = trainer.init_opt_state(tr_b)
    idx_mat = np.zeros((len(batch_list), bsz), np.int32)
    valid_mat = np.zeros((len(batch_list), bsz), np.float32)
    for i, b in enumerate(batch_list):
        idx_mat[i, :len(b)] = b
        valid_mat[i, :len(b)] = 1.0
    epoch_fn = trainer._epoch_scan(kind)
    base_pkey = jax.random.PRNGKey(perturb_seed + training_run * 1000)
    tr_b, opt_b, losses_b, oks = epoch_fn(
        tr_b, opt_b, trainer.params, trainer.static, imgs, tgts,
        jnp.asarray(idx_mat), jnp.asarray(valid_mat), dropout_epoch_key,
        base_pkey)

    np.testing.assert_array_equal(np.asarray(oks), True)
    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_a),
                               rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(tr_a),
                    jax.tree_util.tree_leaves(tr_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("kind", ["none", "random_target"])
def test_epoch_scan_data_parallel_matches_per_step(kind):
    """The mesh-sharded epoch scan (idx/valid sharded P(None,'data')) must be
    bit-identical to the per-step dp path — same core, same placement, XLA
    inserts the same reductions."""
    from vit_project_tpu.parallel import mesh as vmesh

    cfg = vclip.tiny_clip_config()
    params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
    spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
    trainable, static, acfg = adora.apply_dora(params, spec, r=4,
                                               key=jax.random.PRNGKey(1))
    prompts = np.random.RandomState(0).randint(
        1, 400, (66, cfg.text.context_length)).astype(np.int32)
    mesh = vmesh.make_mesh()
    trainer = ClipHBATrainer(cfg, params, acfg, static, prompts, lr=3e-4,
                             compute_dtype=jnp.float32, mesh=mesh)

    rs = np.random.RandomState(2)
    n, bsz = 40, 16  # 2 full batches + partial 8
    imgs, tgts = trainer.upload_dataset(
        rs.randint(0, 255, (n, 32, 32, 3), np.uint8),
        rs.rand(n, 66).astype(np.float32))
    order = rs.permutation(n)
    batch_list = [order[s:s + bsz] for s in range(0, n, bsz)]
    training_run, perturb_seed = 3, 11
    dropout_epoch_key = jax.random.fold_in(jax.random.PRNGKey(7), 0)

    # --- per-step dp path
    tr_a = trainer.prepare_state(jax.tree_util.tree_map(jnp.array, trainable))
    opt_a = trainer.prepare_state(trainer.init_opt_state(tr_a))
    step = trainer._train_step_resident(kind)
    losses_a = []
    for bi, idx in enumerate(batch_list):
        bidx, valid = trainer._prep_idx(idx, bsz)
        pkey = batch_perturb_key(perturb_seed, training_run, bi)
        dkey = jax.random.fold_in(dropout_epoch_key, bi)
        tr_a, opt_a, loss, ok = step(tr_a, opt_a, trainer.params,
                                     trainer.static, imgs, tgts, bidx, valid,
                                     pkey, dkey)
        assert bool(ok)
        losses_a.append(float(loss))

    # --- mesh-sharded scan path
    tr_b = trainer.prepare_state(jax.tree_util.tree_map(jnp.array, trainable))
    opt_b = trainer.prepare_state(trainer.init_opt_state(tr_b))
    idx_mat, valid_mat = trainer._prep_idx_mat(batch_list, bsz)
    assert idx_mat.sharding.spec == jax.sharding.PartitionSpec(None, "data")
    epoch_fn = trainer._epoch_scan(kind)
    base_pkey = jax.random.PRNGKey(perturb_seed + training_run * 1000)
    tr_b, opt_b, losses_b, oks = epoch_fn(
        tr_b, opt_b, trainer.params, trainer.static, imgs, tgts,
        idx_mat, valid_mat, dropout_epoch_key, base_pkey)

    np.testing.assert_array_equal(np.asarray(oks), True)
    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_a),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tr_a),
                    jax.tree_util.tree_leaves(tr_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_nan_guard_skips_batch_without_update():
    """A batch with non-finite targets must leave trainable/opt state untouched
    (reference NaN 'continue', new_cvpr...pipeline.py:929-998)."""
    cfg = vclip.tiny_clip_config()
    params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
    spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
    trainable, static, acfg = adora.apply_dora(params, spec, r=4,
                                               key=jax.random.PRNGKey(1))
    prompts = np.random.RandomState(0).randint(
        1, 400, (8, cfg.text.context_length)).astype(np.int32)
    trainer = ClipHBATrainer(cfg, params, acfg, static, prompts, lr=3e-4,
                             compute_dtype=jnp.float32, mesh=None)
    rs = np.random.RandomState(3)
    tgts = rs.rand(8, 8).astype(np.float32)
    tgts[3, 2] = np.nan
    imgs, tgts_dev = trainer.upload_dataset(
        rs.randint(0, 255, (8, 32, 32, 3), np.uint8), tgts)
    tr0 = jax.tree_util.tree_map(jnp.array, trainable)
    opt0 = trainer.init_opt_state(tr0)
    step = trainer._train_step_resident("none")
    idx, valid = trainer._prep_idx(np.arange(8), 8)
    tr1, opt1, loss, ok = step(tr0, opt0, trainer.params, trainer.static,
                               imgs, tgts_dev, idx, valid,
                               jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    assert not bool(ok)
    for a, b in zip(jax.tree_util.tree_leaves(tr1),
                    jax.tree_util.tree_leaves(trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_remat_is_numerically_free():
    """ClipHBATrainer(remat=True) must produce the exact same step results
    as remat=False (jax.checkpoint replays identical math with identical
    keys) — the flag only trades compute for activation memory."""
    cfg = vclip.tiny_clip_config()
    params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
    spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
    trainable, static, acfg = adora.apply_dora(params, spec, r=4,
                                               key=jax.random.PRNGKey(1))
    prompts = np.random.RandomState(0).randint(
        1, 400, (66, cfg.text.context_length)).astype(np.int32)
    rs = np.random.RandomState(5)
    imgs = rs.randint(0, 255, (12, 32, 32, 3), np.uint8)
    tgts = rs.rand(12, 66).astype(np.float32)

    outs = []
    for remat in (False, True):
        tr = ClipHBATrainer(cfg, params, acfg, static, prompts, lr=3e-4,
                            compute_dtype=jnp.float32, mesh=None, remat=remat)
        t = jax.tree_util.tree_map(jnp.array, trainable)
        opt = tr.init_opt_state(t)
        di, dt = tr.upload_dataset(imgs, tgts)
        idx, valid = tr._prep_idx(np.arange(12), 12)
        step = tr._train_step_resident("none")
        t, opt, loss, ok = step(t, opt, tr.params, tr.static, di, dt, idx,
                                valid, jax.random.PRNGKey(2),
                                jax.random.PRNGKey(3))
        assert bool(ok)
        outs.append((float(loss), t))
    assert outs[0][0] == outs[1][0]
    # remat changes XLA's fusion/reassociation in the backward, so updated
    # params agree to FP-noise (measured maxdiff ~1e-11), not bit-exactly
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("kind", ["none", "random_target"])
def test_cached_epoch_scan_matches_full(kind):
    """The frozen-prefix cached epoch scan (suffix-only training from
    build_prefix_cache activations) must reproduce the full-tower scan to
    float tolerance — same key streams, same updates; only the program
    boundary at the cache may re-round."""
    cfg = vclip.tiny_clip_config()
    params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
    spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
    trainable, static, acfg = adora.apply_dora(params, spec, r=4,
                                               key=jax.random.PRNGKey(1))
    prompts = np.random.RandomState(0).randint(
        1, 400, (66, cfg.text.context_length)).astype(np.int32)
    trainer = ClipHBATrainer(cfg, params, acfg, static, prompts, lr=3e-4,
                             compute_dtype=jnp.float32, mesh=None)

    rs = np.random.RandomState(2)
    n, bsz = 40, 16
    imgs, tgts = trainer.upload_dataset(
        rs.randint(0, 255, (n, 32, 32, 3), np.uint8),
        rs.rand(n, 66).astype(np.float32))
    order = rs.permutation(n)
    batch_list = [order[s:s + bsz] for s in range(0, n, bsz)]
    idx_mat = np.zeros((len(batch_list), bsz), np.int32)
    valid_mat = np.zeros((len(batch_list), bsz), np.float32)
    for i, b in enumerate(batch_list):
        idx_mat[i, :len(b)] = b
        valid_mat[i, :len(b)] = 1.0
    dkey = jax.random.fold_in(jax.random.PRNGKey(7), 0)
    base_pkey = jax.random.PRNGKey(11 + 3 * 1000)

    tr_a = jax.tree_util.tree_map(jnp.array, trainable)
    opt_a = trainer.init_opt_state(tr_a)
    tr_a, opt_a, losses_a, _ = trainer._epoch_scan(kind)(
        tr_a, opt_a, trainer.params, trainer.static, imgs, tgts,
        jnp.asarray(idx_mat), jnp.asarray(valid_mat), dkey, base_pkey)

    # chunk < n exercises the multi-chunk concat + tail padding
    cache = trainer.build_prefix_cache(imgs, chunk=16)
    assert cache.shape[0] == n
    tr_b = jax.tree_util.tree_map(jnp.array, trainable)
    opt_b = trainer.init_opt_state(tr_b)
    tr_b, opt_b, losses_b, oks = trainer._epoch_scan(kind, cached=True)(
        tr_b, opt_b, trainer.params, trainer.static, cache, tgts,
        jnp.asarray(idx_mat), jnp.asarray(valid_mat), dkey, base_pkey,
        trainer.text_prefix_cache)

    np.testing.assert_array_equal(np.asarray(oks), True)
    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_a),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tr_a),
                    jax.tree_util.tree_leaves(tr_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_cached_epoch_scan_data_parallel():
    """build_prefix_cache + the cached scan on a dp mesh: the cache builds in
    device-count-rounded chunks, replicates onto the mesh, and the sharded
    cached scan matches the unsharded cached scan bit-for-bit-to-tolerance."""
    from vit_project_tpu.parallel import mesh as vmesh

    cfg = vclip.tiny_clip_config()
    params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
    spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
    trainable, static, acfg = adora.apply_dora(params, spec, r=4,
                                               key=jax.random.PRNGKey(1))
    prompts = np.random.RandomState(0).randint(
        1, 400, (66, cfg.text.context_length)).astype(np.int32)

    rs = np.random.RandomState(2)
    n, bsz = 40, 16
    imgs_h = rs.randint(0, 255, (n, 32, 32, 3), np.uint8)
    tgts_h = rs.rand(n, 66).astype(np.float32)
    order = rs.permutation(n)
    batch_list = [order[s:s + bsz] for s in range(0, n, bsz)]
    dkey = jax.random.fold_in(jax.random.PRNGKey(7), 0)
    base_pkey = jax.random.PRNGKey(11)

    results = []
    for mesh in (None, vmesh.make_mesh()):
        trainer = ClipHBATrainer(cfg, params, acfg, static, prompts, lr=3e-4,
                                 compute_dtype=jnp.float32, mesh=mesh)
        imgs, tgts = trainer.upload_dataset(imgs_h, tgts_h)
        cache = trainer.build_prefix_cache(imgs, chunk=15)  # rounds to 16
        assert cache.shape[0] == n
        tr = trainer.prepare_state(jax.tree_util.tree_map(jnp.array,
                                                          trainable))
        opt = trainer.prepare_state(trainer.init_opt_state(tr))
        idx_mat, valid_mat = trainer._prep_idx_mat(batch_list, bsz)
        tr, opt, losses, oks = trainer._epoch_scan("none", cached=True)(
            tr, opt, trainer.params, trainer.static, cache, tgts,
            jnp.asarray(idx_mat), jnp.asarray(valid_mat), dkey, base_pkey,
            trainer.text_prefix_cache)
        ev = trainer.evaluate_resident(tr, imgs, tgts, n, bsz, cache=cache)
        np.testing.assert_array_equal(np.asarray(oks), True)
        results.append((np.asarray(losses), ev,
                        [np.asarray(x) for x in
                         jax.tree_util.tree_leaves(tr)]))

    (la, ea, ta), (lb, eb, tb) = results
    np.testing.assert_allclose(lb, la, rtol=1e-6)
    assert abs(ea - eb) < 1e-6 * max(1.0, abs(ea))
    for a, b in zip(ta, tb):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)
