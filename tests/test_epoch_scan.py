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
