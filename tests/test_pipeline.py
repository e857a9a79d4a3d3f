"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over a
'stage' mesh axis must reproduce the plain (unrolled) trunk exactly —
forward features, classifier logits, gradients, and a full SGD train step —
including composed with data parallelism on a ('data', 'stage') mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vit_project_tpu.models import vit as vvit
from vit_project_tpu.parallel import pipeline as pp
from vit_project_tpu.data.imagenet import IMAGENET_MEAN, IMAGENET_STD

CFG = vvit.ViTConfig(patch=8, width=32, layers=4, heads=2, image_size=32,
                     num_classes=10)


def _mesh(shape, names):
    devs = np.array(jax.devices()[:int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.fixture()
def setup():
    # function-scoped: the train-step tests donate the pipelined state, and
    # device_put-to-replicated aliases the source buffers — donation would
    # delete a shared params tree out from under the next test
    params = vvit.init_vit_params(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(1)
    images = jnp.asarray(rs.randint(0, 255, (8, 32, 32, 3), np.uint8))
    labels = jnp.asarray(rs.randint(0, 10, 8).astype(np.int32))
    return params, images, labels


class TestStageStacking:
    def test_round_trip(self, setup):
        params, _, _ = setup
        rest, blocks_st = pp.stage_blocks(params, 2)
        leaf = jax.tree_util.tree_leaves(blocks_st)[0]
        assert leaf.shape[:2] == (2, 2)
        rebuilt = pp.unstage_blocks(rest, blocks_st)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(rebuilt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_indivisible_layers_raise(self, setup):
        params, _, _ = setup
        with pytest.raises(ValueError, match="divide"):
            pp.stage_blocks(params, 3)


class TestPipelineForward:
    @pytest.mark.parametrize("pool", ["token", "avg"])
    def test_features_match_plain_trunk(self, setup, pool):
        params, images, _ = setup
        mesh = _mesh((4,), ("stage",))
        rest, blocks_st = pp.shard_params_pp(mesh, params, 4)
        norm = (IMAGENET_MEAN, IMAGENET_STD)
        got = pp.pipeline_features(rest, blocks_st, images, CFG, mesh,
                                   n_micro=4, pool=pool, input_norm=norm)
        want = vvit.forward_features(params, images, CFG, pool=pool,
                                     input_norm=norm, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_logits_match_and_dp_composes(self, setup):
        params, images, _ = setup
        mesh = _mesh((2, 2), ("data", "stage"))
        rest, blocks_st = pp.shard_params_pp(mesh, params)
        norm = (IMAGENET_MEAN, IMAGENET_STD)
        got = pp.pipeline_classify(rest, blocks_st, images, CFG, mesh,
                                   n_micro=2, input_norm=norm)
        want = vvit.vit_classify(params, images, CFG, input_norm=norm,
                                 use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_pallas_attention_inside_shard_map(self, setup):
        """On a real TPU slice block_forward takes the flash-pallas path
        inside the shard_map body; exercise that composition here in
        interpret mode (same kernels, reference semantics) against the
        plain XLA trunk."""
        params, images, _ = setup
        mesh = _mesh((2, 2), ("data", "stage"))
        rest, blocks_st = pp.shard_params_pp(mesh, params)
        norm = (IMAGENET_MEAN, IMAGENET_STD)
        got = pp.pipeline_features(rest, blocks_st, images, CFG, mesh,
                                   n_micro=2, input_norm=norm,
                                   use_pallas=True)
        want = vvit.forward_features(params, images, CFG, input_norm=norm,
                                     use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_batch_divisibility_guard(self, setup):
        params, images, _ = setup
        mesh = _mesh((4,), ("stage",))
        rest, blocks_st = pp.shard_params_pp(mesh, params, 4)
        with pytest.raises(ValueError, match="divide"):
            pp.pipeline_features(rest, blocks_st, images, CFG, mesh,
                                 n_micro=3)

    def test_mesh_without_stage_axis_raises(self, setup):
        params, _, _ = setup
        mesh = _mesh((4,), ("data",))
        with pytest.raises(ValueError, match="stage"):
            pp.shard_params_pp(mesh, params, 4)

    def test_make_mesh_stage_axis_and_guards(self):
        from vit_project_tpu.parallel import mesh as vmesh
        m = vmesh.make_mesh(n_stage=2)
        assert m.axis_names == ("data", "stage") and m.shape["stage"] == 2
        with pytest.raises(ValueError, match="at most one"):
            vmesh.make_mesh(n_model=2, n_stage=2)

    def test_stage_count_mismatch_rejected(self, setup):
        """A blocks_st whose stage axis is a larger multiple of the mesh
        would silently drop layers — pipeline_features must refuse it."""
        params, images, _ = setup
        mesh2 = _mesh((2,), ("stage",))
        _, blocks_st4 = pp.stage_blocks(params, 4)  # bypass shard_params_pp
        rest, _ = pp.stage_blocks(params, 2)
        with pytest.raises(ValueError, match="stages"):
            pp.pipeline_features(rest, blocks_st4, images, CFG, mesh2,
                                 n_micro=2)


class TestPipelineTraining:
    def _oracle_step(self, params, momentum_buf, images, labels, lr):
        """The dp train step's math (train/vit_loop.py:65-96) on the flat
        param tree, f32, no perturbation."""
        norm = (IMAGENET_MEAN, IMAGENET_STD)

        def loss_fn(p):
            logits = vvit.vit_classify(p, images, CFG, input_norm=norm,
                                       use_pallas=False)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None],
                                                 axis=1)[:, 0])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_buf = jax.tree_util.tree_map(
            lambda p, g, b: 0.9 * b + (g + 1e-4 * p),
            params, grads, momentum_buf)
        new_params = jax.tree_util.tree_map(lambda p, b: p - 0.1 * b,
                                            params, new_buf)
        return new_params, new_buf, loss

    @pytest.mark.parametrize("remat", [False, True])
    def test_train_step_matches_oracle(self, setup, remat):
        """ViTTrainer in pp mode (the ONE pipelined train-step
        implementation, vit_loop.py:_make_train_step routing through
        _classify) reproduces the flat-tree SGD oracle."""
        from vit_project_tpu.core.configs import ViTTrainConfig
        from vit_project_tpu.train.vit_loop import ViTTrainer
        params, images, labels = setup
        # oracle FIRST: the pipelined step donates state whose replicated
        # leaves alias `params` (device_put-to-replicated is zero-copy), so
        # `params` is dead after the first step() call
        want_p, want_m, want_loss = self._oracle_step(
            params, jax.tree_util.tree_map(jnp.zeros_like, params),
            images, labels, 0.1)
        want_p3, _, want_loss3 = self._oracle_step(want_p, want_m, images,
                                                   labels, 0.1)

        mesh = _mesh((2, 2), ("data", "stage"))
        state = pp.shard_params_pp(mesh, params)
        mom = jax.tree_util.tree_map(jnp.zeros_like, state)
        trainer = ViTTrainer(CFG, ViTTrainConfig(
            momentum=0.9, weight_decay=1e-4, compute_dtype="float32",
            pp_stages=2, pp_micro=2, remat=remat), mesh)
        raw_step = trainer._make_train_step(None)

        def step(state, mom, images, labels, lr):
            return raw_step(state, mom, images, labels, lr,
                            jax.random.PRNGKey(0))
        state2, mom2, loss = step(state, mom, images, labels, 0.1)
        np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
        got_flat = pp.unstage_blocks(state2[0], state2[1])
        for a, b in zip(jax.tree_util.tree_leaves(got_flat),
                        jax.tree_util.tree_leaves(want_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
        # a second step keeps the momentum threading equivalent too
        state3, _, loss3 = step(state2, mom2, images, labels, 0.1)
        np.testing.assert_allclose(float(loss3), float(want_loss3),
                                   rtol=1e-5)
        got_flat3 = pp.unstage_blocks(state3[0], state3[1])
        for a, b in zip(jax.tree_util.tree_leaves(got_flat3),
                        jax.tree_util.tree_leaves(want_p3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)
