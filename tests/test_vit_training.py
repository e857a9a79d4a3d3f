"""Integration tests for the ViT ImageNet path: training + auto-resume, per-epoch
RSA evaluation, and the single-epoch perturbation measurement grid — all on the
8-device CPU data mesh with the test-tiny backbone and synthetic data."""
import os

import jax
import numpy as np
import pandas as pd
import pytest

from vit_project_tpu.core.configs import ViTTrainConfig
from vit_project_tpu.models import vit as vvit
from vit_project_tpu.train.vit_loop import run_vit_training


@pytest.fixture(scope="module")
def imagenet_fixture(tmp_path_factory):
    """Tiny ImageFolder: 3 classes x 16 train + 8 val images, 48x48 px."""
    from PIL import Image
    root = tmp_path_factory.mktemp("imagenet")
    rs = np.random.RandomState(0)
    for split, n in (("train", 16), ("val", 8)):
        for cls in ("apple", "banana", "cherry"):
            d = root / split / cls
            os.makedirs(d)
            for i in range(n):
                arr = rs.randint(0, 255, (48, 48, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def things48_fixture(tmp_path_factory):
    from PIL import Image
    import scipy.io
    root = tmp_path_factory.mktemp("things48")
    img_dir = root / "imgs"
    os.makedirs(img_dir)
    rs = np.random.RandomState(1)
    names = []
    for i in range(48):
        n = f"v{i:02d}.png"
        Image.fromarray(rs.randint(0, 255, (48, 48, 3),
                                   dtype=np.uint8)).save(img_dir / n)
        names.append(n)
    pd.DataFrame({"image_name": names}).to_csv(root / "things.csv",
                                               index=False)
    rdm = rs.rand(48, 48)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    scipy.io.savemat(root / "rdm.mat", {"RDM48_triplet": rdm})
    return {"things_csv": str(root / "things.csv"),
            "things_img_dir": str(img_dir),
            "things_rdm_path": str(root / "rdm.mat")}


TINY = vvit.ViTConfig(patch=8, width=32, layers=2, heads=2, image_size=32,
                      num_classes=3)


def tiny_cfg(data_path, out, epochs=2):
    return ViTTrainConfig(data_path=data_path, output_dir=out, batch_size=8,
                          epochs=epochs, lr=0.01, warmup_epochs=1,
                          num_workers=2, num_classes=3, image_size=32,
                          compute_dtype="float32", random_seed=0)


class TestViTTraining:
    def test_train_and_autoresume(self, imagenet_fixture, tmp_path):
        out = str(tmp_path / "run")
        run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=2),
                         vit_cfg=TINY)
        csv_path = os.path.join(out, "training_metrics.csv")
        df = pd.read_csv(csv_path)
        assert list(df["epoch"]) == [0, 1]
        assert np.isfinite(df["train_loss"]).all()
        assert (df["val_acc"] >= 0).all() and (df["val_acc"] <= 100).all()
        for e in (0, 1):
            assert os.path.exists(
                os.path.join(out, f"checkpoint_epoch_{e:03d}.pth"))
        assert os.path.exists(os.path.join(out, "checkpoint_latest.pth"))

        # auto-resume: bump epochs to 3 -> only epoch 2 runs and appends
        run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=3),
                         vit_cfg=TINY)
        df2 = pd.read_csv(csv_path)
        assert list(df2["epoch"]) == [0, 1, 2]
        # rows 0-1 unchanged by the resume
        pd.testing.assert_frame_equal(df2.iloc[:2], df)

    def test_pipelined_training_matches_dp(self, imagenet_fixture, tmp_path):
        """pp_stages=2/pp_micro=2 over the ('data','stage') mesh trains the
        same trajectory as plain dp (identical math in f32), writes flat-
        layout checkpoints, and a dp run can auto-resume FROM them."""
        import dataclasses
        dp_out = str(tmp_path / "dp")
        run_vit_training(tiny_cfg(imagenet_fixture, dp_out, epochs=2),
                         vit_cfg=TINY)
        pp_out = str(tmp_path / "pp")
        cfg = dataclasses.replace(tiny_cfg(imagenet_fixture, pp_out,
                                           epochs=2),
                                  pp_stages=2, pp_micro=2)
        run_vit_training(cfg, vit_cfg=TINY)

        dp = pd.read_csv(os.path.join(dp_out, "training_metrics.csv"))
        pp = pd.read_csv(os.path.join(pp_out, "training_metrics.csv"))
        assert list(pp["epoch"]) == list(dp["epoch"])
        np.testing.assert_allclose(pp["train_loss"], dp["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(pp["val_loss"], dp["val_loss"], rtol=1e-4)
        np.testing.assert_allclose(pp["val_acc"], dp["val_acc"], atol=1e-6)

        # flat-layout checkpoints: params equal to the dp run's
        from vit_project_tpu.ckpt import vit_ckpt
        ck_dp = vit_ckpt.load_checkpoint(
            os.path.join(dp_out, "checkpoint_latest.pth"))
        ck_pp = vit_ckpt.load_checkpoint(
            os.path.join(pp_out, "checkpoint_latest.pth"))
        for a, b in zip(jax.tree_util.tree_leaves(ck_pp["params"]),
                        jax.tree_util.tree_leaves(ck_dp["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

        # the dp loop resumes a pipelined run's checkpoint (and vice versa:
        # the pp run re-stages a flat checkpoint on its own resume)
        run_vit_training(tiny_cfg(imagenet_fixture, pp_out, epochs=3),
                         vit_cfg=TINY)
        df3 = pd.read_csv(os.path.join(pp_out, "training_metrics.csv"))
        assert list(df3["epoch"]) == [0, 1, 2]

    def test_device_prefetch_equivalent_and_clean(self, imagenet_fixture,
                                                  tmp_path):
        """The h2d feeder thread changes WHEN transfers happen, never what
        trains: prefetch off reproduces the default run exactly. Abandoning
        the iterator mid-epoch must not leak the feeder thread."""
        import dataclasses
        import threading
        from vit_project_tpu.train.vit_loop import _device_prefetch

        on_out = str(tmp_path / "on")   # default device_prefetch=2
        run_vit_training(tiny_cfg(imagenet_fixture, on_out, epochs=2),
                         vit_cfg=TINY)
        off_out = str(tmp_path / "off")
        run_vit_training(dataclasses.replace(
            tiny_cfg(imagenet_fixture, off_out, epochs=2),
            device_prefetch=0), vit_cfg=TINY)
        on = pd.read_csv(os.path.join(on_out, "training_metrics.csv"))
        off = pd.read_csv(os.path.join(off_out, "training_metrics.csv"))
        pd.testing.assert_frame_equal(on, off)

        # unit: order/value passthrough, exception propagation, abandonment
        items = [(np.full((2,), i), np.full((2,), -i)) for i in range(6)]
        got = list(_device_prefetch(iter(items),
                                    lambda a, b: (a + 1, b - 1), depth=2))
        assert [int(a[0]) for a, _ in got] == [1, 2, 3, 4, 5, 6]

        def boom(a, b):
            raise RuntimeError("shard failed")
        with pytest.raises(RuntimeError, match="shard failed"):
            list(_device_prefetch(iter(items), boom, depth=2))

        before = threading.active_count()
        it = _device_prefetch(iter(items), lambda a, b: (a, b), depth=1)
        next(it)
        it.close()   # abandon mid-epoch: feeder must exit, not block on put
        assert threading.active_count() <= before + 1

    def test_host_prefetch_equivalent(self, imagenet_fixture, tmp_path):
        """--host_prefetch only moves WHEN the checkpoint trees' d2h starts
        (core/hostcopy.py): metrics and checkpoints are unchanged."""
        import dataclasses
        from vit_project_tpu.ckpt import vit_ckpt
        base_out = str(tmp_path / "hp_off")
        run_vit_training(tiny_cfg(imagenet_fixture, base_out, epochs=2),
                         vit_cfg=TINY)
        hp_out = str(tmp_path / "hp_on")
        run_vit_training(dataclasses.replace(
            tiny_cfg(imagenet_fixture, hp_out, epochs=2),
            host_prefetch=True), vit_cfg=TINY)
        off = pd.read_csv(os.path.join(base_out, "training_metrics.csv"))
        on = pd.read_csv(os.path.join(hp_out, "training_metrics.csv"))
        pd.testing.assert_frame_equal(on, off)
        a = vit_ckpt.load_checkpoint(vit_ckpt.latest_checkpoint(base_out))
        b = vit_ckpt.load_checkpoint(vit_ckpt.latest_checkpoint(hp_out))
        for x, y in zip(jax.tree_util.tree_leaves(a["params"]),
                        jax.tree_util.tree_leaves(b["params"])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_zero1_matches_replicated_and_shards_state(self,
                                                       imagenet_fixture,
                                                       tmp_path):
        """ZeRO-1 momentum sharding changes WHERE the optimizer state lives
        (1/N per chip + a per-step all-gather), never the numbers: the
        trajectory and final checkpoint equal the replicated run's, and the
        live momentum leaves really are sharded over 'data'."""
        import dataclasses
        base_out = str(tmp_path / "base")
        run_vit_training(tiny_cfg(imagenet_fixture, base_out, epochs=2),
                         vit_cfg=TINY)
        z_out = str(tmp_path / "z1")
        res = run_vit_training(dataclasses.replace(
            tiny_cfg(imagenet_fixture, z_out, epochs=2), zero1=True),
            vit_cfg=TINY)

        base = pd.read_csv(os.path.join(base_out, "training_metrics.csv"))
        z1 = pd.read_csv(os.path.join(z_out, "training_metrics.csv"))
        np.testing.assert_allclose(z1["train_loss"], base["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(z1["val_loss"], base["val_loss"],
                                   rtol=1e-4)
        from vit_project_tpu.ckpt import vit_ckpt
        ck_b = vit_ckpt.load_checkpoint(
            os.path.join(base_out, "checkpoint_latest.pth"))
        ck_z = vit_ckpt.load_checkpoint(
            os.path.join(z_out, "checkpoint_latest.pth"))
        for a, b in zip(jax.tree_util.tree_leaves(ck_z["params"]),
                        jax.tree_util.tree_leaves(ck_b["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        # the live state is genuinely sharded: every leaf whose leading axis
        # divides the 8-device data mesh holds 1/8 per device
        sharded = [x for x in jax.tree_util.tree_leaves(res["momentum_buf"])
                   if x.ndim >= 1 and x.shape[0] % 8 == 0]
        assert sharded and all(not x.sharding.is_fully_replicated
                               for x in sharded)

    def test_zero1_rejects_pp(self, imagenet_fixture):
        import dataclasses
        with pytest.raises(ValueError, match="zero1"):
            from vit_project_tpu.train.vit_loop import ViTTrainer
            ViTTrainer(TINY, dataclasses.replace(
                tiny_cfg(imagenet_fixture, "/tmp/x", epochs=1),
                zero1=True, pp_stages=2, pp_micro=2))

    def test_fsdp_matches_replicated_and_shards_params(self,
                                                       imagenet_fixture,
                                                       tmp_path):
        """FSDP (--fsdp) changes WHERE the params and momentum live (1/N
        per chip; XLA all-gathers weights at use and reduce-scatters grads),
        never the numbers: trajectory and final checkpoint equal the
        replicated dp run's, and the live param AND momentum leaves really
        are sharded over 'data'. Also composes with grad_accum (the scanned
        microbatch grads accumulate in the sharded layout)."""
        import dataclasses
        base_out = str(tmp_path / "base")
        run_vit_training(tiny_cfg(imagenet_fixture, base_out, epochs=2),
                         vit_cfg=TINY)
        f_out = str(tmp_path / "fsdp")
        res = run_vit_training(dataclasses.replace(
            tiny_cfg(imagenet_fixture, f_out, epochs=2), fsdp=True,
            grad_accum=2), vit_cfg=TINY)

        base = pd.read_csv(os.path.join(base_out, "training_metrics.csv"))
        fs = pd.read_csv(os.path.join(f_out, "training_metrics.csv"))
        np.testing.assert_allclose(fs["train_loss"], base["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(fs["val_loss"], base["val_loss"],
                                   rtol=1e-4)
        from vit_project_tpu.ckpt import vit_ckpt
        ck_b = vit_ckpt.load_checkpoint(
            os.path.join(base_out, "checkpoint_latest.pth"))
        ck_f = vit_ckpt.load_checkpoint(
            os.path.join(f_out, "checkpoint_latest.pth"))
        for a, b in zip(jax.tree_util.tree_leaves(ck_f["params"]),
                        jax.tree_util.tree_leaves(ck_b["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        for tree in (res["params"], res["momentum_buf"]):
            # matrix leaves shard; 1-D leaves (biases/scales) replicate by
            # design — a sharded bias reshaped in the attention path would
            # propagate a bogus heads-sharding (parallel/mesh.fsdp_sharding)
            sharded = [x for x in jax.tree_util.tree_leaves(tree)
                       if x.ndim >= 2 and x.shape[0] % 8 == 0]
            assert sharded and all(not x.sharding.is_fully_replicated
                                   for x in sharded)

    def test_tp_training_matches_dp_and_saves_flat(self, imagenet_fixture,
                                                   tmp_path):
        """tp_devices=2 (--tp_devices): block weights live model-sharded in
        the head-aligned [D,3,D] layout over a ('data','model') mesh — same
        math as dp (XLA resolves one all-reduce per block), checkpoints
        flatten back to the solo layout, and dp and tp runs resume each
        other (the tp resume re-shards the flat checkpoint)."""
        import dataclasses
        dp_out = str(tmp_path / "dp")
        run_vit_training(tiny_cfg(imagenet_fixture, dp_out, epochs=2),
                         vit_cfg=TINY)
        tp_out = str(tmp_path / "tp")
        res = run_vit_training(dataclasses.replace(
            tiny_cfg(imagenet_fixture, tp_out, epochs=2), tp_devices=2),
            vit_cfg=TINY)

        dp = pd.read_csv(os.path.join(dp_out, "training_metrics.csv"))
        tp = pd.read_csv(os.path.join(tp_out, "training_metrics.csv"))
        np.testing.assert_allclose(tp["train_loss"], dp["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(tp["val_loss"], dp["val_loss"], rtol=1e-4)
        np.testing.assert_allclose(tp["val_acc"], dp["val_acc"], atol=1e-3)

        # the LIVE tree kept the tp layout and sharding through training
        for bp in res["params"]["blocks"]:
            assert bp["qkv_w"].ndim == 3
            assert not bp["qkv_w"].sharding.is_fully_replicated

        # checkpoints are FLAT and equal to the dp run's
        from vit_project_tpu.ckpt import vit_ckpt
        ck_dp = vit_ckpt.load_checkpoint(
            os.path.join(dp_out, "checkpoint_latest.pth"))
        ck_tp = vit_ckpt.load_checkpoint(
            os.path.join(tp_out, "checkpoint_latest.pth"))
        for bp in ck_tp["params"]["blocks"]:
            assert np.asarray(bp["qkv_w"]).ndim == 2
        for a, b in zip(jax.tree_util.tree_leaves(ck_tp["params"]),
                        jax.tree_util.tree_leaves(ck_dp["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

        # dp resumes the tp run's tree; a tp run resumes the dp run's
        run_vit_training(tiny_cfg(imagenet_fixture, tp_out, epochs=3),
                         vit_cfg=TINY)
        assert list(pd.read_csv(os.path.join(
            tp_out, "training_metrics.csv"))["epoch"]) == [0, 1, 2]
        run_vit_training(dataclasses.replace(
            tiny_cfg(imagenet_fixture, dp_out, epochs=3), tp_devices=2),
            vit_cfg=TINY)
        assert list(pd.read_csv(os.path.join(
            dp_out, "training_metrics.csv"))["epoch"]) == [0, 1, 2]

    def test_tp_rejects_conflicting_modes(self, imagenet_fixture):
        import dataclasses
        from vit_project_tpu.train.vit_loop import ViTTrainer
        base = tiny_cfg(imagenet_fixture, "/tmp/x", epochs=1)
        with pytest.raises(ValueError, match="tp_devices"):
            ViTTrainer(TINY, dataclasses.replace(base, tp_devices=2,
                                                 sp_devices=2))
        with pytest.raises(ValueError, match="tp_devices"):
            ViTTrainer(TINY, dataclasses.replace(base, tp_devices=2,
                                                 fsdp=True))
        with pytest.raises(ValueError, match="heads"):
            ViTTrainer(TINY, dataclasses.replace(base, tp_devices=3))

    def test_fsdp_rejects_pp(self, imagenet_fixture):
        import dataclasses
        with pytest.raises(ValueError, match="fsdp"):
            from vit_project_tpu.train.vit_loop import ViTTrainer
            ViTTrainer(TINY, dataclasses.replace(
                tiny_cfg(imagenet_fixture, "/tmp/x", epochs=1),
                fsdp=True, pp_stages=2, pp_micro=2))

    def test_fsdp_rejects_sp(self, imagenet_fixture):
        """fsdp's sequence-replicated attention pin would force GSPMD to
        materialize full-sequence activations around the sequence-sharded
        attention paths (ring and gather-sp alike) — the combination must
        refuse up front rather than silently defeat sp's memory bound."""
        import dataclasses
        from vit_project_tpu.train.vit_loop import ViTTrainer
        base = tiny_cfg(imagenet_fixture, "/tmp/x", epochs=1)
        for ring in (False, True):
            with pytest.raises(ValueError, match="fsdp does not compose"):
                ViTTrainer(TINY, dataclasses.replace(
                    base, fsdp=True, sp_devices=2, sp_ring=ring))

    def test_grad_accum_matches_unsplit(self, imagenet_fixture, tmp_path):
        """grad_accum=2 (two scanned gradient microbatches per step) trains
        the same trajectory as the unsplit step — CE is a mean over the
        batch, so summed-then-halved microbatch grads equal the full-batch
        grad up to reduction order. Composes with remat (scan replays each
        microbatch's forward in its own backward)."""
        import dataclasses
        base_out = str(tmp_path / "base")
        run_vit_training(tiny_cfg(imagenet_fixture, base_out, epochs=2),
                         vit_cfg=TINY)
        ga_out = str(tmp_path / "ga")
        cfg = dataclasses.replace(tiny_cfg(imagenet_fixture, ga_out,
                                           epochs=2),
                                  grad_accum=2, remat=True)
        run_vit_training(cfg, vit_cfg=TINY)

        base = pd.read_csv(os.path.join(base_out, "training_metrics.csv"))
        ga = pd.read_csv(os.path.join(ga_out, "training_metrics.csv"))
        np.testing.assert_allclose(ga["train_loss"], base["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(ga["val_loss"], base["val_loss"],
                                   rtol=1e-4)
        from vit_project_tpu.ckpt import vit_ckpt
        ck_b = vit_ckpt.load_checkpoint(
            os.path.join(base_out, "checkpoint_latest.pth"))
        ck_g = vit_ckpt.load_checkpoint(
            os.path.join(ga_out, "checkpoint_latest.pth"))
        for a, b in zip(jax.tree_util.tree_leaves(ck_g["params"]),
                        jax.tree_util.tree_leaves(ck_b["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_rsa_eval_cli(self, imagenet_fixture, things48_fixture, tmp_path):
        from vit_project_tpu.cli import vit_rsa_eval
        out = str(tmp_path / "run2")
        run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=2),
                         vit_cfg=TINY)
        out_csv = str(tmp_path / "rsa_results.csv")
        # register tiny backbone for the CLI
        vvit.VIT_CONFIGS["test-tiny-3"] = TINY
        df = vit_rsa_eval.main([
            "--checkpoint_dir", out, "--output_csv", out_csv,
            "--backbone", "test-tiny-3", "--compute_dtype", "float32",
            "--things_csv", things48_fixture["things_csv"],
            "--things_img_dir", things48_fixture["things_img_dir"],
            "--things_rdm_path", things48_fixture["things_rdm_path"]])
        got = pd.read_csv(out_csv)
        assert list(got.columns) == ["checkpoint", "epoch", "train_loss",
                                     "val_loss", "val_acc", "rsa_score"]
        assert len(got) == 2
        assert got["rsa_score"].between(-1, 1).all()

    def test_measurement_grid(self, imagenet_fixture, things48_fixture,
                              tmp_path):
        from vit_project_tpu.cli import vit_measure
        out = str(tmp_path / "run3")
        run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=2),
                         vit_cfg=TINY)
        # enriched baseline CSV with rsa_score for epoch 1
        met = pd.read_csv(os.path.join(out, "training_metrics.csv"))
        met["rsa_score"] = [0.1, 0.2]
        baseline_csv = str(tmp_path / "rsa_baseline.csv")
        met.to_csv(baseline_csv, index=False)

        vvit.VIT_CONFIGS["test-tiny-3"] = TINY
        out_csv = str(tmp_path / "perturbation_effects.csv")
        results = vit_measure.main([
            "--baseline_checkpoint_dir", out,
            "--baseline_metrics_csv", baseline_csv,
            "--data_path", imagenet_fixture,
            "--output_csv", out_csv,
            "--things_csv", things48_fixture["things_csv"],
            "--things_img_dir", things48_fixture["things_img_dir"],
            "--things_rdm_path", things48_fixture["things_rdm_path"],
            "--perturbation_types", "gaussian", "label_shuffle",
            "--perturb_epochs", "1",
            "--batch_size", "8", "--num_workers", "2",
            "--backbone", "test-tiny-3", "--compute_dtype", "float32",
            "--total_epochs", "3", "--warmup_epochs", "1", "--lr", "0.01"])
        df = pd.read_csv(out_csv)
        assert list(df.columns) == [
            "perturb_epoch", "perturbation_type", "baseline_loss",
            "baseline_rsa", "perturbed_loss", "perturbed_rsa", "delta_loss",
            "delta_rsa"]
        assert set(df["perturbation_type"]) == {"gaussian", "label_shuffle"}
        assert np.allclose(df["delta_loss"],
                           df["perturbed_loss"] - df["baseline_loss"])
        # companion summary table (reference perturbation_summary_table.csv)
        summ = pd.read_csv(os.path.join(os.path.dirname(out_csv),
                                        "perturbation_summary_table.csv"))
        assert list(summ.columns) == ["perturb_epoch", "perturbation_type",
                                      "delta_loss", "delta_rsa",
                                      "baseline_loss", "baseline_rsa"]
        assert len(summ) == len(df)
        # a missing checkpoint epoch is skipped, not fatal
        r = vit_measure.measure_perturbation_effect(
            99, "gaussian", None, out,
            pd.read_csv(baseline_csv), None, None, None, None, {}, 0.1)
        assert r is None


class TestShardedCheckpoint:
    def test_orbax_roundtrip_with_sharding_template(self, tmp_path):
        """Pod-scale checkpoint path: orbax sharded write + restore against a
        sharding template must reproduce the tree with placements intact."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from vit_project_tpu.ckpt import serialization as ser
        from vit_project_tpu.ckpt import vit_ckpt
        from vit_project_tpu.parallel import mesh as vmesh

        mesh = vmesh.make_mesh()
        tree = {
            "params": {"w": vmesh.replicate(mesh, jnp.arange(16.0)
                                            .reshape(4, 4)),
                       "b": vmesh.replicate(mesh, jnp.ones(3))},
            "step": 7,
        }
        p = str(tmp_path / "ck.orbax")
        ser.save_sharded(p, tree)
        got = ser.load_sharded(p, template=tree)
        assert int(got["step"]) == 7
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(tree)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert got["params"]["w"].sharding == tree["params"]["w"].sharding

        # save_checkpoint sharded variant + latest_checkpoint preference:
        # the orbax 'latest' is a pointer to the epoch dir (one collective
        # write per epoch), so latest resolves to the epoch dir itself
        path = vit_ckpt.save_checkpoint(
            3, tree["params"], {"mom": tree["params"]}, {"last_epoch": 3},
            1.0, 2.0, 0.5, str(tmp_path / "out"), sharded=True)
        assert path.endswith("checkpoint_epoch_003.orbax")
        latest = vit_ckpt.latest_checkpoint(str(tmp_path / "out"))
        assert latest.endswith("checkpoint_epoch_003.orbax")
        ck = vit_ckpt.load_checkpoint(latest)
        assert int(ck["epoch"]) == 3

    def test_latest_checkpoint_picks_newer_format_by_mtime(self, tmp_path):
        """A pod run (orbax) followed by a single-host continuation (pickle)
        of the same output_dir must resume from the NEWER file — a fixed
        format preference would silently roll training back."""
        import os
        from vit_project_tpu.ckpt import vit_ckpt
        out = str(tmp_path / "out")
        vit_ckpt.save_checkpoint(3, {"w": 1.0}, {"w": 0.0}, {"last_epoch": 3},
                                 1.0, 2.0, 0.5, out, sharded=True)
        vit_ckpt.save_checkpoint(9, {"w": 2.0}, {"w": 0.0}, {"last_epoch": 9},
                                 1.0, 2.0, 0.5, out, sharded=False)
        ptr = os.path.join(out, "checkpoint_latest.orbax.ptr")
        pth = os.path.join(out, "checkpoint_latest.pth")
        os.utime(ptr, (1_000_000, 1_000_000))
        os.utime(pth, (2_000_000, 2_000_000))
        assert vit_ckpt.latest_checkpoint(out) == pth
        os.utime(ptr, (3_000_000, 3_000_000))
        assert vit_ckpt.latest_checkpoint(out) == os.path.join(
            out, "checkpoint_epoch_003.orbax")
        # legacy trees with a full checkpoint_latest.orbax dir still resolve
        os.remove(ptr)
        legacy = os.path.join(out, "checkpoint_latest.orbax")
        os.rename(os.path.join(out, "checkpoint_epoch_003.orbax"), legacy)
        os.utime(legacy, (3_000_000, 3_000_000))
        assert vit_ckpt.latest_checkpoint(out) == legacy

    def test_epoch_checkpoint_resolves_both_formats(self, tmp_path):
        """The measurement CLIs fork from checkpoint_epoch_{N:03d} written by
        either a single-host (.pth) or pod (.orbax) baseline; when both exist
        the newer wins (same rule as latest_checkpoint)."""
        import os
        from vit_project_tpu.ckpt import vit_ckpt
        out = str(tmp_path / "out")
        assert vit_ckpt.epoch_checkpoint(out, 4) is None
        vit_ckpt.save_checkpoint(4, {"w": 1.0}, {"w": 0.0}, {"last_epoch": 4},
                                 1.0, 2.0, 0.5, out, sharded=False)
        p = vit_ckpt.epoch_checkpoint(out, 4)
        assert p.endswith("checkpoint_epoch_004.pth")
        assert vit_ckpt.load_checkpoint(p)["epoch"] == 4
        vit_ckpt.save_checkpoint(4, {"w": 2.0}, {"w": 0.0}, {"last_epoch": 4},
                                 1.0, 2.0, 0.5, out, sharded=True)
        orbax = os.path.join(out, "checkpoint_epoch_004.orbax")
        os.utime(orbax, (3_000_000_0, 3_000_000_0))
        pth = os.path.join(out, "checkpoint_epoch_004.pth")
        os.utime(pth, (4_000_000_0, 4_000_000_0))
        assert vit_ckpt.epoch_checkpoint(out, 4) == pth


# ---------------------------------------------------------------- preemption --

class _TripAfter:
    """Duck-typed preemption guard: requests a stop at the Nth batch-boundary
    poll (run_vit_training wraps injected guards in a nullcontext, so no
    signal handlers are involved)."""

    def __init__(self, n):
        self.n = n
        self.calls = 0
        self.mid_state = None

    def should_stop(self):
        self.calls += 1
        return self.calls >= self.n


class TestPreemption:
    def test_sigterm_guard_unit(self):
        """SIGTERM sets the flag inside the scope; handlers are restored."""
        import signal as sig
        from vit_project_tpu.core.preempt import PreemptionGuard
        g = PreemptionGuard()
        prev = sig.getsignal(sig.SIGTERM)
        with g:
            assert not g.requested and not g.should_stop()
            os.kill(os.getpid(), sig.SIGTERM)
            assert g.requested and g.should_stop()
            assert g.signaled_by == sig.SIGTERM
        assert sig.getsignal(sig.SIGTERM) is prev
        # programmatic request (out-of-band preemption notice)
        g2 = PreemptionGuard()
        g2.request()
        assert g2.should_stop()

    def test_preempt_mid_epoch_resume_bitexact(self, imagenet_fixture,
                                               tmp_path):
        """A run preempted mid-epoch (with and without a prior full
        checkpoint) resumes from checkpoint_preempt.pth and reproduces the
        uninterrupted run bit-exactly: same metrics CSV, same final params."""
        from vit_project_tpu.ckpt import serialization as ser
        ref_out = str(tmp_path / "ref")
        run_vit_training(tiny_cfg(imagenet_fixture, ref_out, epochs=2),
                         vit_cfg=TINY)
        ref_df = pd.read_csv(os.path.join(ref_out, "training_metrics.csv"))
        ref_final = ser.load(
            os.path.join(ref_out, "checkpoint_epoch_001.pth"))

        # the fixture epoch is 6 batches (48 imgs / batch 8, drop_last).
        # trip=1: preempt at epoch 0 batch 0 (NO full checkpoint exists yet);
        # trip=7: preempt at epoch 1 batch 0 (resumes past a full checkpoint)
        for trip, p_epoch, csv_rows_before in ((1, 0, []), (7, 1, [0])):
            out = str(tmp_path / f"pre{trip}")
            res = run_vit_training(
                tiny_cfg(imagenet_fixture, out, epochs=2), vit_cfg=TINY,
                preempt_guard=_TripAfter(trip))
            assert res.get("preempted") is True
            ppath = os.path.join(out, "checkpoint_preempt.pth")
            assert os.path.exists(ppath)
            pc = ser.load(ppath)
            assert pc["epoch"] == p_epoch
            assert pc["batch_idx"] == 1  # stopped after one trained batch
            csv = os.path.join(out, "training_metrics.csv")
            got_rows = (list(pd.read_csv(csv)["epoch"])
                        if os.path.exists(csv) else [])
            assert got_rows == csv_rows_before  # no row for the torn epoch

            # second invocation: resumes INSIDE the epoch and finishes
            res2 = run_vit_training(
                tiny_cfg(imagenet_fixture, out, epochs=2), vit_cfg=TINY)
            assert not res2.get("preempted")
            assert not os.path.exists(ppath)  # superseded and removed
            pd.testing.assert_frame_equal(pd.read_csv(csv), ref_df)
            final = ser.load(os.path.join(out, "checkpoint_epoch_001.pth"))
            for a, b in zip(jax.tree_util.tree_leaves(ref_final["params"]),
                            jax.tree_util.tree_leaves(final["params"])):
                assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_stale_preempt_checkpoint_removed(self, imagenet_fixture,
                                              tmp_path):
        """A preempt checkpoint older than the latest full checkpoint is
        dead state: resume ignores and deletes it."""
        from vit_project_tpu.ckpt import serialization as ser
        out = str(tmp_path / "run")
        run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=2),
                         vit_cfg=TINY)
        ppath = os.path.join(out, "checkpoint_preempt.pth")
        ser.save(ppath, {"epoch": 0, "batch_idx": 1, "total_loss": 0.0,
                         "num_batches": 1, "params": {}, "opt_state": {},
                         "scheduler_state": {}})
        run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=3),
                         vit_cfg=TINY)
        assert not os.path.exists(ppath)
        df = pd.read_csv(os.path.join(out, "training_metrics.csv"))
        assert list(df["epoch"]) == [0, 1, 2]

    def test_epoch_boundary_collective_stop(self, imagenet_fixture, tmp_path):
        """The pod-cadence stop: a guard whose COLLECTIVE poll trips (the
        local mid-epoch poll stays quiet, as on a pod) stops the run after
        the epoch's full checkpoint, without a preempt file; plain
        auto-resume finishes the run."""

        class _CollTrip:
            def __init__(self, n):
                self.n = n
                self.calls = 0
                self.mid_state = None

            def should_stop(self):
                return False  # pods: local mid-epoch polls always decline

            def should_stop_collective(self):
                self.calls += 1
                return self.calls >= self.n

        out = str(tmp_path / "coll")
        res = run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=3),
                               vit_cfg=TINY, preempt_guard=_CollTrip(1))
        assert res.get("preempted") is True
        assert not os.path.exists(os.path.join(out, "checkpoint_preempt.pth"))
        assert os.path.exists(os.path.join(out, "checkpoint_epoch_000.pth"))
        df = pd.read_csv(os.path.join(out, "training_metrics.csv"))
        assert list(df["epoch"]) == [0]  # epoch 0 completed, then stopped
        res2 = run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=3),
                                vit_cfg=TINY)
        assert not res2.get("preempted")
        df2 = pd.read_csv(os.path.join(out, "training_metrics.csv"))
        assert list(df2["epoch"]) == [0, 1, 2]

    def test_final_epoch_boundary_not_flagged(self, imagenet_fixture,
                                              tmp_path):
        """The collective boundary poll is skipped on the last epoch — a
        finished run must not report preempted."""

        class _AlwaysColl:
            def should_stop(self):
                return False

            def should_stop_collective(self):
                return True

            mid_state = None

        out = str(tmp_path / "fin")
        res = run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=1),
                               vit_cfg=TINY, preempt_guard=_AlwaysColl())
        assert not res.get("preempted")
        df = pd.read_csv(os.path.join(out, "training_metrics.csv"))
        assert list(df["epoch"]) == [0]


class TestCheckpointRetention:
    def test_keep_last_prunes_and_resume_survives(self, imagenet_fixture,
                                                  tmp_path):
        """keep_last=2 over 4 epochs leaves only the last two per-epoch
        files; 'latest' survives and auto-resume continues from it."""
        import dataclasses
        from vit_project_tpu.ckpt import vit_ckpt
        out = str(tmp_path / "run")
        cfg = dataclasses.replace(tiny_cfg(imagenet_fixture, out, epochs=4),
                                  keep_last=2)
        run_vit_training(cfg, vit_cfg=TINY)
        have = sorted(f for f in os.listdir(out)
                      if f.startswith("checkpoint_epoch_"))
        assert have == ["checkpoint_epoch_002.pth", "checkpoint_epoch_003.pth"]
        assert os.path.exists(os.path.join(out, "checkpoint_latest.pth"))
        # resume still works (latest is intact)
        run_vit_training(dataclasses.replace(cfg, epochs=5), vit_cfg=TINY)
        df = pd.read_csv(os.path.join(out, "training_metrics.csv"))
        assert list(df["epoch"]) == [0, 1, 2, 3, 4]
        assert vit_ckpt.epoch_checkpoint(out, 4) is not None

    def test_default_keeps_all(self, imagenet_fixture, tmp_path):
        out = str(tmp_path / "all")
        run_vit_training(tiny_cfg(imagenet_fixture, out, epochs=3),
                         vit_cfg=TINY)
        have = [f for f in os.listdir(out)
                if f.startswith("checkpoint_epoch_")]
        assert len(have) == 3
