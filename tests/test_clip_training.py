"""Integration tests: end-to-end CLIP-HBA behavioral training on a synthetic
THINGS-like dataset with the tiny backbone, exercising the full loop -> CSV ->
checkpoints -> fork/resume. The central property (the reference defends it with
exhaustive RNG checkpointing, SURVEY.md section 4): a fork from epoch N
reproduces the baseline EXACTLY outside the perturbation window."""
import csv
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.train import clip_loop
from vit_project_tpu.core import csvio


@pytest.fixture(scope="module")
def things_fixture(tmp_path_factory):
    """Synthetic THINGS: 60 train images + 48 inference images + RDM .mat."""
    from PIL import Image
    import pandas as pd
    import scipy.io

    root = tmp_path_factory.mktemp("things")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rs = np.random.RandomState(0)
    names = []
    for i in range(60):
        arr = rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        name = f"thing_{i:03d}.png"
        Image.fromarray(arr).save(img_dir / name)
        names.append(name)

    df = pd.DataFrame({"image_name": names})
    for j in range(66):
        df[f"d{j}"] = (rs.rand(60) * 2).astype(np.float32)
    train_csv = root / "spose_train.csv"
    df.to_csv(train_csv)

    inf_df = pd.DataFrame({"image_name": names[:48]})
    for j in range(66):
        inf_df[f"d{j}"] = (rs.rand(48) * 2).astype(np.float32)
    inf_csv = root / "spose_val.csv"
    inf_df.to_csv(inf_csv)

    rdm = rs.rand(48, 48).astype(np.float64)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    mat = root / "RDM48_triplet.mat"
    scipy.io.savemat(mat, {"RDM48_triplet": rdm})

    return {"csv_file": str(train_csv), "img_dir": str(img_dir),
            "inference_csv_file": str(inf_csv),
            "RDM48_triplet_dir": str(mat)}


def base_config(things_fixture, out_dir, **over):
    cfg = {
        **things_fixture,
        "backbone": "test-tiny",
        "epochs": 3,
        "batch_size": 16,
        "train_portion": 0.8,
        "lr": 3e-4,
        "logger": None,
        "early_stopping_patience": 20,
        "checkpoint_path": os.path.join(out_dir, "model.ckpt"),
        "training_res_path": os.path.join(out_dir, "training_res.csv"),
        "dora_parameters_path": os.path.join(out_dir, "dora_params"),
        "random_state_path": os.path.join(out_dir, "random_states"),
        "random_seed": 1,
        "vision_layers": 1,
        "transformer_layers": 1,
        "rank": 4,
        "criterion": "mse",
        "cuda": 0,
        "perturb_type": "baseline",
        "perturb_length": 0,
        "perturb_distribution": "target",
        "perturb_seed": 42,
        "training_run": 0,
        "compute_dtype": "float32",
    }
    cfg.update(over)
    return cfg


def read_csv_rows(path):
    with open(path) as f:
        return list(csv.reader(f))


class TestBaselineRun:
    def test_baseline_end_to_end(self, things_fixture, tmp_path):
        out = str(tmp_path / "baseline")
        cfg = base_config(things_fixture, out)
        result = clip_loop.run_behavioral_training(cfg)
        assert result["last_epoch0"] == 2

        rows = read_csv_rows(cfg["training_res_path"])
        assert rows[0] == csvio.CLIP_HEADERS
        assert len(rows) == 4  # header + 3 epochs
        assert [r[0] for r in rows[1:]] == ["1", "2", "3"]
        # all perturbation flags False in baseline
        for r in rows[1:]:
            assert r[5:] == ["False", "False", "False", "False"]
        # rsa rho in [-1, 1], losses finite
        for r in rows[1:]:
            assert -1 <= float(r[3]) <= 1
            assert np.isfinite(float(r[1])) and np.isfinite(float(r[2]))

        # artifacts
        for e in (1, 2, 3):
            assert os.path.exists(os.path.join(
                out, "dora_params", f"epoch{e}_dora_params.pth"))
            assert os.path.exists(os.path.join(
                out, "random_states", f"epoch{e}_random_states.pth"))
        assert os.path.exists(os.path.join(
            out, "random_states", "dataset_split_indices.pth"))

    def test_baseline_deterministic(self, things_fixture, tmp_path):
        outs = []
        for name in ("a", "b"):
            out = str(tmp_path / name)
            cfg = base_config(things_fixture, out, epochs=2)
            clip_loop.run_behavioral_training(cfg)
            outs.append(read_csv_rows(cfg["training_res_path"]))
        assert outs[0] == outs[1]


class TestForkResume:
    def test_fork_outside_window_reproduces_baseline(self, things_fixture,
                                                     tmp_path):
        """Sweep-style fork from epoch 1 with the perturbation window far in the
        future must continue the baseline bit-exactly (epochs 2..3)."""
        base_out = str(tmp_path / "base")
        bcfg = base_config(things_fixture, base_out, epochs=3)
        clip_loop.run_behavioral_training(bcfg)
        base_rows = read_csv_rows(bcfg["training_res_path"])

        fork_out = str(tmp_path / "fork")
        fcfg = base_config(
            things_fixture, fork_out, epochs=3,
            perturb_type="random_target", perturb_length=1,
            training_run=99,  # window far beyond the run
            resume_from_epoch=1,
            baseline_dora_directory=os.path.join(base_out, "dora_params"),
            baseline_random_state_path=os.path.join(base_out, "random_states"),
            baseline_split_indices_path=os.path.join(
                base_out, "random_states", "dataset_split_indices.pth"))
        # fork loads DoRA ckpt epoch{training_run-1}=98 (missing) -> must point
        # resume path at the baseline artifacts instead
        fcfg["resume_dora_parameters_path"] = os.path.join(base_out,
                                                           "dora_params")
        clip_loop.run_behavioral_training(fcfg)
        fork_rows = read_csv_rows(fcfg["training_res_path"])

        # epochs 2 and 3 identical to baseline, bit-exact
        assert fork_rows[1][0] == "2" and fork_rows[2][0] == "3"
        assert fork_rows[1][:5] == base_rows[2][:5]
        assert fork_rows[2][:5] == base_rows[3][:5]

    def test_perturbed_epoch_differs_then_recovers_data_order(
            self, things_fixture, tmp_path):
        """Perturbing exactly epoch 2 changes epoch-2 metrics but flags row 2
        only (the single-epoch sweep contract)."""
        base_out = str(tmp_path / "base2")
        bcfg = base_config(things_fixture, base_out, epochs=3)
        clip_loop.run_behavioral_training(bcfg)
        base_rows = read_csv_rows(bcfg["training_res_path"])

        fork_out = str(tmp_path / "fork2")
        fcfg = base_config(
            things_fixture, fork_out, epochs=3,
            perturb_type="random_target", perturb_length=1,
            training_run=2, resume_from_epoch=1,
            baseline_dora_directory=os.path.join(base_out, "dora_params"),
            baseline_random_state_path=os.path.join(base_out, "random_states"),
            baseline_split_indices_path=os.path.join(
                base_out, "random_states", "dataset_split_indices.pth"))
        clip_loop.run_behavioral_training(fcfg)
        rows = read_csv_rows(fcfg["training_res_path"])
        # row for epoch 2 flagged used_random_targets and metrics differ
        assert rows[1][0] == "2"
        assert rows[1][5] == "True"
        assert rows[1][1] != base_rows[2][1]
        # epoch 3 unflagged
        assert rows[2][5] == "False"

    def test_cross_file_resume_prepopulates(self, things_fixture, tmp_path):
        """Lengths-style: resume into a NEW csv pre-populated from the previous
        run's rows (reference train_model :816-834)."""
        base_out = str(tmp_path / "base3")
        bcfg = base_config(things_fixture, base_out, epochs=2)
        clip_loop.run_behavioral_training(bcfg)

        new_out = str(tmp_path / "longer")
        ncfg = base_config(
            things_fixture, new_out, epochs=3,
            perturb_type="random_target", perturb_length=2,
            training_run=1, resume_from_epoch=2,
            previous_training_res_path=bcfg["training_res_path"],
            resume_dora_parameters_path=os.path.join(base_out, "dora_params"),
            resume_random_state_path=os.path.join(base_out, "random_states"),
            baseline_dora_directory=os.path.join(base_out, "dora_params"),
            baseline_random_state_path=os.path.join(base_out, "random_states"),
            baseline_split_indices_path=os.path.join(
                base_out, "random_states", "dataset_split_indices.pth"))
        clip_loop.run_behavioral_training(ncfg)
        rows = read_csv_rows(ncfg["training_res_path"])
        base_rows = read_csv_rows(bcfg["training_res_path"])
        assert [r[0] for r in rows[1:]] == ["1", "2", "3"]
        # rows 1-2 copied from the shorter run
        assert rows[1] == base_rows[1]
        assert rows[2] == base_rows[2]


class TestHashTokenizerGuardrail:
    """Pretrained weights + hash-tokenized prompts would silently void the
    behavioral RSA (wrong token space for the text tower) — must hard-error
    unless the explicit escape hatch is set."""

    def test_refuses_then_escape_hatch_works(self, things_fixture, tmp_path,
                                             monkeypatch):
        import torch
        from test_clip_conversion import TorchCLIP
        monkeypatch.delenv("CLIP_BPE_PATH", raising=False)
        torch.manual_seed(0)
        weights = tmp_path / "tiny_clip.pt"
        torch.save(TorchCLIP().eval().state_dict(), weights)

        cfg = base_config(things_fixture, str(tmp_path / "refused"),
                          clip_weights=str(weights), epochs=1)
        with pytest.raises(ValueError, match="BPE vocab"):
            clip_loop.run_behavioral_training(dict(cfg))
        assert not os.path.exists(cfg["training_res_path"])

        override = base_config(things_fixture, str(tmp_path / "allowed"),
                               clip_weights=str(weights), epochs=1,
                               allow_hash_tokenizer=True)
        clip_loop.run_behavioral_training(dict(override))
        assert os.path.exists(override["training_res_path"])


class TestEarlyStopping:
    def test_patience_triggers(self, things_fixture, tmp_path):
        out = str(tmp_path / "es")
        # lr=0 -> no improvement ever after epoch 1 -> stops at patience+1 epochs
        cfg = base_config(things_fixture, out, epochs=10, lr=0.0,
                          early_stopping_patience=2)
        result = clip_loop.run_behavioral_training(cfg)
        rows = read_csv_rows(cfg["training_res_path"])
        # epoch1 sets best; epochs 2,3 no improve (ties are not improvements)
        assert len(rows) - 1 == 3
        assert result["last_epoch0"] == 2


class TestNanBatchSkipAggregation:
    def test_epoch_loss_stays_finite_when_a_batch_is_skipped(
            self, things_fixture, tmp_path):
        """A skipped (non-finite) batch's loss entry is NaN; the epoch
        aggregation must mask it BEFORE multiplying (NaN * 0 = NaN would
        write a NaN Training Loss to the CSV — the exact failure the
        ok-mask exists to prevent)."""
        import pandas as pd
        from vit_project_tpu.data import things as dthings
        out = str(tmp_path / "nan_run")
        df = pd.read_csv(things_fixture["csv_file"], index_col=0)
        df.loc[df.index[0], "d3"] = np.nan   # poison one target row
        bad_csv = str(tmp_path / "poisoned.csv")
        df.to_csv(bad_csv)
        # pin the poisoned row into the TRAIN split (the test side has no
        # NaN guard — reference parity)
        split_path = str(tmp_path / "dataset_split_indices.pth")
        dthings.save_split_indices(split_path, np.arange(0, 48),
                                   np.arange(48, 60), 1)
        cfg = base_config(things_fixture, out, epochs=1, csv_file=bad_csv,
                          baseline_split_indices_path=split_path)
        clip_loop.run_behavioral_training(cfg)
        rows = read_csv_rows(os.path.join(out, "training_res.csv"))
        assert np.isfinite(float(rows[1][1])), rows[1]   # train loss
        assert np.isfinite(float(rows[1][2]))            # test loss


class TestClipPreemption:
    """Epoch-boundary preemption (core/preempt.py): a SIGTERM-style stop
    after epoch N leaves the standard per-epoch artifact tree, and the
    in-place resume reproduces the uninterrupted run bit-exactly."""

    class _Trip:
        def __init__(self, n):
            self.n = n
            self.calls = 0

        def should_stop(self):
            self.calls += 1
            return self.calls >= self.n

    def test_preempt_then_resume_bitexact(self, things_fixture, tmp_path):
        ref = base_config(things_fixture, str(tmp_path / "ref"), epochs=3)
        clip_loop.run_behavioral_training(ref)
        ref_rows = read_csv_rows(ref["training_res_path"])

        out = str(tmp_path / "pre")
        cfg = base_config(things_fixture, out, epochs=3)
        g = self._Trip(1)  # polled once per epoch -> stop after epoch 1
        res = clip_loop.run_behavioral_training(cfg, preempt_guard=g)
        assert res["preempted"] is True
        assert g.stopped_at_epoch == 1
        rows = read_csv_rows(cfg["training_res_path"])
        assert [r[0] for r in rows[1:]] == ["1"]  # only the finished epoch

        # in-place resume (the lengths-CLI key pattern) finishes the run
        rcfg = base_config(things_fixture, out, epochs=3,
                           resume_from_epoch=1)
        rcfg["previous_training_res_path"] = rcfg["training_res_path"]
        rcfg["resume_dora_parameters_path"] = os.path.join(out, "dora_params")
        rcfg["resume_random_state_path"] = os.path.join(out, "random_states")
        res2 = clip_loop.run_behavioral_training(rcfg)
        assert res2["preempted"] is False
        assert read_csv_rows(rcfg["training_res_path"]) == ref_rows

    def test_final_epoch_preempt_not_flagged(self, things_fixture, tmp_path):
        """A notice landing during the FINAL epoch must not mark a completed
        run as preempted (the CLI would exit 143 and orchestration would
        re-queue finished work)."""
        out = str(tmp_path / "final")
        cfg = base_config(things_fixture, out, epochs=2)
        g = self._Trip(2)  # polls: epoch-0 boundary (1); epoch 1 is final
        res = clip_loop.run_behavioral_training(cfg, preempt_guard=g)
        assert res["preempted"] is False
        rows = read_csv_rows(cfg["training_res_path"])
        assert [r[0] for r in rows[1:]] == ["1", "2"]  # ran to completion


class TestFrozenCache:
    """frozen_cache=True trains from cached frozen-prefix activations
    (ClipHBATrainer.build_prefix_cache): the trajectory must match the
    full-tower run to float tolerance, with image-perturbing epochs
    transparently routed back through the full tower."""

    @staticmethod
    def _float_rows(rows):
        return [[float(v) for v in r[1:5]] for r in rows[1:]]

    def test_baseline_matches_full_tower(self, things_fixture, tmp_path):
        full = base_config(things_fixture, str(tmp_path / "full"), epochs=3)
        clip_loop.run_behavioral_training(full)
        cached = base_config(things_fixture, str(tmp_path / "cached"),
                             epochs=3, frozen_cache=True)
        clip_loop.run_behavioral_training(cached)
        a = self._float_rows(read_csv_rows(full["training_res_path"]))
        b = self._float_rows(read_csv_rows(cached["training_res_path"]))
        # numerically equivalent, not bit-identical: the prefix runs in its
        # own program so XLA may fuse/round differently at the cache boundary
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   rtol=5e-4, atol=5e-4)

    def test_target_kind_fork_matches_full_tower(self, things_fixture,
                                                 tmp_path):
        """random_target (target-only kind) trains ENTIRELY from the cache —
        including the perturbed epoch (the injector never touches images)."""
        common = dict(epochs=3, perturb_type="random_target",
                      perturb_length=1, training_run=2)
        full = base_config(things_fixture, str(tmp_path / "full"), **common)
        clip_loop.run_behavioral_training(full)
        cached = base_config(things_fixture, str(tmp_path / "cached"),
                             frozen_cache=True, **common)
        clip_loop.run_behavioral_training(cached)
        a = read_csv_rows(full["training_res_path"])
        b = read_csv_rows(cached["training_res_path"])
        assert [r[5:] for r in a] == [r[5:] for r in b]  # same flags
        np.testing.assert_allclose(np.array(self._float_rows(b)),
                                   np.array(self._float_rows(a)),
                                   rtol=5e-4, atol=5e-4)

    def test_image_kind_fork_falls_back_in_window(self, things_fixture,
                                                  tmp_path):
        """uniform_images replaces the tower input, so its ACTIVE epoch must
        run the full tower; the cached run still matches the full run."""
        common = dict(epochs=3, perturb_type="uniform_images",
                      perturb_length=1, training_run=2)
        full = base_config(things_fixture, str(tmp_path / "full"), **common)
        clip_loop.run_behavioral_training(full)
        cached = base_config(things_fixture, str(tmp_path / "cached"),
                             frozen_cache=True, **common)
        clip_loop.run_behavioral_training(cached)
        a = read_csv_rows(full["training_res_path"])
        b = read_csv_rows(cached["training_res_path"])
        assert a[2][7] == "True"  # epoch-2 row flagged used_uniform_images
        assert [r[5:] for r in a] == [r[5:] for r in b]
        np.testing.assert_allclose(np.array(self._float_rows(b)),
                                   np.array(self._float_rows(a)),
                                   rtol=5e-4, atol=5e-4)

    def test_cached_step_rejects_image_kinds(self, things_fixture, tmp_path):
        """The cached step core itself refuses image-perturbing kinds — the
        routing above is the ONLY legal path to them."""
        from vit_project_tpu.models import clip as vclip
        from vit_project_tpu.adapters import dora as adora
        import jax
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        spec = adora.dora_spec(cfg.visual.layers, cfg.text.layers, 1, 1)
        trainable, static, acfg = adora.apply_dora(
            params, spec, r=4, key=jax.random.PRNGKey(1))
        prompts = np.random.RandomState(0).randint(
            1, 500, (5, cfg.text.context_length))
        trainer = clip_loop.ClipHBATrainer(cfg, params, acfg, static,
                                           jnp.asarray(prompts), lr=1e-3)
        with pytest.raises(ValueError, match="frozen-prefix cache is stale"):
            trainer._step_core("uniform_images", cached=True)
