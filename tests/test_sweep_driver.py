"""Integration test for the sweep driver CLI: baseline -> 2-run sweep with the
reference directory layout, the training-order generators, and the multi-chip
worker dispatch."""
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_project_tpu.ckpt import serialization as ser
from vit_project_tpu.cli import lengths as lengths_cli
from vit_project_tpu.cli import sweep as sweep_cli
from vit_project_tpu.train import clip_loop


def _finish_group_stub(su, forks, inits, guard=None):
    """Monkeypatch stand-in for multi_fork._run_group: mark every fork
    finished and return an empty ride-along stats dict (the real signature
    takes guard= and returns the stats mapping)."""
    for f in forks:
        f.finished = True
    return {"lock_steps": 0, "live": 0, "rider": 0, "pad": 0}


class TestOrders:
    def test_midpoint_order(self):
        order = sweep_cli.generate_midpoint_order(1, 98)
        assert order[:3] == [1, 98, 49]
        assert sorted(order) == list(range(1, 99))  # covers every epoch once

    def test_hybrid_and_strided(self):
        h = sweep_cli.generate_hybrid_training_order()
        assert h[:15] == list(range(1, 16))
        assert set(h) == set(range(1, 99))
        s = sweep_cli.generate_sweep_training_order()
        assert s[:40] == list(range(1, 41))
        assert s[40:43] == [41, 44, 47]

    def test_parse_order(self):
        assert sweep_cli.parse_order("range:3-5") == [3, 4, 5]
        assert sweep_cli.parse_order("7,9,11") == [7, 9, 11]
        assert sweep_cli.parse_order("midpoint")[:2] == [1, 98]


class TestWorkerArgv:
    def test_every_parser_option_propagates(self):
        """_worker_argv is derived from the parser's actions: every option
        except the dispatch-only set must round-trip to a worker (a silently
        dropped flag makes worker runs differ from the requested config)."""
        parser = sweep_cli.build_parser()
        args = parser.parse_args(
            ["--csv_file", "c", "--img_dir", "i", "--inference_csv_file", "v",
             "--RDM48_triplet_dir", "r", "--baseline_dora_directory", "d",
             "--baseline_random_state_path", "s",
             "--baseline_split_indices_path", "x",
             "--output_base_directory", "o", "--remat",
             "--perturb_seed", "123", "--batched_forks", "4"])
        argv = sweep_cli._worker_argv(args)
        reparsed = parser.parse_args(
            argv + ["--training_order", "1"])  # dispatcher always overrides
        for action in parser._actions:
            dest = action.dest
            if dest == "help" or dest in sweep_cli._DISPATCH_ONLY:
                continue
            assert getattr(reparsed, dest) == getattr(args, dest), dest

    def test_dispatch_only_flags_not_forwarded(self):
        parser = sweep_cli.build_parser()
        args = parser.parse_args(
            ["--csv_file", "c", "--img_dir", "i", "--inference_csv_file", "v",
             "--RDM48_triplet_dir", "r", "--baseline_dora_directory", "d",
             "--baseline_random_state_path", "s",
             "--baseline_split_indices_path", "x",
             "--output_base_directory", "o",
             "--workers", "4", "--fork_devices", "8"])
        argv = sweep_cli._worker_argv(args)
        assert "--workers" not in argv
        assert "--fork_devices" not in argv
        assert "--training_order" not in argv


class TestLengthsPreviousRunScan:
    """Cross-run resume dir selection (reference
    clip_train_behavior_lengths.py:188-218 behavior)."""

    @staticmethod
    def _anchor(base, name, onset, length):
        """Write the checkpoint pair that makes a sibling resumable."""
        epoch1 = max(0, onset - 1) + length
        dd = base / name / f"dora_params_{onset}"
        rd = base / name / f"random_states_{onset}"
        os.makedirs(dd, exist_ok=True)
        os.makedirs(rd, exist_ok=True)
        (dd / f"epoch{epoch1}_dora_params.pth").touch()
        (rd / f"epoch{epoch1}_random_states.pth").touch()

    def test_picks_longest_shorter_sibling(self, tmp_path):
        from vit_project_tpu.cli.lengths import find_previous_run_dir
        for name in ("random_target_e2_l1", "random_target_e2_l3",
                     "random_target_e3_l2", "label_shuffle_e2_l2", "junk"):
            os.makedirs(tmp_path / name)
        for name, length in (("random_target_e2_l1", 1),
                             ("random_target_e2_l3", 3),
                             ("random_target_e3_l2", 2),
                             ("label_shuffle_e2_l2", 2)):
            onset = int(name.split("_e")[-1].split("_")[0])
            self._anchor(tmp_path, name, onset, length)
        (tmp_path / "random_target_e2_l4").touch()  # a file must not match
        path, length = find_previous_run_dir(str(tmp_path), "random_target", 2, 5)
        assert length == 3 and path.endswith("random_target_e2_l3")
        # no shorter run / wrong type / missing base -> (None, None)
        assert find_previous_run_dir(str(tmp_path), "random_target", 2, 1) == (None, None)
        assert find_previous_run_dir(str(tmp_path), "image_noise", 2, 5) == (None, None)
        assert find_previous_run_dir(str(tmp_path / "nope"), "random_target", 2, 5) == (None, None)

    def test_torn_sibling_falls_through(self, tmp_path):
        """A sibling whose resume-epoch checkpoint files are missing (crashed
        mid-run) must NOT be selected — the scan falls through to the next
        anchored shorter sibling, like the in-place and batched anchors."""
        from vit_project_tpu.cli.lengths import find_previous_run_dir
        os.makedirs(tmp_path / "random_target_e2_l3")   # torn: no checkpoints
        os.makedirs(tmp_path / "random_target_e2_l2")
        self._anchor(tmp_path, "random_target_e2_l2", 2, 2)
        # l3 has a dora file but no random states: still torn
        dd = tmp_path / "random_target_e2_l3" / "dora_params_2"
        os.makedirs(dd)
        (dd / "epoch4_dora_params.pth").touch()
        path, length = find_previous_run_dir(str(tmp_path), "random_target",
                                             2, 5)
        assert length == 2 and path.endswith("random_target_e2_l2")

    def test_rollback_to_checkpoint(self, tmp_path):
        """The in-place resume anchor (solo AND batched lengths): newest
        1-indexed epoch <= last+1 whose DoRA checkpoint file exists."""
        from vit_project_tpu.cli.lengths import rollback_to_checkpoint
        d = tmp_path / "dora"
        os.makedirs(d)
        for e in (2, 3):
            (d / f"epoch{e}_dora_params.pth").touch()
        assert rollback_to_checkpoint(str(d), 2) == 3   # intact: last+1
        assert rollback_to_checkpoint(str(d), 4) == 3   # torn rows 4,5
        assert rollback_to_checkpoint(str(tmp_path / "none"), 4) == 0
        assert rollback_to_checkpoint(str(d), -1) == 0

    def test_rollback_requires_random_states_too(self, tmp_path):
        """A DoRA file whose epoch's random-states file is missing (legacy
        CSV-first write order, crash between the two saves) must NOT anchor
        the resume: it would silently restart the optimizer state and the
        data seed mid-trajectory — contaminated but continuous-looking."""
        from vit_project_tpu.cli.lengths import rollback_to_checkpoint
        d, rs = tmp_path / "dora", tmp_path / "rs"
        os.makedirs(d)
        os.makedirs(rs)
        for e in (2, 3):
            (d / f"epoch{e}_dora_params.pth").touch()
        (rs / "epoch2_random_states.pth").touch()   # epoch 3's rs missing
        assert rollback_to_checkpoint(str(d), 2, rs_dir=str(rs)) == 2
        assert rollback_to_checkpoint(str(d), 2) == 3   # without rs_dir
        (rs / "epoch3_random_states.pth").touch()
        assert rollback_to_checkpoint(str(d), 2, rs_dir=str(rs)) == 3


@pytest.fixture(scope="module")
def sweep_fixture(tmp_path_factory):
    """Synthetic THINGS + a 3-epoch tiny baseline to fork sweeps from."""
    from PIL import Image
    import pandas as pd
    import scipy.io
    work = tmp_path_factory.mktemp("sweepbase")
    img_dir = work / "images"
    os.makedirs(img_dir)
    rs = np.random.RandomState(0)
    names = []
    for i in range(60):
        n = f"t{i:03d}.png"
        Image.fromarray(rs.randint(0, 255, (48, 48, 3),
                                   dtype=np.uint8)).save(img_dir / n)
        names.append(n)
    df = pd.DataFrame({"image_name": names})
    for j in range(66):
        df[f"d{j}"] = (rs.rand(60) * 2).astype(np.float32)
    df.to_csv(work / "train.csv")
    inf = pd.DataFrame({"image_name": names[:48]})
    for j in range(66):
        inf[f"d{j}"] = (rs.rand(48) * 2).astype(np.float32)
    inf.to_csv(work / "val.csv")
    rdm = rs.rand(48, 48)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    scipy.io.savemat(work / "rdm.mat", {"RDM48_triplet": rdm})

    base = work / "baseline"
    clip_loop.run_behavioral_training({
        "csv_file": str(work / "train.csv"), "img_dir": str(img_dir),
        "inference_csv_file": str(work / "val.csv"),
        "RDM48_triplet_dir": str(work / "rdm.mat"),
        "backbone": "test-tiny", "epochs": 3, "batch_size": 16,
        "train_portion": 0.8, "lr": 3e-4, "logger": None,
        "early_stopping_patience": 20,
        "checkpoint_path": str(base / "m.ckpt"),
        "training_res_path": str(base / "training_res.csv"),
        "dora_parameters_path": str(base / "dora_params"),
        "random_state_path": str(base / "random_states"),
        "random_seed": 1, "vision_layers": 1, "transformer_layers": 1,
        "rank": 4, "criterion": "mse", "cuda": 0,
        "perturb_type": "baseline", "perturb_length": 0,
        "perturb_distribution": "target", "perturb_seed": 42,
        "training_run": 0, "compute_dtype": "float32"})
    return {"work": work, "base": base, "img_dir": img_dir}


def _sweep_argv(fx, out_base, extra):
    work, base = fx["work"], fx["base"]
    return [
        "--csv_file", str(work / "train.csv"),
        "--img_dir", str(fx["img_dir"]),
        "--inference_csv_file", str(work / "val.csv"),
        "--RDM48_triplet_dir", str(work / "rdm.mat"),
        "--backbone", "test-tiny", "--epochs", "3", "--batch_size", "16",
        "--random_seed", "1", "--vision_layers", "1",
        "--transformer_layers", "1", "--rank", "4",
        "--perturb_type", "random_target", "--perturb_seed", "7",
        "--baseline_dora_directory", str(base / "dora_params"),
        "--baseline_random_state_path", str(base / "random_states"),
        "--baseline_split_indices_path",
        str(base / "random_states" / "dataset_split_indices.pth"),
        "--output_base_directory", out_base,
        "--compute_dtype", "float32", *extra]


def _check_run_layout(out_base, runs):
    for run in runs:
        p = os.path.join(out_base, f"training_run{run}",
                         f"training_res_run{run}.csv")
        assert os.path.exists(p), p
        rows = list(csv.reader(open(p)))
        # forked at run-1: rows start at epoch `run`
        assert rows[1][0] == str(run)
        assert rows[1][5] == "True"  # used_random_targets at epoch `run`
        assert os.path.isdir(os.path.join(
            out_base, f"training_run{run}", f"dora_params_run{run}"))


@pytest.mark.slow
class TestSweepDriver:
    def test_two_run_sweep(self, sweep_fixture):
        out_base = str(sweep_fixture["work"] / "sweep_out")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, out_base, ["--training_order", "2,3"]))
        assert failed == []
        _check_run_layout(out_base, (2, 3))
        logs = [f for f in os.listdir(out_base)
                if f.startswith("main_training_log_")]
        assert logs

    def test_parallel_workers(self, sweep_fixture, monkeypatch):
        """--workers 2 dispatches the runs to two subprocesses (on a TPU VM
        each pins its own chip via TPU_VISIBLE_DEVICES; 'none' here for the
        CPU test) and aggregates their failure reports."""
        # conftest forces THIS process to cpu via jax.config, but the worker
        # subprocesses inherit os.environ — without this they'd initialize
        # the host's real accelerator backend and contend for it (and pay
        # the remote plugin's interpreter-startup connection retries)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
        out_base = str(sweep_fixture["work"] / "sweep_workers")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, out_base,
            ["--training_order", "2,3", "--workers", "2",
             "--worker_device_env", "none"]))
        assert failed == []
        _check_run_layout(out_base, (2, 3))
        assert os.path.exists(os.path.join(out_base, "worker0.log"))
        assert os.path.exists(os.path.join(out_base, "worker1.log"))

    def test_worker_failure_aggregation(self, sweep_fixture, monkeypatch):
        """A run that raises inside its worker is surfaced by the dispatcher
        while the healthy run (in the other worker) still completes.

        Failure trigger: training_run9 pre-created as a FILE, so the run's
        os.makedirs raises — a missing fork checkpoint is NOT an error (the
        loop falls back to fresh DoRA init, reference strict=False parity)."""
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")  # see test_parallel_workers
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
        out_base = str(sweep_fixture["work"] / "sweep_fail")
        os.makedirs(out_base)
        with open(os.path.join(out_base, "training_run9"), "w") as f:
            f.write("not a directory")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, out_base,
            ["--training_order", "2,9", "--workers", "2",
             "--worker_device_env", "none"]))
        assert failed == [9], failed
        _check_run_layout(out_base, (2,))


def _read_rows(path):
    with open(path) as f:
        return list(csv.reader(f))


class TestWorkerCrashAccounting:
    """_run_workers must reconstruct a hard-killed worker's outcome from its
    done ledger — never from a previous dispatch's stale report, and never
    from the presence of a (possibly partial) per-run CSV."""

    class _Log:
        def info(self, msg):
            pass

    def _args(self, out_base):
        return sweep_cli.build_parser().parse_args([
            "--csv_file", "c", "--img_dir", "i", "--inference_csv_file", "v",
            "--RDM48_triplet_dir", "r", "--baseline_dora_directory", "d",
            "--baseline_random_state_path", "s",
            "--baseline_split_indices_path", "p",
            "--output_base_directory", out_base,
            "--workers", "1", "--worker_device_env", "none"])

    def _fake_popen(self, monkeypatch, rc, side_effect=None):
        import subprocess

        class FakeProc:
            def __init__(self, cmd, env=None, stdout=None, stderr=None):
                self.env = env

            def wait(self):
                if side_effect is not None:
                    side_effect(self.env)
                return rc

        monkeypatch.setattr(subprocess, "Popen", FakeProc)

    def test_stale_reports_do_not_mask_a_crash(self, tmp_path, monkeypatch):
        out = str(tmp_path)
        # previous dispatch: all ok; partial CSV from the crashed attempt
        with open(os.path.join(out, "worker0_failed.json"), "w") as f:
            f.write("[]")
        with open(os.path.join(out, "worker0_done.json"), "w") as f:
            f.write("[2, 5]")
        run_dir = os.path.join(out, "training_run5")
        os.makedirs(run_dir)
        with open(os.path.join(run_dir, "training_res_run5.csv"), "w") as f:
            f.write("epoch,train_loss\n5,0.1\n")   # in-flight, truncated
        self._fake_popen(monkeypatch, rc=137)      # OOM-killed, wrote nothing
        failed = sweep_cli._run_workers(self._args(out), [2, 5], self._Log())
        assert failed == [2, 5]

    def test_crash_fallback_spares_ledgered_runs(self, tmp_path, monkeypatch):
        out = str(tmp_path)

        def record_then_die(env):
            with open(env["VIT_SWEEP_DONE_JSON"], "w") as f:
                f.write("[2]")   # run 2 completed before the kill

        self._fake_popen(monkeypatch, rc=137, side_effect=record_then_die)
        failed = sweep_cli._run_workers(self._args(out), [2, 5], self._Log())
        assert failed == [5]

    def test_report_done_accumulates_across_calls(self, tmp_path,
                                                  monkeypatch):
        ledger = str(tmp_path / "done.json")
        monkeypatch.setenv("VIT_SWEEP_DONE_JSON", ledger)
        sweep_cli._report_done([5])
        sweep_cli._report_done([2])
        import json
        with open(ledger) as f:
            assert json.load(f) == [2, 5]

    def test_report_done_noop_without_env(self, tmp_path, monkeypatch):
        monkeypatch.delenv("VIT_SWEEP_DONE_JSON", raising=False)
        sweep_cli._report_done([1])   # must not raise or write anywhere
        assert os.listdir(tmp_path) == []

    def test_corrupt_report_reconstructs_from_ledger(self, tmp_path,
                                                     monkeypatch):
        """A truncated failed.json (worker killed mid-write by a pre-atomic
        writer / torn FS) must not crash the dispatcher NOR read as
        'all ok': the done ledger decides, even when rc says success."""
        out = str(tmp_path)

        def torn_report(env):
            with open(env["VIT_SWEEP_FAILED_JSON"], "w") as f:
                f.write("[2,")   # truncated mid-dump
            with open(env["VIT_SWEEP_DONE_JSON"], "w") as f:
                f.write("[2]")
        self._fake_popen(monkeypatch, rc=0, side_effect=torn_report)
        failed = sweep_cli._run_workers(self._args(out), [2, 5], self._Log())
        assert failed == [5]

    def test_report_failed_writes_atomically(self, tmp_path, monkeypatch):
        """_report_failed goes through tmp+os.replace like every other
        ledger write: no .tmp residue, valid JSON at the target."""
        import json
        report = str(tmp_path / "failed.json")
        monkeypatch.setenv("VIT_SWEEP_FAILED_JSON", report)
        sweep_cli._report_failed([5, 2])
        with open(report) as f:
            assert json.load(f) == [5, 2]
        assert os.listdir(tmp_path) == ["failed.json"]


class TestWorkerLogIsolation:
    def test_dispatched_worker_log_name_is_pid_unique(self, tmp_path,
                                                      monkeypatch):
        """Workers spawned in the same second share the dispatcher's output
        dir: without a pid suffix their mode='w' main-log handlers truncate
        one another (and possibly the dispatcher's own log)."""
        captured = []

        class _Bail(Exception):
            pass

        def capture(path):
            captured.append(path)
            raise _Bail
        monkeypatch.setattr(sweep_cli, "setup_main_logger", capture)
        argv = ["--csv_file", "c", "--img_dir", "i",
                "--inference_csv_file", "v", "--RDM48_triplet_dir", "r",
                "--baseline_dora_directory", "d",
                "--baseline_random_state_path", "s",
                "--baseline_split_indices_path", "p",
                "--output_base_directory", str(tmp_path),
                "--training_order", "1"]
        monkeypatch.setenv("VIT_SWEEP_FAILED_JSON", str(tmp_path / "f.json"))
        with pytest.raises(_Bail):
            sweep_cli.main(argv)
        assert f"_p{os.getpid()}.txt" in captured[0]
        monkeypatch.delenv("VIT_SWEEP_FAILED_JSON")
        with pytest.raises(_Bail):
            sweep_cli.main(argv)   # the dispatcher keeps the reference name
        assert "_p" not in os.path.basename(captured[1])


class TestLengthsBatchedMeshSizing:
    def test_mesh_spans_one_group_not_all_onsets(self, tmp_path,
                                                 monkeypatch):
        """--onsets with 8 conditions but --batched_forks 2 must size the
        fork mesh for a 2-fork group: an 8-wide mesh would pad every group
        with 6 discarded ballast forks across chips."""
        from vit_project_tpu.train import multi_fork as mf
        seen = {}

        def fake_mesh(n_requested, n_items):
            seen["mesh"] = (n_requested, n_items)
            return None
        monkeypatch.setattr(mf, "make_fork_mesh", fake_mesh)
        monkeypatch.setattr(mf, "run_batched_lengths",
                            lambda *a, **k: [])
        args = lengths_cli.build_parser().parse_args([
            "--perturb_length", "1", "--onsets", "1,2,3,4,5,6,7,8",
            "--batched_forks", "2", "--fork_devices", "8",
            "--csv_file", "c", "--img_dir", "i",
            "--inference_csv_file", "v", "--RDM48_triplet_dir", "r",
            "--baseline_dora_directory", "d",
            "--baseline_random_state_path", "s",
            "--baseline_split_indices_path", "p",
            "--output_base_directory", str(tmp_path)])
        assert lengths_cli._main_batched(args, "20260101_000000") == []
        assert seen["mesh"] == (8, 2)


class TestLengthsResumeLadderIntegrity:
    """A CSV with rows but no matching checkpoint is a TORN tree (a previous
    attempt died between CSV pre-population and its first checkpoint): the
    in-place resume must fall through to the cross-run/fresh ladder instead
    of silently continuing a mid-lineage CSV from a fresh adapter."""

    def _stub(self, tmp_path, calls):
        import types

        class StubSetup:
            def __init__(self, base_config, logger, mesh, group_size=1):
                self.cfg = types.SimpleNamespace(
                    perturb_length=2, perturb_type="random_target",
                    baseline_dora_directory=str(tmp_path / "base_dora"),
                    baseline_random_state_path=str(tmp_path / "base_rs"),
                    epochs=30)
                self.log = lambda msg: None

            def load_state(self, label, dora_file, rs_dir, rfe, *,
                           require=False):
                calls.append({"label": label, "dora_file": dora_file,
                              "rfe": rfe, "require": require})
                return (None, None, 0)

        return StubSetup

    def test_torn_tree_falls_through_to_cross_resume(self, tmp_path,
                                                     monkeypatch):
        from vit_project_tpu.train import multi_fork as mf
        # torn: CSV has rows through epoch 3, own dora dir has NO epoch3 file
        cond = tmp_path / "random_target_e3_l2"
        os.makedirs(cond / "dora_params_3")
        with open(cond / "training_res.csv", "w") as f:
            f.write("epoch,train_loss\n3,0.5\n")
        # shorter sibling at the same onset: the correct resume source —
        # it must itself be ANCHORED (checkpoint pair on disk) to qualify
        prev = tmp_path / "random_target_e3_l1"
        os.makedirs(prev / "dora_params_3")
        os.makedirs(prev / "random_states_3")
        (prev / "dora_params_3" / "epoch3_dora_params.pth").touch()
        (prev / "random_states_3" / "epoch3_random_states.pth").touch()
        with open(prev / "training_res.csv", "w") as f:
            f.write("epoch,train_loss\n3,0.4\n")

        calls = []
        monkeypatch.setattr(mf, "_Setup", self._stub(tmp_path, calls))
        monkeypatch.setattr(mf, "_run_group", _finish_group_stub)
        failed = mf.run_batched_lengths(
            {"output_base_directory": str(tmp_path)}, [3], 2, group_size=8)
        assert failed == []
        assert len(calls) == 1
        # cross-resume from the l1 sibling at epoch 3 (= onset-1 + prev_len),
        # strict (require=True) because it continues an existing trajectory
        assert calls[0]["rfe"] == 3
        assert calls[0]["require"] is True
        assert calls[0]["dora_file"] == str(
            prev / "dora_params_3" / "epoch3_dora_params.pth")

    def test_intact_tree_resumes_in_place(self, tmp_path, monkeypatch):
        from vit_project_tpu.train import multi_fork as mf
        cond = tmp_path / "random_target_e3_l2"
        os.makedirs(cond / "dora_params_3")
        with open(cond / "training_res.csv", "w") as f:
            f.write("epoch,train_loss\n3,0.5\n")
        with open(cond / "dora_params_3" / "epoch3_dora_params.pth",
                  "w") as f:
            f.write("x")   # checkpoint OF the last completed epoch (1-idx 3)
        os.makedirs(cond / "random_states_3")
        (cond / "random_states_3" / "epoch3_random_states.pth").touch()

        calls = []
        monkeypatch.setattr(mf, "_Setup", self._stub(tmp_path, calls))
        monkeypatch.setattr(mf, "_run_group", _finish_group_stub)
        failed = mf.run_batched_lengths(
            {"output_base_directory": str(tmp_path)}, [3], 2, group_size=8)
        assert failed == []
        assert calls[0]["rfe"] == 3 and calls[0]["require"] is True
        assert calls[0]["dora_file"].endswith(
            "random_target_e3_l2/dora_params_3/epoch3_dora_params.pth")

    def test_partially_torn_tree_rolls_back_one_epoch(self, tmp_path,
                                                      monkeypatch):
        """A legacy CSV-first tree whose LAST row has no checkpoint (crash
        between row N and checkpoint N) resumes from the newest intact
        epoch instead of discarding the whole in-place tree."""
        from vit_project_tpu.train import multi_fork as mf
        cond = tmp_path / "random_target_e3_l2"
        os.makedirs(cond / "dora_params_3")
        with open(cond / "training_res.csv", "w") as f:
            f.write("epoch,train_loss\n3,0.5\n4,0.45\n")   # rows 3 and 4
        with open(cond / "dora_params_3" / "epoch3_dora_params.pth",
                  "w") as f:
            f.write("x")   # ...but only epoch 3's checkpoint exists
        os.makedirs(cond / "random_states_3")
        (cond / "random_states_3" / "epoch3_random_states.pth").touch()

        calls = []
        monkeypatch.setattr(mf, "_Setup", self._stub(tmp_path, calls))
        monkeypatch.setattr(mf, "_run_group", _finish_group_stub)
        failed = mf.run_batched_lengths(
            {"output_base_directory": str(tmp_path)}, [3], 2, group_size=8)
        assert failed == []
        assert calls[0]["rfe"] == 3 and calls[0]["require"] is True
        assert calls[0]["dora_file"].endswith("epoch3_dora_params.pth")

    def test_required_load_raises_on_missing_checkpoint(self, tmp_path):
        """The real _Setup.load_state refuses a strict resume whose
        checkpoint file is gone, instead of silently fresh-initializing."""
        import types
        from vit_project_tpu.train import multi_fork as mf
        fake = types.SimpleNamespace(
            cfg=None, assets=types.SimpleNamespace(trainable=None),
            log=lambda msg: None, trainer=None)
        with pytest.raises(FileNotFoundError, match="torn artifact tree"):
            mf._Setup.load_state(fake, "run 5",
                                 str(tmp_path / "nope.pth"), None, 4,
                                 require=True)


class TestBatchedOrderDedup:
    """Duplicate run numbers share artifact paths — inside one vmapped group
    they would interleave duplicate CSV rows, so the batched driver dedups."""

    def test_duplicate_runs_collapse_to_one_fork(self, tmp_path, monkeypatch):
        import types
        from vit_project_tpu.train import multi_fork as mf
        seen_groups = []

        class StubSetup:
            def __init__(self, base_config, logger, mesh, group_size=1):
                self.cfg = types.SimpleNamespace(
                    perturb_length=1, perturb_type="random_target",
                    baseline_dora_directory=str(tmp_path),
                    baseline_random_state_path=str(tmp_path), epochs=30)
                self.log = lambda msg: None

            def load_state(self, label, dora_file, rs_dir, rfe, **kw):
                return (None, None, 0)

        def record_group(su, forks, inits, guard=None):
            seen_groups.append([f.run for f in forks])
            for f in forks:
                f.finished = True
            return {"lock_steps": 0, "live": 0, "rider": 0, "pad": 0}

        monkeypatch.setattr(mf, "_Setup", StubSetup)
        monkeypatch.setattr(mf, "_run_group", record_group)
        failed = mf.run_batched_sweep(
            {"output_base_directory": str(tmp_path)}, [5, 2, 5, 2],
            group_size=8)
        assert failed == []
        assert seen_groups == [[2, 5]]


class TestGroupFailureReporting:
    """A group-level crash must report ONLY forks whose artifact trees are
    incomplete: re-running a completed fork truncates its finished CSV."""

    def _stub_setup(self, tmp_path):
        import types

        class StubSetup:
            def __init__(self, base_config, logger, mesh, group_size=1):
                self.cfg = types.SimpleNamespace(
                    perturb_length=1, perturb_type="random_target",
                    baseline_dora_directory=str(tmp_path),
                    baseline_random_state_path=str(tmp_path), epochs=30)
                self.log = lambda msg: None

            def load_state(self, label, dora_file, rs_dir, rfe, **kw):
                return (None, None, 0)

        return StubSetup

    def test_sweep_reports_only_unfinished_runs(self, tmp_path, monkeypatch):
        from vit_project_tpu.train import multi_fork as mf

        def crash_after_run2(su, forks, inits, guard=None):
            # run 2 completed all its epochs... then the group died
            next(f for f in forks if f.run == 2).finished = True
            raise RuntimeError("boom")

        monkeypatch.setattr(mf, "_Setup", self._stub_setup(tmp_path))
        monkeypatch.setattr(mf, "_run_group", crash_after_run2)
        failed = mf.run_batched_sweep(
            {"output_base_directory": str(tmp_path)}, [5, 2], group_size=8)
        assert failed == [5]   # run 2 finished; only 5 is incomplete

    def test_lengths_reports_only_unfinished_conditions(self, tmp_path,
                                                        monkeypatch):
        from vit_project_tpu.train import multi_fork as mf

        def crash_after_e8(su, forks, inits, guard=None):
            next(f for f in forks if f.run == 8).finished = True
            raise RuntimeError("boom")

        monkeypatch.setattr(mf, "_Setup", self._stub_setup(tmp_path))
        monkeypatch.setattr(mf, "_run_group", crash_after_e8)
        failed = mf.run_batched_lengths(
            {"output_base_directory": str(tmp_path)}, [3, 8], 1,
            group_size=8)
        assert failed == ["random_target_e3_l1"]

    def test_sweep_init_failure_isolates_to_that_run(self, tmp_path,
                                                     monkeypatch):
        """load_state raising for one run must report ONLY that run; the
        healthy co-grouped runs still train (a 64-hour-scale grid must not
        burn an invocation on one corrupt fork state)."""
        from vit_project_tpu.train import multi_fork as mf

        Stub = self._stub_setup(tmp_path)

        class CrashOnSecondLoad(Stub):
            def load_state(self, label, dora_file, rs_dir, rfe, **kw):
                if label == "run 5":
                    raise RuntimeError("ckpt missing")
                return super().load_state(label, dora_file, rs_dir, rfe)

        trained = []
        monkeypatch.setattr(mf, "_Setup", CrashOnSecondLoad)

        def run_group(su, forks, inits, guard=None):
            trained.extend(f.run for f in forks)
            for f in forks:
                f.finished = True
            return {"lock_steps": 0, "live": 0, "rider": 0, "pad": 0}

        monkeypatch.setattr(mf, "_run_group", run_group)
        failed = mf.run_batched_sweep(
            {"output_base_directory": str(tmp_path)}, [5, 2], group_size=8)
        assert failed == [5]
        assert trained == [2]

    def test_lengths_init_failure_isolates_to_that_condition(self, tmp_path,
                                                             monkeypatch):
        """Same isolation for the lengths grid: a condition whose resume
        source is unreadable fails alone; the rest of its group trains."""
        from vit_project_tpu.train import multi_fork as mf

        Stub = self._stub_setup(tmp_path)

        class CrashOnSecondLoad(Stub):
            def load_state(self, label, dora_file, rs_dir, rfe, **kw):
                if label.startswith("random_target_e8"):
                    raise RuntimeError("ckpt missing")
                return super().load_state(label, dora_file, rs_dir, rfe)

        trained = []
        monkeypatch.setattr(mf, "_Setup", CrashOnSecondLoad)

        def run_group(su, forks, inits, guard=None):
            trained.extend(f.label for f in forks)
            for f in forks:
                f.finished = True
            return {"lock_steps": 0, "live": 0, "rider": 0, "pad": 0}

        monkeypatch.setattr(mf, "_run_group", run_group)
        failed = mf.run_batched_lengths(
            {"output_base_directory": str(tmp_path)}, [3, 8], 1,
            group_size=8)
        assert failed == ["random_target_e8_l1"]
        assert trained == ["random_target_e3_l1"]


@pytest.mark.slow
class TestBatchedForks:
    """train/multi_fork.py: R sweep forks under one vmapped program."""

    def test_matches_sequential_sweep(self, sweep_fixture):
        """A batched group of 2 forks writes the same artifact tree as the
        sequential driver, with per-epoch metrics equal to float tolerance
        (same math; batched-matmul reduction order may differ)."""
        work = sweep_fixture["work"]
        seq_base = str(work / "sweep_seq_oracle")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, seq_base, ["--training_order", "2,3"]))
        assert failed == []

        out_base = str(work / "sweep_batched")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, out_base,
            ["--training_order", "2,3", "--batched_forks", "2"]))
        assert failed == []
        _check_run_layout(out_base, (2, 3))

        for run in (2, 3):
            seq = _read_rows(os.path.join(
                seq_base, f"training_run{run}", f"training_res_run{run}.csv"))
            bat = _read_rows(os.path.join(
                out_base, f"training_run{run}", f"training_res_run{run}.csv"))
            assert [r[0] for r in bat] == [r[0] for r in seq]     # epochs
            assert [r[5:] for r in bat] == [r[5:] for r in seq]   # flags
            for rs, rb in zip(seq[1:], bat[1:]):
                # losses agree to float noise (same math, different batched-
                # matmul reduction order)
                np.testing.assert_allclose(
                    [float(x) for x in rb[1:3]],
                    [float(x) for x in rs[1:3]], rtol=1e-4)
                # Spearman rho is a RANK statistic: at random init the RDM is
                # dense with near-ties, so 1e-7 embedding noise flips adjacent
                # ranks and quantizes rho by ~1e-3 steps — compare coarsely
                assert abs(float(rb[3]) - float(rs[3])) < 0.02, (rb, rs)
                assert 0.0 <= float(rb[4]) <= 1.0
            # per-epoch fork checkpoints exist in the reference layout
            run_dir = os.path.join(out_base, f"training_run{run}")
            ep1 = int(bat[1][0])
            assert os.path.exists(os.path.join(
                run_dir, f"dora_params_run{run}",
                f"epoch{ep1}_dora_params.pth"))
            assert os.path.exists(os.path.join(
                run_dir, f"random_states_run{run}",
                f"epoch{ep1}_random_states.pth"))

    def test_sharded_fork_axis_with_padding(self, sweep_fixture):
        """--fork_devices shards the fork axis over the (virtual 8-device)
        mesh. 3 forks over 2 devices exercises the ballast padding (R=3 ->
        4), and results must still match the sequential driver."""
        work = sweep_fixture["work"]
        seq_base = str(work / "sweep_seq_oracle3")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, seq_base, ["--training_order", "1,2,3"]))
        assert failed == []

        out_base = str(work / "sweep_sharded")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, out_base,
            ["--training_order", "1,2,3", "--batched_forks", "3",
             "--fork_devices", "2"]))
        assert failed == []
        _check_run_layout(out_base, (2, 3))
        for run in (1, 2, 3):
            seq = _read_rows(os.path.join(
                seq_base, f"training_run{run}", f"training_res_run{run}.csv"))
            bat = _read_rows(os.path.join(
                out_base, f"training_run{run}", f"training_res_run{run}.csv"))
            assert [r[0] for r in bat] == [r[0] for r in seq]
            assert [r[5:] for r in bat] == [r[5:] for r in seq]
            for rs, rb in zip(seq[1:], bat[1:]):
                np.testing.assert_allclose(
                    [float(x) for x in rb[1:3]],
                    [float(x) for x in rs[1:3]], rtol=1e-4)

    def test_host_prefetch_is_value_neutral(self, sweep_fixture):
        """--host_prefetch enqueues async d2h copies of the checkpoint trees
        (core/hostcopy.py) — a scheduling hint only: the batched run's CSV
        rows and checkpoints must be byte-identical with and without it."""
        work = sweep_fixture["work"]
        plain = str(work / "sweep_noprefetch")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, plain,
            ["--training_order", "2,3", "--batched_forks", "2"]))
        assert failed == []

        pref = str(work / "sweep_prefetch")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, pref,
            ["--training_order", "2,3", "--batched_forks", "2",
             "--host_prefetch"]))
        assert failed == []

        for run in (2, 3):
            rel = os.path.join(f"training_run{run}",
                               f"training_res_run{run}.csv")
            assert _read_rows(os.path.join(pref, rel)) == \
                _read_rows(os.path.join(plain, rel))
            ep1 = int(_read_rows(os.path.join(plain, rel))[1][0])
            a = ser.load_flat(os.path.join(
                plain, f"training_run{run}", f"dora_params_run{run}",
                f"epoch{ep1}_dora_params.pth"))
            b = ser.load_flat(os.path.join(
                pref, f"training_run{run}", f"dora_params_run{run}",
                f"epoch{ep1}_dora_params.pth"))
            ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            assert len(ja) == len(jb) and all(
                np.array_equal(x, y) for x, y in zip(ja, jb))


@pytest.mark.slow
class TestBatchedFrozenCache:
    """--frozen_cache under --batched_forks: the batched group trains from
    shared frozen-prefix caches (one build for every fork) and must match
    the sequential full-tower driver to float tolerance."""

    def test_matches_sequential_sweep(self, sweep_fixture):
        work = sweep_fixture["work"]
        seq_base = str(work / "sweep_seq_oracle_fc")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, seq_base, ["--training_order", "2,3"]))
        assert failed == []

        out_base = str(work / "sweep_batched_fc")
        failed = sweep_cli.main(_sweep_argv(
            sweep_fixture, out_base,
            ["--training_order", "2,3", "--batched_forks", "2",
             "--frozen_cache"]))
        assert failed == []
        _check_run_layout(out_base, (2, 3))
        for run in (2, 3):
            seq = _read_rows(os.path.join(
                seq_base, f"training_run{run}", f"training_res_run{run}.csv"))
            bat = _read_rows(os.path.join(
                out_base, f"training_run{run}", f"training_res_run{run}.csv"))
            assert [r[0] for r in bat] == [r[0] for r in seq]
            assert [r[5:] for r in bat] == [r[5:] for r in seq]
            for rs, rb in zip(seq[1:], bat[1:]):
                np.testing.assert_allclose(
                    [float(x) for x in rb[1:3]],
                    [float(x) for x in rs[1:3]], rtol=5e-4, atol=5e-4)
                assert abs(float(rb[3]) - float(rs[3])) < 0.02, (rb, rs)

    def test_image_kind_falls_back_to_full_tower(self, sweep_fixture):
        """frozen_cache + an image-perturbing sweep type degrades (loudly)
        to the full-tower batched programs, and still completes."""
        work = sweep_fixture["work"]
        out_base = str(work / "sweep_batched_fc_img")
        argv = _sweep_argv(
            sweep_fixture, out_base,
            ["--training_order", "2", "--batched_forks", "1",
             "--frozen_cache"])
        argv[argv.index("--perturb_type") + 1] = "uniform_images"
        failed = sweep_cli.main(argv)
        assert failed == []
        p = os.path.join(out_base, "training_run2", "training_res_run2.csv")
        rows = _read_rows(p)
        assert rows[1][0] == "2"
        assert rows[1][7] == "True"  # used_uniform_images


def test_prefetch_to_host_tolerates_mixed_leaves():
    """core/hostcopy.prefetch_to_host: numpy / scalar / None leaves are
    skipped, jax leaves are hinted, values unchanged."""
    from vit_project_tpu.core import hostcopy
    dev = jnp.arange(6.0).reshape(2, 3)
    tree = {"a": dev, "b": np.ones(3), "c": 1.5, "d": None}
    hostcopy.prefetch_to_host(tree, dev * 2)
    np.testing.assert_array_equal(np.asarray(dev), np.arange(6.0).reshape(2, 3))


def _lengths_argv(fx, out_base, extra):
    work, base = fx["work"], fx["base"]
    return [
        "--csv_file", str(work / "train.csv"),
        "--img_dir", str(fx["img_dir"]),
        "--inference_csv_file", str(work / "val.csv"),
        "--RDM48_triplet_dir", str(work / "rdm.mat"),
        "--backbone", "test-tiny", "--epochs", "3", "--batch_size", "16",
        "--random_seed", "1", "--vision_layers", "1",
        "--transformer_layers", "1", "--rank", "4",
        "--perturb_type", "random_target", "--perturb_seed", "7",
        "--baseline_dora_directory", str(base / "dora_params"),
        "--baseline_random_state_path", str(base / "random_states"),
        "--baseline_split_indices_path",
        str(base / "random_states" / "dataset_split_indices.pth"),
        "--output_base_directory", out_base,
        "--compute_dtype", "float32", *extra]


@pytest.mark.slow
class TestBatchedLengths:
    """train/multi_fork.run_batched_lengths: the (onset x length) grid in
    vmapped groups, incl. the cross-run resume ladder."""

    def test_matches_sequential_and_cross_resumes(self, sweep_fixture):
        from vit_project_tpu.cli import lengths as lengths_cli
        work = sweep_fixture["work"]

        seq_base = str(work / "len_seq_oracle")
        for L in (1, 2):  # ascending so l2 cross-resumes from l1
            for E in (2, 3):
                lengths_cli.main(_lengths_argv(
                    sweep_fixture, seq_base,
                    ["--perturb_epoch", str(E), "--perturb_length", str(L),
                     "--output_dir", f"random_target_e{E}_l{L}"]))

        bat_base = str(work / "len_batched")
        for L in (1, 2):
            failed = lengths_cli.main(_lengths_argv(
                sweep_fixture, bat_base,
                ["--onsets", "2,3", "--perturb_length", str(L),
                 "--batched_forks", "2"]))
            assert failed == []

        for L in (1, 2):
            for E in (2, 3):
                name = f"random_target_e{E}_l{L}"
                seq = _read_rows(os.path.join(seq_base, name,
                                              "training_res.csv"))
                bat = _read_rows(os.path.join(bat_base, name,
                                              "training_res.csv"))
                assert [r[0] for r in bat] == [r[0] for r in seq], name
                assert [r[5:] for r in bat] == [r[5:] for r in seq], name
                for rs, rb in zip(seq[1:], bat[1:]):
                    np.testing.assert_allclose(
                        [float(x) for x in rb[1:3]],
                        [float(x) for x in rs[1:3]], rtol=1e-4,
                        err_msg=name)
        # the l2 run at onset 2 really cross-resumed: its CSV starts with
        # the pre-populated epoch-2 row and appends epoch 3
        rows = _read_rows(os.path.join(bat_base, "random_target_e2_l2",
                                       "training_res.csv"))
        assert [r[0] for r in rows[1:]] == ["2", "3"]
        # per-epoch checkpoints exist in the reference lengths layout
        assert os.path.exists(os.path.join(
            bat_base, "random_target_e2_l1", "dora_params_2",
            "epoch2_dora_params.pth"))


class TestWorkerArgvBooleans:
    def test_false_boolean_optional_propagates(self):
        """A default-True BooleanOptionalAction turned OFF must reach the
        workers as its --no- form; dropping it silently re-enables the
        feature in every dispatched worker."""
        parser = sweep_cli.build_parser()
        args = parser.parse_args(
            ["--csv_file", "c", "--img_dir", "i", "--inference_csv_file", "v",
             "--RDM48_triplet_dir", "r", "--baseline_dora_directory", "d",
             "--baseline_random_state_path", "s",
             "--baseline_split_indices_path", "x",
             "--output_base_directory", "o", "--no-host_prefetch"])
        assert args.host_prefetch is False
        argv = sweep_cli._worker_argv(args)
        assert "--no-host_prefetch" in argv
        reparsed = parser.parse_args(argv + ["--training_order", "1"])
        assert reparsed.host_prefetch is False

    def test_true_default_stays_on(self):
        parser = sweep_cli.build_parser()
        args = parser.parse_args(
            ["--csv_file", "c", "--img_dir", "i", "--inference_csv_file", "v",
             "--RDM48_triplet_dir", "r", "--baseline_dora_directory", "d",
             "--baseline_random_state_path", "s",
             "--baseline_split_indices_path", "x",
             "--output_base_directory", "o"])
        argv = sweep_cli._worker_argv(args)
        reparsed = parser.parse_args(argv + ["--training_order", "1"])
        assert reparsed.host_prefetch is True


class TestBatchedEvalCap:
    def test_whole_set_cap_divides_by_vmap_factor(self):
        """The 132k-token whole-set widening budget is per program dispatch:
        the batched multi-fork eval vmaps the forward over its per-chip fork
        count, so the cap must divide by it or a 16-fork group materializes
        16x the calibrated activation memory in one dispatch."""
        import types

        stub = types.SimpleNamespace(
            cfg=types.SimpleNamespace(visual=types.SimpleNamespace(
                seq_len=257)),
            mesh=None,
            _prep_idx_mat=None,
        )
        stub._prep_idx_mat = types.MethodType(
            clip_loop.ClipHBATrainer._prep_idx_mat, stub)
        mats = types.MethodType(clip_loop.ClipHBATrainer.eval_idx_mats, stub)

        n = 362  # THINGS default test split; 362*257 = 93k <= 132k
        idx, _ = mats(n, 64)
        assert idx.shape == (1, n)  # solo: widened to one whole-set batch
        idx, _ = mats(n, 64, vmap_factor=16)
        assert idx.shape[1] == 64  # batched: cap exceeded, batch bound holds
        # tiny sets still widen even under a large factor
        idx, _ = mats(8, 4, vmap_factor=16)
        assert idx.shape == (1, 8)

    def test_setup_vmap_factor_accounts_for_fork_mesh(self):
        """per_chip_forks divides the group over the fork-axis mesh:
        per-chip concurrency is ceil(group/devices)."""
        from vit_project_tpu.train import multi_fork as mf

        class Mesh:
            devices = np.empty(4)

        assert mf.per_chip_forks(8, None) == 8
        assert mf.per_chip_forks(8, Mesh()) == 2
        assert mf.per_chip_forks(5, Mesh()) == 2
        assert mf.per_chip_forks(1, None) == 1


class TestBatchedPreemption:
    """A preemption notice between vmapped groups stops the batched drivers
    cleanly: finished groups' trees stand, the rest stay undispatched and
    are recorded on the guard for the CLI's exit-143 + re-invoke story."""

    def _stub_setup(self, tmp_path):
        import types

        class StubSetup:
            def __init__(self, base_config, logger, mesh, group_size=1):
                self.cfg = types.SimpleNamespace(
                    perturb_length=1, perturb_type="random_target",
                    baseline_dora_directory=str(tmp_path),
                    baseline_random_state_path=str(tmp_path), epochs=30)
                self.log = lambda msg: None

            def load_state(self, label, dora_file, rs_dir, rfe, **kw):
                return (None, None, 0)

        return StubSetup

    class _TripAfter:
        def __init__(self, n):
            self.n = n
            self.calls = 0

        def should_stop(self):
            self.calls += 1
            return self.calls >= self.n

    def test_sweep_stops_between_groups(self, tmp_path, monkeypatch):
        from vit_project_tpu.train import multi_fork as mf
        trained = []

        def record(su, forks, inits, guard=None):
            trained.extend(f.run for f in forks)
            for f in forks:
                f.finished = True
            return {"lock_steps": 1, "live": len(forks), "rider": 0,
                    "pad": 0}

        monkeypatch.setattr(mf, "_Setup", self._stub_setup(tmp_path))
        monkeypatch.setattr(mf, "_run_group", record)
        g = self._TripAfter(1)  # polled after each group -> stop after g1
        failed = mf.run_batched_sweep(
            {"output_base_directory": str(tmp_path)}, [1, 2, 3, 4],
            group_size=2, preempt_guard=g)
        assert failed == []
        assert trained == [1, 2]          # group 1 ran to completion
        assert g.undispatched == [3, 4]   # group 2 never dispatched

    def test_sweep_quiet_guard_runs_everything(self, tmp_path, monkeypatch):
        from vit_project_tpu.train import multi_fork as mf
        trained = []

        def record(su, forks, inits, guard=None):
            trained.extend(f.run for f in forks)
            for f in forks:
                f.finished = True
            return {"lock_steps": 1, "live": len(forks), "rider": 0,
                    "pad": 0}

        monkeypatch.setattr(mf, "_Setup", self._stub_setup(tmp_path))
        monkeypatch.setattr(mf, "_run_group", record)
        g = self._TripAfter(10)  # never trips within 2 polls
        failed = mf.run_batched_sweep(
            {"output_base_directory": str(tmp_path)}, [1, 2, 3, 4],
            group_size=2, preempt_guard=g)
        assert failed == [] and trained == [1, 2, 3, 4]
        assert not getattr(g, "undispatched", None)

    def test_mid_group_stop_records_unfinished_and_later_groups(
            self, tmp_path, monkeypatch):
        """A stop flag raised DURING a group stops at the next lock-step
        boundary: the group's unfinished members plus every undispatched
        group land on guard.undispatched; finished members are reported
        done, not failed."""
        from vit_project_tpu.train import multi_fork as mf

        def record(su, forks, inits, guard=None):
            # simulate: fork A finished at the boundary, fork B was not
            forks[0].finished = True
            forks[1].finished = False
            return {"lock_steps": 1, "live": 2, "rider": 0, "pad": 0,
                    "interrupted": True}

        monkeypatch.setattr(mf, "_Setup", self._stub_setup(tmp_path))
        monkeypatch.setattr(mf, "_run_group", record)
        done = []
        g = self._TripAfter(10 ** 6)
        failed = mf.run_batched_sweep(
            {"output_base_directory": str(tmp_path)}, [1, 2, 3, 4],
            group_size=2, preempt_guard=g, done_report=done.extend)
        assert failed == []                 # preemption is not failure
        assert g.undispatched == [2, 3, 4]  # unfinished + later group
        assert done == [1]                  # the finished member reported

    def test_mid_group_preemption_end_to_end(self, sweep_fixture):
        """REAL mid-group preemption: the guard trips during the first
        group's lock-step loop; the run that already finished stands, the
        interrupted run holds exactly its completed epochs, and a re-invoke
        completes it to the uninterrupted oracle's trajectory."""
        import shutil
        from vit_project_tpu.train import multi_fork as mf
        fx = sweep_fixture
        work, base = fx["work"], fx["base"]

        def config(out_base):
            return {
                "csv_file": str(work / "train.csv"),
                "img_dir": str(fx["img_dir"]),
                "inference_csv_file": str(work / "val.csv"),
                "RDM48_triplet_dir": str(work / "rdm.mat"),
                "backbone": "test-tiny", "epochs": 3, "batch_size": 16,
                "train_portion": 0.8, "lr": 3e-4, "logger": None,
                "early_stopping_patience": 20, "random_seed": 1,
                "vision_layers": 1, "transformer_layers": 1, "rank": 4,
                "criterion": "mse", "cuda": 0, "compute_dtype": "float32",
                "perturb_type": "random_target", "perturb_length": 1,
                "perturb_seed": 7,
                "baseline_dora_directory": str(base / "dora_params"),
                "baseline_random_state_path": str(base / "random_states"),
                "baseline_split_indices_path":
                    str(base / "random_states" / "dataset_split_indices.pth"),
                "output_base_directory": out_base,
            }

        oracle = str(work / "preempt_oracle")
        failed = mf.run_batched_sweep(config(oracle), [2, 3], group_size=2)
        assert failed == []

        out = str(work / "preempt_mid")
        g = self._TripAfter(1)  # first lock-step-boundary poll trips
        failed = mf.run_batched_sweep(config(out), [2, 3], group_size=2,
                                      preempt_guard=g)
        assert failed == []
        # run 3 forks at epoch 2 (0-indexed) and caps at 3: it finished in
        # lock-step 0; run 2 still had epoch 3 to train -> interrupted
        assert g.undispatched == [2]
        rows2 = _read_rows(os.path.join(
            out, "training_run2", "training_res_run2.csv"))
        assert [r[0] for r in rows2[1:]] == ["2"]  # one completed lock-step
        rows3 = _read_rows(os.path.join(
            out, "training_run3", "training_res_run3.csv"))
        assert [r[0] for r in rows3[1:]] == ["3"]  # finished before the stop

        failed = mf.run_batched_sweep(config(out), [2], group_size=2)
        assert failed == []
        for run in (2, 3):
            got = _read_rows(os.path.join(
                out, f"training_run{run}", f"training_res_run{run}.csv"))
            want = _read_rows(os.path.join(
                oracle, f"training_run{run}", f"training_res_run{run}.csv"))
            assert [r[0] for r in got] == [r[0] for r in want]
            assert [r[5:] for r in got] == [r[5:] for r in want]
            for rg, rw in zip(got[1:], want[1:]):
                np.testing.assert_allclose(
                    [float(x) for x in rg[1:3]],
                    [float(x) for x in rw[1:3]], rtol=1e-4)
