"""Analysis-layer tests on synthetic CSV artifacts."""
import os

import numpy as np
import pandas as pd
import pytest

from vit_project_tpu.analysis import figs
from vit_project_tpu.core import csvio


def write_clip_csv(path, losses, rsas, flags_epoch=None):
    csvio.init_clip_csv(str(path))
    for i, (lo, r) in enumerate(zip(losses, rsas), start=1):
        fl = flags_epoch == i
        csvio.append_clip_row(str(path), i, lo + 1, lo, r, 0.001,
                              fl, False, False, False)


class TestTrajectories:
    def test_clip_trim_at_min_loss(self, tmp_path):
        p = tmp_path / "base.csv"
        write_clip_csv(p, [5.0, 3.0, 2.0, 2.5, 4.0], [0.1, 0.3, 0.5, 0.4, 0.2])
        df = figs.clip_trajectory(str(p))
        assert list(df["epoch"]) == [1, 2, 3]  # trimmed at min loss epoch 3


class TestDeltas:
    def test_sweep_deltas(self, tmp_path):
        base = tmp_path / "base.csv"
        write_clip_csv(base, [5.0, 3.0, 2.0], [0.1, 0.3, 0.5])
        sweep = tmp_path / "sweep"
        for run in (2, 3):
            d = sweep / f"training_run{run}"
            os.makedirs(d)
            write_clip_csv(d / f"training_res_run{run}.csv",
                           [5.0, 3.0 + run, 2.0 + run],
                           [0.1, 0.3 - 0.1 * run, 0.5], flags_epoch=run)
        df = figs.sweep_deltas(str(base), str(sweep))
        assert sorted(df["epoch"]) == [2, 3]
        r2 = df[df["epoch"] == 2].iloc[0]
        np.testing.assert_allclose(r2["delta_loss"], 2.0)
        np.testing.assert_allclose(r2["delta_rsa"], -0.2)


class TestRecovery:
    def test_recovery_and_nr(self, tmp_path):
        base = tmp_path / "base.csv"
        write_clip_csv(base, [5, 4, 3, 2, 1.5, 1.2, 1.0, 0.9],
                       [0.1] * 8)
        exp = tmp_path / "lengths"
        # recovers at epoch 6 (loss back within 1%)
        d = exp / "random_target_e3_l2"
        os.makedirs(d)
        write_clip_csv(d / "training_res.csv",
                       [5, 4, 9, 9, 3.0, 1.21, 1.0, 0.9], [0.1] * 8)
        # never recovers
        d2 = exp / "random_target_e5_l1"
        os.makedirs(d2)
        write_clip_csv(d2 / "training_res.csv",
                       [5, 4, 3, 2, 9, 9, 9, 9], [0.1] * 8)
        tab = figs.recovery_table(str(base), str(exp))
        assert len(tab) == 2
        r1 = tab[(tab.onset == 3) & (tab.length == 2)].iloc[0]
        assert r1["recovery_epoch"] == 6 and r1["recovery_time"] == 2
        r2 = tab[(tab.onset == 5)].iloc[0]
        assert r2["recovery_epoch"] == -1  # NR

    def test_recovery_ignores_window(self, tmp_path):
        base = tmp_path / "b.csv"
        write_clip_csv(base, [5, 4, 3], [0.1] * 3)
        d = tmp_path / "random_target_e1_l3"
        os.makedirs(d)
        # identical to baseline but entirely inside the window -> NR
        write_clip_csv(d / "training_res.csv", [5, 4, 3], [0.1] * 3)
        rec = figs.recovery_epoch(str(base), str(d / "training_res.csv"), 1, 3)
        assert rec is None


class TestPlots:
    def test_fig1_and_fig3_render(self, tmp_path):
        base = tmp_path / "base.csv"
        write_clip_csv(base, [5.0, 3.0, 2.0], [0.1, 0.3, 0.5])
        sweep = tmp_path / "sweep"
        d = sweep / "training_run2"
        os.makedirs(d)
        write_clip_csv(d / "training_res_run2.csv", [5.0, 6.0, 2.0],
                       [0.1, 0.2, 0.5], flags_epoch=2)
        out1 = figs.plot_fig1(str(base), str(tmp_path / "f1.png"))
        out3 = figs.plot_fig3(str(base), str(sweep),
                              str(tmp_path / "f3.png"))
        assert os.path.getsize(out1) > 1000
        assert os.path.getsize(out3) > 1000


REF = "/root/reference/Data/clip_results"


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference artifacts not present")
class TestAgainstRealReferenceArtifacts:
    """Parity proof: the analysis layer must parse the reference's ACTUAL
    shipped result trees and reproduce its documented numbers."""

    def test_fig1_baseline_headline_numbers(self):
        df = figs.load_clip_csv(os.path.join(
            REF, "baseline_clip_results_seed1.csv"))
        assert len(df) == 118
        i = df["test_loss"].idxmin()
        assert int(df.loc[i, "epoch"]) == 98          # BASELINE.md min loss
        assert abs(df.loc[i, "test_loss"] - 29.1013) < 1e-3
        j = df["behavioral_rsa_rho"].idxmax()
        assert int(df.loc[j, "epoch"]) == 53          # BASELINE.md peak RSA
        assert abs(df.loc[j, "behavioral_rsa_rho"] - 0.77903) < 1e-4

    def test_fig3_sweep_tree_parses_fully(self):
        deltas = figs.sweep_deltas(
            os.path.join(REF, "baseline_clip_results_seed1.csv"),
            os.path.join(REF, "single_sweep_experiments"))
        assert len(deltas) == 98                      # all 98 runs

    def test_fig4_covers_both_artifact_generations(self):
        """The shipped tree mixes training_res.csv and metrics.csv
        condition dirs; all 136 must appear, including the never-recovered
        late-onset rows (README's NR findings)."""
        t = figs.recovery_table(
            os.path.join(REF, "baseline_clip_results_seed1.csv"),
            os.path.join(REF,
                         "perturb_length_experiments_baselineseed1_"
                         "perturbseed0"),
            "random_target")
        assert len(t) == 136
        nr = t[t["recovery_epoch"] == -1]
        assert len(nr) == 12
        assert set(nr["onset"]) == {58, 60, 70, 80, 90, 94}

    def test_fig2_reads_the_flat_per_type_dirs(self):
        """The per-type sweep dirs (image_noise/ etc.) ship FLAT
        training_res_run{N}.csv files (no training_run{N}/ nesting); the
        fig2 comparison epochs must resolve in all four."""
        base = os.path.join(REF, "baseline_clip_results_seed1.csv")
        dirs = {t: os.path.join(REF, t) for t in
                ("image_noise", "label_shuffle", "target_noise",
                 "uniform_target")}
        out = figs.perturbation_type_deltas(
            base, dirs, epochs=[5, 15, 25, 35, 45, 70, 98])
        assert len(out) == 28
        assert set(out.groupby("perturbation_type").size()) == {7}


def _mini_clip_tree(root, rsa_scale=1.0):
    """A miniature clip_results tree in the reference layout: baseline,
    a nested 3-run sweep, flat per-type dirs at epochs {2,3}, and a
    2-condition lengths grid."""
    from vit_project_tpu.analysis import parity
    os.makedirs(root, exist_ok=True)
    losses = [5.0, 4.0, 3.0, 2.5, 2.0, 1.8]
    rsas = [r * rsa_scale for r in (0.1, 0.2, 0.3, 0.35, 0.4, 0.45)]
    write_clip_csv(os.path.join(root, parity.BASELINE_NAME), losses, rsas)
    sweep = os.path.join(root, parity.SWEEP_DIRNAME)
    for run in (2, 3, 4):
        d = os.path.join(sweep, f"training_run{run}")
        os.makedirs(d)
        bump = [lo + (1.0 if i + 1 == run else 0.0)
                for i, lo in enumerate(losses)]
        write_clip_csv(os.path.join(d, f"training_res_run{run}.csv"),
                       bump, rsas, flags_epoch=run)
    for t in parity.FIG2_TYPES:
        d = os.path.join(root, t)
        os.makedirs(d)
        for run in (2, 3):
            bump = [lo + (0.5 if i + 1 == run else 0.0)
                    for i, lo in enumerate(losses)]
            write_clip_csv(os.path.join(d, f"training_res_run{run}.csv"),
                           bump, rsas, flags_epoch=run)
    ldir = os.path.join(root, parity.LENGTHS_DIRNAME)
    for (e, L) in ((2, 1), (2, 2)):
        d = os.path.join(ldir, f"random_target_e{e}_l{L}")
        os.makedirs(d)
        bump = [lo + (2.0 if e <= i + 1 <= e + L - 1 else 0.0)
                for i, lo in enumerate(losses)]
        write_clip_csv(os.path.join(d, "training_res.csv"), bump, rsas)
    return root


class TestParityReport:
    def test_two_tree_report(self, tmp_path, monkeypatch):
        """Both halves present: overlays, side-by-sides, recovery merge and
        the stats block all materialize; coverage checks run per tree."""
        from vit_project_tpu.analysis import parity
        monkeypatch.setattr(parity, "FIG2_EPOCHS", [2, 3])
        ours = _mini_clip_tree(str(tmp_path / "ours"), rsa_scale=1.0)
        ref = _mini_clip_tree(str(tmp_path / "ref"), rsa_scale=0.9)
        out = str(tmp_path / "out")
        rep = parity.build_report(ours, ref, out)
        for f in ("parity_report.json", "PARITY_REPORT.md",
                  "parity_fig1_trajectory.png",
                  "parity_fig2_type_deltas.png",
                  "parity_fig3_sweep_deltas.png", "parity_recovery.csv",
                  "parity_type_deltas.csv"):
            assert os.path.exists(os.path.join(out, f)), f
        tr = rep["stats"]["trajectory"]
        assert abs(tr["ours_peak_rsa"] - 0.45) < 1e-9
        assert abs(tr["reference_peak_rsa"] - 0.405) < 1e-9
        # identical epochs, linearly scaled RSA -> perfect correlation
        assert abs(tr["rsa_trajectory_corr"] - 1.0) < 1e-9
        rec = rep["stats"]["recovery"]
        assert rec["conditions_common"] == 2
        assert rec["nr_classification_agreement"] == 2
        assert rec["mean_abs_recovery_time_diff"] == 0.0
        # mini trees are deliberately NOT at reference cardinality
        assert rep["n_failed_checks"] > 0

    def test_single_tree_halves(self, tmp_path, monkeypatch):
        from vit_project_tpu.analysis import parity
        monkeypatch.setattr(parity, "FIG2_EPOCHS", [2, 3])
        ours = _mini_clip_tree(str(tmp_path / "ours"))
        rep = parity.build_report(ours, None, str(tmp_path / "o1"))
        assert "ours_peak_rsa" in rep["stats"]["trajectory"]
        rep2 = parity.build_report(None, ours, str(tmp_path / "o2"))
        assert "reference_peak_rsa" in rep2["stats"]["trajectory"]


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference artifacts not present")
class TestParityAgainstRealReference:
    def test_reference_half_passes_all_checks(self, tmp_path):
        """The reference-only half must parse the ACTUAL shipped Data/ tree
        with zero failed coverage checks and reproduce its headline stats."""
        from vit_project_tpu.analysis import parity
        rep = parity.main(["--reference", os.path.dirname(REF),
                           "--out", str(tmp_path / "rep")])
        assert rep["n_failed_checks"] == 0
        tr = rep["stats"]["trajectory"]
        assert abs(tr["reference_peak_rsa"] - 0.77903) < 1e-4
        assert rep["stats"]["recovery"]["conditions_reference"] == 136
        assert rep["stats"]["sweep"]["reference_sweep_runs"] == 98


class TestManifest:
    def test_run_manifest_and_tree(self, tmp_path):
        from vit_project_tpu.analysis import manifest
        d = tmp_path / "training_run7"
        os.makedirs(d / "dora_params_run7")
        write_clip_csv(d / "training_res_run7.csv",
                       [3.0, 2.0, 1.5], [0.1, 0.2, 0.3])
        (d / "dora_params_run7" / "epoch1_dora_params.pth").write_bytes(
            b"\x00" * 128)
        m = manifest.run_manifest(str(d))
        csv_stats = m["csvs"]["training_res_run7.csv"]
        assert csv_stats["rows"] == 3
        assert csv_stats["first_epoch"] == 1
        assert csv_stats["last_epoch"] == 3
        assert abs(csv_stats["last_test_loss"] - 1.5) < 1e-9
        assert m["n_files"] == 2
        assert all("blake2b" in rec for rec in m["files"].values())
        doc = manifest.tree_manifest({"sweep": str(tmp_path)},
                                     str(tmp_path / "manifest.json"))
        assert doc["trees"]["sweep"]["n_runs"] == 1
        assert os.path.exists(tmp_path / "manifest.json")
