"""Serving CLI: ViT logits CSV / features npy over an image tree, CLIP-HBA
scores from a torch checkpoint + baked DoRA, and the tokenizer guardrail."""
import csv
import os

import jax
import numpy as np
import pytest

from vit_project_tpu.ckpt import vit_ckpt
from vit_project_tpu.cli import serve as cli_serve
from vit_project_tpu.models import vit as vvit

TINY = vvit.VIT_CONFIGS["test-tiny"]


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("imgs")
    rs = np.random.RandomState(0)
    for sub in ("a", "b"):
        os.makedirs(root / sub)
    for i, sub in enumerate(["a", "a", "b", "b", "b"]):
        arr = rs.randint(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / sub / f"img{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def vit_checkpoint(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt"))
    params = vvit.init_vit_params(jax.random.PRNGKey(0), TINY)
    vit_ckpt.save_checkpoint(0, params, {"momentum": None}, {}, 1.0, 1.0,
                             10.0, out)
    return os.path.join(out, "checkpoint_epoch_000.pth")


def _run(argv):
    return cli_serve.main(argv)


class TestViTServeCLI:
    def test_logits_csv(self, image_dir, vit_checkpoint, tmp_path):
        out = str(tmp_path / "preds.csv")
        rc = _run(["--images", image_dir, "--out", out,
                   "--model", "test-tiny", "--checkpoint", vit_checkpoint,
                   "--buckets", "4,8", "--param_dtype", "f32",
                   "--topk", "3"])
        assert rc == 0
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 5
        # deterministic sorted order, class-tree relpaths
        assert rows[0]["filename"] == os.path.join("a", "img0.png")
        for r in rows:
            assert 0 <= int(r["top1_index"]) < TINY.num_classes
            assert (float(r["top1_score"]) >= float(r["top2_score"])
                    >= float(r["top3_score"]))

    def test_deterministic_across_runs(self, image_dir, vit_checkpoint,
                                       tmp_path):
        outs = []
        for name in ("p1.csv", "p2.csv"):
            out = str(tmp_path / name)
            _run(["--images", image_dir, "--out", out, "--model", "test-tiny",
                  "--checkpoint", vit_checkpoint, "--buckets", "8",
                  "--param_dtype", "f32"])
            outs.append(open(out).read())
        assert outs[0] == outs[1]

    def test_features_npy(self, image_dir, vit_checkpoint, tmp_path):
        out = str(tmp_path / "emb.npy")
        rc = _run(["--images", image_dir, "--out", out, "--model",
                   "test-tiny", "--checkpoint", vit_checkpoint,
                   "--mode", "features", "--buckets", "8",
                   "--param_dtype", "f32"])
        assert rc == 0
        emb = np.load(out)
        assert emb.shape == (5, TINY.width)
        names = open(str(tmp_path / "emb.filenames.txt")).read().split()
        assert len(names) == 5

    def test_missing_checkpoint_refused(self, image_dir, tmp_path):
        with pytest.raises(SystemExit, match="checkpoint"):
            _run(["--images", image_dir, "--out", str(tmp_path / "x.csv"),
                  "--model", "test-tiny", "--buckets", "8"])

    def test_empty_dir_refused(self, vit_checkpoint, tmp_path):
        empty = tmp_path / "empty"
        os.makedirs(empty)
        with pytest.raises(SystemExit, match="no images"):
            _run(["--images", str(empty), "--out", str(tmp_path / "x.csv"),
                  "--model", "test-tiny", "--checkpoint", vit_checkpoint])


class TestClipServeCLI:
    def test_scores_and_guardrail(self, image_dir, tmp_path, monkeypatch):
        import torch
        from test_clip_conversion import TorchCLIP
        monkeypatch.delenv("CLIP_BPE_PATH", raising=False)
        torch.manual_seed(0)
        weights = tmp_path / "tiny_clip.pt"
        torch.save(TorchCLIP().eval().state_dict(), weights)

        base = ["--images", image_dir, "--clip_weights", str(weights),
                "--buckets", "8", "--param_dtype", "f32", "--topk", "2"]
        with pytest.raises(SystemExit, match="BPE vocab"):
            _run(base + ["--out", str(tmp_path / "refused.csv")])

        out = str(tmp_path / "scores.csv")
        rc = _run(base + ["--out", out, "--allow_hash_tokenizer"])
        assert rc == 0
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 5
        assert all(np.isfinite(float(r["top1_score"])) for r in rows)


    def test_rn_pos_embedding_flag(self, image_dir, tmp_path):
        """--pos_embedding off/on actually toggles the attnpool embedding,
        and auto follows the reference CLIPHBA convention, which is
        RN50-ONLY (pos_embedding=False iff backbone == 'RN50',
        cvpr_..._baseline.py:757-758) — a NON-RN50-geometry RN tower like
        this tiny fixture keeps the embedding on under auto."""
        import torch
        from test_resnet_clip import TorchRNCLIP
        torch.manual_seed(3)
        weights = tmp_path / "tiny_rn_clip.pt"
        torch.save(TorchRNCLIP().eval().state_dict(), weights)

        base = ["--images", image_dir, "--clip_weights", str(weights),
                "--buckets", "8", "--param_dtype", "f32", "--topk", "1",
                "--allow_hash_tokenizer"]
        outs = {}
        for mode in ("auto", "off", "on"):
            out = str(tmp_path / f"scores_{mode}.csv")
            assert _run(base + ["--pos_embedding", mode, "--out", out]) == 0
            with open(out) as f:
                outs[mode] = [r["top1_score"] for r in csv.DictReader(f)]
        assert outs["on"] != outs["off"]     # the embedding actually applies
        assert outs["auto"] == outs["on"]    # tiny RN is not RN50 geometry

    def test_pos_embedding_auto_rule(self):
        """auto disables the embedding ONLY for RN50 geometry: RN101 and
        the RN50x* scale-ups (different layer tuples/widths) and every ViT
        tower keep it on, matching the reference's backbone == 'RN50'
        condition."""
        from vit_project_tpu.cli.serve import auto_use_pos_embedding
        from vit_project_tpu.models import clip as vclip
        assert auto_use_pos_embedding(vclip.CLIP_CONFIGS["RN50"]) is False
        for name in ("RN101", "RN50x4", "RN50x16", "RN50x64", "ViT-L/14",
                     "test-tiny"):
            assert auto_use_pos_embedding(vclip.CLIP_CONFIGS[name]) is True, \
                name


class TestAotExportCLI:
    def test_export_then_serve_equals_live(self, image_dir, vit_checkpoint,
                                           tmp_path):
        """--export_dir writes the artifact; --from_export serves it and the
        predictions CSV equals the live engine's byte-for-byte."""
        art = str(tmp_path / "artifact")
        rc = _run(["--export_dir", art, "--model", "test-tiny",
                   "--checkpoint", vit_checkpoint, "--buckets", "4,8",
                   "--param_dtype", "f32"])
        assert rc == 0
        assert os.path.exists(os.path.join(art, "manifest.json"))

        live_out = str(tmp_path / "live.csv")
        _run(["--images", image_dir, "--out", live_out, "--model",
              "test-tiny", "--checkpoint", vit_checkpoint,
              "--buckets", "4,8", "--param_dtype", "f32"])
        aot_out = str(tmp_path / "aot.csv")
        rc = _run(["--from_export", art, "--images", image_dir,
                   "--out", aot_out])
        assert rc == 0
        assert open(aot_out).read() == open(live_out).read()

    def test_export_features_mode_pinned_by_manifest(self, image_dir,
                                                     vit_checkpoint,
                                                     tmp_path):
        """A features artifact serves features even without --mode (the
        manifest pins the output surface)."""
        art = str(tmp_path / "feat_art")
        _run(["--export_dir", art, "--model", "test-tiny",
              "--checkpoint", vit_checkpoint, "--buckets", "8",
              "--param_dtype", "f32", "--mode", "features"])
        out = str(tmp_path / "emb.npy")
        rc = _run(["--from_export", art, "--images", image_dir,
                   "--out", out])
        assert rc == 0
        assert np.load(out).shape == (5, TINY.width)

    def test_export_and_from_export_are_exclusive(self, tmp_path):
        with pytest.raises(SystemExit):
            _run(["--export_dir", str(tmp_path / "a"),
                  "--from_export", str(tmp_path / "b")])

    def test_clip_export_normalize_rides_manifest(self, image_dir, tmp_path):
        """A CLIP-HBA artifact reproduces the live scores byte-for-byte:
        the host-side normalize constants (THINGS mean/std) and the scoring
        mode travel in the manifest, so --from_export needs none of the
        CLIP flags (weights, vocab, DoRA) at serve time."""
        import json
        import torch
        from test_clip_conversion import TorchCLIP
        torch.manual_seed(0)
        weights = tmp_path / "tiny_clip.pt"
        torch.save(TorchCLIP().eval().state_dict(), weights)

        base = ["--clip_weights", str(weights), "--buckets", "8",
                "--param_dtype", "f32", "--allow_hash_tokenizer",
                "--topk", "2"]
        art = str(tmp_path / "clip_art")
        rc = _run(base + ["--export_dir", art])
        assert rc == 0
        m = json.load(open(os.path.join(art, "manifest.json")))
        assert m["normalize"] is not None and len(m["normalize"]) == 2

        live = str(tmp_path / "live.csv")
        _run(base + ["--images", image_dir, "--out", live])
        aot = str(tmp_path / "aot.csv")
        rc = _run(["--from_export", art, "--images", image_dir,
                   "--out", aot, "--topk", "2"])
        assert rc == 0
        assert open(aot).read() == open(live).read()

    def test_int8_quantized_export(self, image_dir, vit_checkpoint,
                                   tmp_path):
        """--quantize int8 engines export too: the quantized param tree
        (int8 weights + scales) is the stored params, and the artifact
        serves the same CSV as the live quantized engine."""
        base = ["--model", "test-tiny", "--checkpoint", vit_checkpoint,
                "--buckets", "8", "--param_dtype", "f32",
                "--quantize", "int8"]
        art = str(tmp_path / "q_art")
        assert _run(base + ["--export_dir", art]) == 0
        live = str(tmp_path / "live.csv")
        _run(base + ["--images", image_dir, "--out", live])
        aot = str(tmp_path / "aot.csv")
        assert _run(["--from_export", art, "--images", image_dir,
                     "--out", aot]) == 0
        assert open(aot).read() == open(live).read()
