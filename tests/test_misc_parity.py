"""Parity odds-and-ends: NOD second inference set dumps, full-finetune tree
splits, baseline CLI end-to-end."""
import os

import jax
import numpy as np
import pytest

from vit_project_tpu.adapters import finetune
from vit_project_tpu.models import clip as vclip


class TestFinetuneSplits:
    def test_visual_tower_split_and_merge(self):
        cfg = vclip.tiny_clip_config()
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        trainable, frozen = finetune.split_visual_tower(params)
        assert "visual" in trainable and "visual" not in frozen
        back = finetune.merge(frozen, trainable)
        assert finetune.count_params(back) == finetune.count_params(params)

    def test_last_blocks_split(self):
        cfg = vclip.tiny_clip_config(layers=3)
        params = vclip.init_clip_params(jax.random.PRNGKey(0), cfg)
        trainable, frozen = finetune.split_last_blocks(params, "visual", 1)
        assert list(trainable["visual"]["blocks"].keys()) == [2]
        # frozen EXCLUDES the trainable blocks (no aliasing/double counting)
        assert frozen["visual"]["blocks"][2] is None
        assert frozen["visual"]["blocks"][0] is not None
        assert (finetune.count_params(frozen)
                + finetune.count_params(trainable)
                == finetune.count_params(params))
        # mutate the trainable block; merge reflects it
        tb = jax.tree_util.tree_map(lambda x: x + 1.0,
                                    trainable["visual"]["blocks"][2])
        merged = finetune.merge(frozen, {"visual": {"blocks": {2: tb}}})
        np.testing.assert_allclose(
            np.asarray(merged["visual"]["blocks"][2]["qkv_b"]),
            np.asarray(params["visual"]["blocks"][2]["qkv_b"]) + 1.0)
        np.testing.assert_array_equal(
            np.asarray(merged["visual"]["blocks"][0]["qkv_b"]),
            np.asarray(params["visual"]["blocks"][0]["qkv_b"]))


@pytest.fixture(scope="module")
def things_small(tmp_path_factory):
    from PIL import Image
    import pandas as pd
    import scipy.io
    root = tmp_path_factory.mktemp("things_cli")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rs = np.random.RandomState(0)
    names = []
    for i in range(56):
        n = f"t{i:03d}.png"
        Image.fromarray(rs.randint(0, 255, (48, 48, 3),
                                   dtype=np.uint8)).save(img_dir / n)
        names.append(n)
    df = pd.DataFrame({"image_name": names})
    for j in range(66):
        df[f"d{j}"] = rs.rand(56).astype(np.float32)
    df.to_csv(root / "train.csv")
    inf = pd.DataFrame({"image_name": names[:48]})
    for j in range(66):
        inf[f"d{j}"] = rs.rand(48).astype(np.float32)
    inf.to_csv(root / "val.csv")
    nod = pd.DataFrame({"image_name": names[48:56]})
    nod.to_csv(root / "nod.csv", index=False)
    rdm = rs.rand(48, 48)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    scipy.io.savemat(root / "rdm.mat", {"RDM48_triplet": rdm})
    return root


class TestBaselineCLIWithNod:
    def test_baseline_cli_end_to_end(self, things_small, tmp_path):
        from vit_project_tpu.cli import baseline
        out = str(tmp_path / "out")
        baseline.main([
            "--csv_file", str(things_small / "train.csv"),
            "--img_dir", str(things_small / "images"),
            "--inference_csv_file", str(things_small / "val.csv"),
            "--RDM48_triplet_dir", str(things_small / "rdm.mat"),
            "--backbone", "test-tiny", "--epochs", "2", "--batch_size", "16",
            "--rank", "4", "--vision_layers", "1", "--transformer_layers", "1",
            "--output_dir", out, "--compute_dtype", "float32",
            "--dump_inference_embeddings",
            "--nod_csv_file", str(things_small / "nod.csv"),
            "--nod_img_dir", str(things_small / "images")])
        import glob
        res = glob.glob(os.path.join(out, "training_res_*.csv"))
        assert len(res) == 1
        with open(res[0]) as f:
            assert len(f.readlines()) == 3  # header + 2 epochs
        # per-epoch dumps for BOTH inference sets
        for e in (1, 2):
            t = os.path.join(out, "things_48_inference_results",
                             f"things_48_embeddings_epoch{e}.csv")
            n = os.path.join(out, "nod_inference_results",
                             f"nod_embeddings_epoch{e}.csv")
            assert os.path.exists(t), t
            assert os.path.exists(n), n
        import pandas as pd
        dump = pd.read_csv(os.path.join(
            out, "nod_inference_results", "nod_embeddings_epoch1.csv"))
        assert dump.shape == (8, 67)  # image_name + 66 dims
        assert dump.columns[0] == "image_name"
        # category-RDM archive built from the dumps at run end
        # (hba_nod_category_rdms_dict.npz parity; SURVEY.md section 0)
        import numpy as np
        arc_path = os.path.join(out, "hba_nod_category_rdms_dict.npz")
        assert os.path.exists(arc_path), arc_path
        arc = np.load(arc_path, allow_pickle=False)
        assert "categories" in arc.files
        C = len(arc["categories"])
        for e in (1, 2):
            rdm = arc[f"epoch{e}"]
            assert rdm.shape == (C, C)
            np.testing.assert_allclose(np.diag(rdm), 0.0)
            np.testing.assert_allclose(rdm, rdm.T, atol=1e-6)


class TestCategoryRdms:
    def test_category_rules_and_rdm_math(self, tmp_path):
        import numpy as np
        import pandas as pd
        from vit_project_tpu.analysis import category_rdms as cr
        assert cr.category_of("lemon_01b.jpg") == "lemon"
        assert cr.category_of("animals/dog/img3.png") == "dog"
        assert cr.category_of("zebra.jpg") == "zebra"

        rs = np.random.RandomState(0)
        emb = rs.randn(6, 5).astype(np.float32)
        cats = ["a", "b", "a", "c", "b", "c"]
        order, rdm = cr.category_rdm(emb, cats)
        assert order == ["a", "b", "c"]
        means = np.stack([emb[[0, 2]].mean(0), emb[[1, 4]].mean(0),
                          emb[[3, 5]].mean(0)])
        want = 1 - np.corrcoef(means)
        np.fill_diagonal(want, 0)
        np.testing.assert_allclose(rdm, want.astype(np.float32), atol=1e-6)

        # round-trip through dump files + CLI entry
        d = tmp_path / "dumps"
        d.mkdir()
        for e in (1, 3):
            df = pd.DataFrame(rs.randn(6, 5).astype(np.float32))
            df.insert(0, "image_name", [f"{c}_{i:02d}.jpg"
                                        for i, c in enumerate(cats)])
            df.to_csv(d / f"nod_embeddings_epoch{e}.csv", index=False)
        out = tmp_path / "arc.npz"
        assert cr.main([str(d), "-o", str(out)]) == 0
        arc = np.load(out)
        assert set(arc.files) == {"categories", "epoch1", "epoch3"}
        assert arc["epoch3"].shape == (3, 3)

    def test_mismatched_category_sets_refused(self, tmp_path):
        """Epoch dumps with differing category sets must raise: the archive
        stores ONE 'categories' axis, so rows from a foreign/partial dump
        would be silently mislabeled under the first file's labels."""
        import numpy as np
        import pandas as pd
        import pytest
        from vit_project_tpu.analysis import category_rdms as cr
        d = tmp_path / "dumps"
        d.mkdir()
        rs = np.random.RandomState(0)
        for e, cats in ((1, ["a", "a", "b", "b"]), (2, ["a", "a", "c", "c"])):
            df = pd.DataFrame(rs.randn(4, 5).astype(np.float32))
            df.insert(0, "image_name", [f"{c}_{i:02d}.jpg"
                                        for i, c in enumerate(cats)])
            df.to_csv(d / f"nod_embeddings_epoch{e}.csv", index=False)
        with pytest.raises(ValueError, match="differs"):
            cr.build_category_rdms(str(d))


class TestPodSafeLogging:
    def test_nonprimary_process_gets_no_file(self, tmp_path, monkeypatch):
        """The file handler truncates on open (mode='w'), so on a pod only
        process 0 may own the log file; other processes log to console only.
        The primary decision is LAZY (first emit), so building the logger
        before dist.setup_distributed() cannot make every pod process
        truncate the shared file."""
        import logging
        from vit_project_tpu.core import logs

        p0 = str(tmp_path / "p0.log")
        lg = logs.setup_logger(p0)
        assert not os.path.exists(p0)          # nothing opened before emit
        lg.info("hello")
        assert os.path.exists(p0)
        assert "hello" in open(p0).read()

        # build BEFORE the process learns it is non-primary (the pod init
        # ordering hazard): the file decision happens at first emit
        p1 = str(tmp_path / "p1.log")
        lg = logs.setup_logger(p1)
        monkeypatch.setattr(logs, "_is_primary", lambda: False)
        lg.info("from a secondary process")
        assert not os.path.exists(p1)
        # console handler still present so the process is not silent
        assert any(isinstance(h, logging.StreamHandler) for h in lg.handlers)
