"""Native image-decode core (native/fastimage.cpp) tests. Builds the shared
library on demand; skipped if the toolchain is unavailable."""
import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def fastimage():
    so = os.path.join(NATIVE_DIR, "libfastimage.so")
    if not os.path.exists(so):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr.decode()[:200]}")
    from vit_project_tpu.data import fastimage as fi
    if not fi.available():
        pytest.skip("libfastimage.so not loadable")
    return fi


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("fimg")
    rs = np.random.RandomState(0)
    out = {}
    arr = rs.randint(0, 255, (120, 160, 3), dtype=np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    Image.fromarray(arr).save(d / "a.jpg", quality=95)
    out["png"] = str(d / "a.png")
    out["jpg"] = str(d / "a.jpg")
    out["arr"] = arr
    return out


class TestFastImage:
    def test_resize_matches_pil(self, fastimage, images):
        from PIL import Image
        got = fastimage.transform(images["png"], fastimage.MODE_RESIZE, 64, 64)
        want = np.asarray(Image.open(images["png"]).convert("RGB")
                          .resize((64, 64), Image.BILINEAR))
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1  # PIL-equivalent antialiased filter, rounding only

    def test_center_crop_matches_pipeline(self, fastimage, images):
        from PIL import Image
        from vit_project_tpu.data.imagenet import resize_center_crop
        got = fastimage.transform(images["png"], fastimage.MODE_CENTER_CROP,
                                  64, 64, resize_to=96)
        want = np.asarray(resize_center_crop(
            Image.open(images["png"]).convert("RGB"), 64, 96))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_jpeg_decode_matches_pil(self, fastimage, images):
        from PIL import Image
        got = fastimage.transform(images["jpg"], fastimage.MODE_RESIZE,
                                  120, 160)
        want = np.asarray(Image.open(images["jpg"]).convert("RGB"))
        # same libjpeg pipeline as PIL -> identical decode at identity size
        np.testing.assert_array_equal(got, want)

    def test_rrc_deterministic_per_seed(self, fastimage, images):
        a = fastimage.transform(images["png"], fastimage.MODE_RRC_FLIP,
                                64, 64, seed=7)
        b = fastimage.transform(images["png"], fastimage.MODE_RRC_FLIP,
                                64, 64, seed=7)
        c = fastimage.transform(images["png"], fastimage.MODE_RRC_FLIP,
                                64, 64, seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_batch_api_and_errors(self, fastimage, images):
        paths = [images["png"], images["jpg"]] * 3
        seeds = np.arange(6, dtype=np.uint64)
        out = fastimage.transform_batch(paths, fastimage.MODE_RRC_FLIP,
                                        32, 32, seeds, threads=2)
        assert out.shape == (6, 32, 32, 3)
        with pytest.raises(IOError):
            fastimage.transform("/nonexistent.jpg", 0, 32, 32)
        with pytest.raises(IOError):
            fastimage.transform_batch(["/nonexistent.jpg"], 0, 32, 32,
                                      np.zeros(1, np.uint64))

    def test_batch_thread_count_invariant(self, fastimage, images):
        """Per-image seeds make the augmentations independent of the worker
        partition: threads=1 and threads=4 must produce byte-identical
        batches (thread scaling may reorder WORK, never results)."""
        paths = [images["png"], images["jpg"]] * 4
        seeds = (np.arange(8, dtype=np.uint64) * 977) + 3
        a = fastimage.transform_batch(paths, fastimage.MODE_RRC_FLIP,
                                      32, 32, seeds, threads=1)
        b = fastimage.transform_batch(paths, fastimage.MODE_RRC_FLIP,
                                      32, 32, seeds, threads=4)
        np.testing.assert_array_equal(a, b)

    def test_loader_native_path(self, fastimage, tmp_path, images):
        import shutil
        from vit_project_tpu.data.imagenet import ImageFolderLoader
        for cls in ("x", "y"):
            os.makedirs(tmp_path / "train" / cls)
            for i in range(4):
                shutil.copy(images["png"], tmp_path / "train" / cls / f"{i}.png")
        ld = ImageFolderLoader(str(tmp_path / "train"), 4, train=True,
                               seed=1, size=32, workers=2, use_native=True)
        batches = [(i.copy(), l.copy()) for i, l in ld.epoch(0)]
        assert sum(len(l) for _, l in batches) == 8
        # replayable
        batches2 = [(i.copy(), l.copy()) for i, l in ld.epoch(0)]
        for (a, _), (b, _) in zip(batches, batches2):
            np.testing.assert_array_equal(a, b)
