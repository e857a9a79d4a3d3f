"""THINGS data pipeline.

Reference contract (ThingsDataset / ThingsInferenceDataset,
new_cvpr_train_behavior_things_pipeline.py:180-248): the CSV is read with
index_col=0 (the shipped spose CSVs carry a leading pandas index column), after
which column 0 is the image filename and the remaining 66 columns are the SPoSE
target embedding (ref :191-197 reads `iloc[index, 0]` the same way); images
resized to 224x224 and normalized with THINGS statistics.

TPU-first design: the whole dataset (1,806 train + 48 inference images) is decoded
and resized ONCE into a pinned uint8 host array (~270 MB) by a thread pool, then
batches are sliced from it and normalized on device inside the jitted step. This
removes the per-epoch PIL/decode cost entirely (the reference pays it every epoch
through DataLoader workers) and keeps the input pipeline far ahead of the TPU.
"""
from __future__ import annotations

import hashlib
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from ..core.configs import THINGS_MEAN, THINGS_STD


def _load_one(img_dir: str, name: str, size: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(os.path.join(img_dir, name)).convert("RGB")
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def decode_images(img_dir: str, names: list[str], size: int = 224,
                  workers: int = 16) -> np.ndarray:
    with ThreadPoolExecutor(workers) as ex:
        arrs = list(ex.map(lambda n: _load_one(img_dir, n, size), names))
    return np.stack(arrs)


class ThingsDataset:
    """Train dataset: (names, images_u8 [N,224,224,3], targets [N,66])."""

    def __init__(self, csv_file: str, img_dir: str, size: int = 224,
                 cache_file: str | None = None):
        ann = pd.read_csv(csv_file, index_col=0)
        self.names = ann.iloc[:, 0].tolist()
        self.targets = ann.iloc[:, 1:].values.astype(np.float32)
        if cache_file and not cache_file.endswith(".npz"):
            cache_file += ".npz"   # np.savez appends it; look where it writes
        # a cache built for a different image list, ORDER, or resolution
        # must re-decode, not silently pair wrong pixels with the targets —
        # shape checks alone accept any same-length reordered/filtered CSV,
        # so the cache stores a digest of the exact name sequence
        digest = hashlib.sha256(
            "\n".join(map(str, self.names)).encode()).hexdigest()
        cached = None
        if cache_file and os.path.exists(cache_file):
            z = np.load(cache_file, mmap_mode=None, allow_pickle=False)
            arr = z["images"]
            names_ok = ("names_sha256" in z.files
                        and str(z["names_sha256"]) == digest)
            if (names_ok and arr.shape[0] == len(self.names)
                    and arr.shape[1] == size):
                cached = arr
        if cached is not None:
            self.images_u8 = cached
        else:
            self.images_u8 = decode_images(img_dir, self.names, size)
            if cache_file:
                os.makedirs(os.path.dirname(cache_file) or ".", exist_ok=True)
                np.savez(cache_file, images=self.images_u8,
                         names_sha256=digest)

    def __len__(self):
        return len(self.names)


class ThingsInferenceDataset:
    """The 48 held-out images + path to the human RDM .mat file."""

    def __init__(self, inference_csv_file: str, img_dir: str,
                 RDM48_triplet_dir: str, size: int = 224):
        ann = pd.read_csv(inference_csv_file, index_col=0)
        self.names = ann.iloc[:, 0].tolist()
        self.images_u8 = decode_images(img_dir, self.names, size)
        self.RDM48_triplet_dir = RDM48_triplet_dir

    def load_reference_rdm(self) -> np.ndarray:
        import scipy.io
        d = scipy.io.loadmat(self.RDM48_triplet_dir)
        return np.asarray(d["RDM48_triplet"], dtype=np.float32)

    def __len__(self):
        return len(self.names)


def normalize_uint8(images_u8, mean=THINGS_MEAN, std=THINGS_STD, dtype=None):
    """uint8 [B,H,W,3] -> normalized float — jit-able, runs on device."""
    import jax.numpy as jnp
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    if dtype is not None:
        x = x.astype(dtype)
    return x


# -- split persistence (reference dataset_split_indices.pth contract) --------

def random_split_indices(n: int, train_portion: float, seed: int):
    """Deterministic train/test split (reference uses torch random_split 80/20
    seeded by random_seed, cvpr...baseline.py:731-733)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    perm = rng.permutation(n)
    n_train = int(train_portion * n)
    return perm[:n_train].tolist(), perm[n_train:].tolist()


def save_split_indices(path: str, train_indices, test_indices, seed: int):
    from ..ckpt import serialization as ser
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    ser.save(path, {
        "train_indices": list(map(int, train_indices)),
        "test_indices": list(map(int, test_indices)),
        "random_seed": seed,
        "train_size": len(train_indices),
        "test_size": len(test_indices),
    })


def load_split_indices(path: str, logger=None):
    """Load the persisted split (reference load_dataset_split_indices,
    new_cvpr...pipeline.py:137-161). Returns None if missing."""
    from ..ckpt import serialization as ser
    log = logger.info if logger else print
    if not os.path.exists(path):
        log(f"Split indices file not found: {path}")
        return None
    info = ser.load(path)
    log(f"Loaded dataset split indices from: {path}")
    log(f"  Train samples: {len(info['train_indices'])}")
    log(f"  Test samples: {len(info['test_indices'])}")
    log(f"  Random seed used: {info['random_seed']}")
    return info


class EpochShuffler:
    """Replayable per-epoch shuffling.

    The reference checkpoints the DataLoader generator state every epoch so a fork
    replays identical batch order (save_random_states, ref :696-728). Here the
    order is a pure function of (data_seed, epoch): permutation = PCG64(data_seed
    XOR-folded with epoch). Saving `data_seed` once reproduces every epoch's order.
    """

    def __init__(self, n: int, batch_size: int, data_seed: int,
                 drop_last: bool = False):
        self.n = n
        self.batch_size = batch_size
        self.data_seed = int(data_seed)
        self.drop_last = drop_last

    def epoch_order(self, epoch: int) -> np.ndarray:
        rng = np.random.Generator(
            np.random.PCG64([self.data_seed, int(epoch)]))
        return rng.permutation(self.n)

    def batches(self, epoch: int):
        order = self.epoch_order(epoch)
        end = (self.n - self.n % self.batch_size) if self.drop_last else self.n
        for s in range(0, end, self.batch_size):
            yield order[s:s + self.batch_size]

    def num_batches(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size
