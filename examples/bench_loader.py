"""Input-pipeline throughput: ImageFolderLoader PIL vs native C++ decode.

The device step consumes ~1,178 img/s/chip at ViT-B/16 b256 (BENCHLOG.md); this
measures whether the HOST can decode + RandomResizedCrop + flip fast enough to
feed it (the reference leans on torch DataLoader workers + prefetch,
train_vit_sgd.py:63-78). Generates a synthetic ImageFolder of ImageNet-sized
JPEGs, then times full epochs through the loader for each (decoder, workers)
combination.

Usage: python examples/bench_loader.py [workdir] [--n 512] [--workers 1,2,4,8]
Prints an img/s table plus a per-core extrapolation against the device rate.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_imagefolder(root: str, n: int, px: int = 500, py: int = 375,
                     quality: int = 85):
    """n JPEGs at typical ImageNet resolution/compression across 4 classes."""
    from PIL import Image
    rs = np.random.RandomState(0)
    made = 0
    for ci in range(4):
        d = os.path.join(root, f"class_{ci}")
        os.makedirs(d, exist_ok=True)
        for i in range(n // 4):
            p = os.path.join(d, f"img_{i:05d}.jpg")
            if not os.path.exists(p):
                # low-frequency content + noise compresses like a photo
                base = rs.rand(py // 25, px // 25, 3)
                up = np.kron(base, np.ones((25, 25, 1)))
                noise = rs.rand(py, px, 3) * 0.25
                arr = ((up[:py, :px] * 0.75 + noise) * 255).astype(np.uint8)
                Image.fromarray(arr).save(p, quality=quality)
            made += 1
    return made


def bench_one(root: str, use_native: bool, workers: int, batch: int = 64,
              epochs: int = 2) -> float:
    from vit_project_tpu.data.imagenet import ImageFolderLoader
    ld = ImageFolderLoader(root, batch, train=True, seed=0, workers=workers,
                           prefetch=4, use_native=use_native)
    n_img = 0
    # epoch 0 warms the page cache; time epoch 1..epochs
    for _ in ld.epoch(0):
        pass
    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        for imgs, _ in ld.epoch(e):
            n_img += len(imgs)
    return n_img / (time.perf_counter() - t0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/loader_bench")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--workers", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args(argv)

    root = os.path.join(os.path.abspath(args.workdir), "imagefolder")
    n = make_imagefolder(root, args.n)
    ncores = os.cpu_count() or 1
    print(f"{n} JPEGs (500x375 q85), host cores: {ncores}")

    from vit_project_tpu.data import fastimage
    decoders = [("pil", False)]
    if fastimage.available():
        decoders.append(("native", True))
    else:
        print("libfastimage.so not built (make -C native) - PIL only")

    rows = []
    for wname in [int(w) for w in args.workers.split(",")]:
        for dname, native in decoders:
            rate = bench_one(root, native, wname, batch=args.batch)
            rows.append({"decoder": dname, "workers": wname,
                         "img_per_sec": round(rate, 1)})
            print(f"  {dname:6s} workers={wname:2d}: {rate:7.1f} img/s")

    best = max(rows, key=lambda r: r["img_per_sec"])
    device_rate = 1178.0  # BENCHLOG.md ViT-B/16 b256 single chip
    per_core = best["img_per_sec"] / min(best["workers"], ncores)
    print(json.dumps({
        "best": best,
        "host_cores": ncores,
        "device_rate_img_s": device_rate,
        "per_core_img_s": round(per_core, 1),
        "cores_to_feed_one_chip": round(device_rate / per_core, 1),
    }, indent=2))
    return rows


if __name__ == "__main__":
    main()
