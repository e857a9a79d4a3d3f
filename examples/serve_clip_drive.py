"""CLIP-HBA online serving, end-to-end on the chip (round-4 item 6).

Drives the production serving surface for the CLIP-HBA engine the way
round 3 drove the ViT one (BENCHLOG cont. 7):

  1. fabricate a ViT-L/14 torch CLIP checkpoint (random weights — rates and
     wire formats are value-independent on this zero-egress box; with real
     weights the same commands serve real scores) and optionally a trained
     DoRA checkpoint to bake in;
  2. AOT round-trip: `cli.serve --export_dir` (StableHLO bucket programs +
     params), then `--from_export` batch scoring — outputs must equal the
     direct engine's;
  3. HTTP daemon: `cli.serve --http_port` (66-score responses), measured
     with a single latency client and then N concurrent clients; the
     daemon's /v1/stats reports the micro-batch coalescing ratio.

Usage (chip):
  python examples/serve_clip_drive.py /tmp/serve_drive \
      [--dora_checkpoint .../epochN_dora_params.pth --rank 32] \
      [--clients 8 --seconds 20]
CPU smoke:
  JAX_PLATFORMS=cpu python examples/serve_clip_drive.py /tmp/serve_cpu \
      --backbone test-tiny --clients 2 --seconds 4 --n_images 12
"""
from __future__ import annotations

import argparse
import io
import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_env():
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + repo
                         ).lstrip(os.pathsep)
    return env


def make_clip_pt(path: str, backbone: str, seed: int = 0) -> int:
    """Write a torch CLIP checkpoint of the requested backbone (random
    weights) via the same converter the torch-export CLI uses."""
    import jax
    from vit_project_tpu.models import clip as vclip
    from vit_project_tpu.models import convert as vconvert

    cfg = vclip.CLIP_CONFIGS[backbone]
    params = vclip.init_clip_params(jax.random.PRNGKey(seed), cfg)
    sd = vconvert.clip_state_dict_from_params(params, cfg)
    vconvert.save_torch_state_dict(path, sd)
    return cfg.visual.image_size


def make_images(dirpath: str, n: int, px: int) -> None:
    from PIL import Image
    os.makedirs(dirpath, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        p = os.path.join(dirpath, f"img_{i:04d}.png")
        arr = rs.randint(0, 255, (px, px, 3), dtype=np.uint8)
        if not os.path.exists(p):
            Image.fromarray(arr).save(p)


def serve_cmd(args, extra: list[str]) -> list[str]:
    cmd = [sys.executable, "-m", "vit_project_tpu.cli.serve",
           "--clip_weights", args.clip_pt, "--allow_hash_tokenizer",
           "--buckets", args.buckets, "--rank", str(args.rank),
           "--vision_layers", str(args.vision_layers),
           "--transformer_layers", str(args.transformer_layers)]
    if args.dora_checkpoint:
        cmd += ["--dora_checkpoint", args.dora_checkpoint]
    return cmd + extra


def post_npy(url: str, arr: np.ndarray, timeout: float = 300.0) -> np.ndarray:
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url, data=buf.getvalue(),
                                 headers={"Content-Type":
                                          "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return np.load(io.BytesIO(r.read()))


def wait_http(port: int, proc, timeout: float = 1200.0) -> dict:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"daemon died rc={proc.returncode}")
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/v1/healthz", timeout=2) as r:
                return json.load(r)
        except Exception:
            time.sleep(0.5)
    raise RuntimeError("daemon never became healthy")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--backbone", default="ViT-L/14")
    ap.add_argument("--dora_checkpoint", default=None,
                    help="trained epochN_dora_params.pth to bake (e.g. from "
                         "the paradigm baseline)")
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--vision_layers", type=int, default=2)
    ap.add_argument("--transformer_layers", type=int, default=1)
    ap.add_argument("--buckets", default="8,64")
    ap.add_argument("--port", type=int, default=18612)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--n_images", type=int, default=64)
    ap.add_argument("--skip_aot", action="store_true")
    args = ap.parse_args(argv)

    work = os.path.abspath(args.workdir)
    os.makedirs(work, exist_ok=True)
    env = run_env()
    report: dict = {"backbone": args.backbone,
                    "dora_baked": bool(args.dora_checkpoint)}

    args.clip_pt = os.path.join(work, "clip_random.pt")
    if not os.path.exists(args.clip_pt):
        print(f"== fabricating {args.backbone} torch checkpoint")
        px = make_clip_pt(args.clip_pt, args.backbone)
    else:
        from vit_project_tpu.models import clip as vclip
        px = vclip.CLIP_CONFIGS[args.backbone].visual.image_size
    img_dir = os.path.join(work, "images")
    make_images(img_dir, args.n_images, px)

    if not args.skip_aot:
        print("== AOT: direct batch scoring vs export/load round-trip")
        direct_csv = os.path.join(work, "scores_direct.csv")
        t0 = time.time()
        subprocess.run(serve_cmd(args, ["--images", img_dir,
                                        "--out", direct_csv]),
                       env=env, check=True)
        report["aot_direct_s"] = round(time.time() - t0, 1)
        exp_dir = os.path.join(work, "aot_artifact")
        t0 = time.time()
        subprocess.run(serve_cmd(args, ["--export_dir", exp_dir]),
                       env=env, check=True)
        report["aot_export_s"] = round(time.time() - t0, 1)
        aot_csv = os.path.join(work, "scores_aot.csv")
        t0 = time.time()
        subprocess.run([sys.executable, "-m", "vit_project_tpu.cli.serve",
                        "--from_export", exp_dir, "--images", img_dir,
                        "--out", aot_csv], env=env, check=True)
        report["aot_load_score_s"] = round(time.time() - t0, 1)
        a = open(direct_csv).read()
        b = open(aot_csv).read()
        assert a == b, "AOT round-trip scores differ from the direct engine"
        report["aot_roundtrip_equal"] = True
        print(f"   AOT round-trip equal ({len(a.splitlines()) - 1} rows)")

    print(f"== HTTP daemon on :{args.port}")
    log_path = os.path.join(work, "daemon.log")
    with open(log_path, "w") as lf:
        proc = subprocess.Popen(
            serve_cmd(args, ["--http_port", str(args.port),
                             "--max_delay_ms", "5"]),
            env=env, stdout=lf, stderr=subprocess.STDOUT)
    try:
        t0 = time.time()
        health = wait_http(args.port, proc)
        report["daemon_ready_s"] = round(time.time() - t0, 1)
        print(f"   healthy in {report['daemon_ready_s']}s: {health}")
        url = f"http://127.0.0.1:{args.port}/v1/predict"
        rs = np.random.RandomState(1)
        batch8 = rs.randint(0, 255, (8, px, px, 3)).astype(np.float32)

        lat = []
        for _ in range(20):
            t1 = time.time()
            out = post_npy(url, batch8)
            lat.append(time.time() - t1)
        assert out.shape == (8, 66), f"wire shape {out.shape} != (8, 66)"
        lat_ms = sorted(x * 1e3 for x in lat)
        report["single_client"] = {
            "p50_ms": round(lat_ms[len(lat_ms) // 2], 1),
            "p90_ms": round(lat_ms[int(len(lat_ms) * 0.9)], 1)}
        print(f"   single client batch-8: p50 "
              f"{report['single_client']['p50_ms']} ms, p90 "
              f"{report['single_client']['p90_ms']} ms")

        def stats():
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/v1/stats",
                    timeout=10) as r:
                return json.load(r)

        s0 = stats()
        done = {"n": 0, "imgs": 0}
        lock = threading.Lock()
        stop_at = time.time() + args.seconds

        def client(ci: int):
            r = np.random.RandomState(100 + ci)
            while time.time() < stop_at:
                b = r.randint(0, 255, (8, px, px, 3)).astype(np.float32)
                o = post_npy(url, b)
                with lock:
                    done["n"] += 1
                    done["imgs"] += len(o)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        t1 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t1
        s1 = stats()
        req = done["n"]
        disp = s1.get("dispatches", 0) - s0.get("dispatches", 0)
        report["concurrent"] = {
            "clients": args.clients, "wall_s": round(wall, 1),
            "requests": req, "images": done["imgs"],
            "images_per_sec": round(done["imgs"] / wall, 1),
            "engine_dispatches": disp,
            "coalescing_x": round(req / disp, 2) if disp else None}
        print(f"   {args.clients} clients x {wall:.0f}s: {req} requests -> "
              f"{disp} dispatches ({report['concurrent']['coalescing_x']}x "
              f"coalescing), {report['concurrent']['images_per_sec']} img/s "
              f"aggregate")
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()

    out = os.path.join(work, "serve_drive_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"SERVE DRIVE PASSED; report at {out}")


if __name__ == "__main__":
    main()
