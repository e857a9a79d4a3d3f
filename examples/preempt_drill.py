"""On-chip preemption drill of the batched sweep (round-4 item: close the
loop that core/preempt.py + cli/sweep.py's pieces are tested for separately).

Drill script:
  1. synthetic THINGS tree + a short baseline (subprocess — the parent never
     initializes jax, so each leg owns the chip cleanly);
  2. sweep A: 6 forks in vmapped groups of 3, uninterrupted (the oracle);
  3. sweep B: same command into a fresh tree, SIGTERMed as soon as group 1
     starts training — must exit 143 with group 2's runs undispatched;
  4. re-invoke sweep B with the undispatched runs — must exit 0;
  5. diff every run's training_res CSV between A and B: byte-equal rows.

Usage:
  python examples/preempt_drill.py /tmp/drill [--backbone ViT-L/14]
      [--epochs 12] [--frozen_cache]
CPU smoke:
  JAX_PLATFORMS=cpu python examples/preempt_drill.py /tmp/drill_cpu \
      --backbone test-tiny --epochs 6 --n_train 60 --compute_dtype float32
"""
from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.paradigm_tpu import make_synthetic_things  # noqa: E402

FORKS = [2, 3, 5, 6, 8, 9]      # two ascending groups of 3: [2,3,5], [6,8,9]
GROUP_SIZE = 3
GROUP2 = [6, 8, 9]


def run_env():
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + repo
                         ).lstrip(os.pathsep)
    return env


def sweep_cmd(args, data, base, outdir, order):
    return [
        sys.executable, "-m", "vit_project_tpu.cli.sweep",
        "--csv_file", data["csv_file"], "--img_dir", data["img_dir"],
        "--inference_csv_file", data["inference_csv_file"],
        "--RDM48_triplet_dir", data["RDM48_triplet_dir"],
        "--backbone", args.backbone, "--epochs", str(args.epochs),
        "--batch_size", str(args.batch_size),
        "--random_seed", "1", "--vision_layers", "2",
        "--transformer_layers", "1", "--rank", str(args.rank),
        "--perturb_type", "random_target", "--perturb_seed", "0",
        "--early_stopping_patience", str(args.epochs * 2),
        "--baseline_dora_directory", f"{base}/dora_params",
        "--baseline_random_state_path", f"{base}/random_states",
        "--baseline_split_indices_path",
        f"{base}/random_states/dataset_split_indices.pth",
        "--output_base_directory", outdir,
        "--training_order", ",".join(map(str, order)),
        "--compute_dtype", args.compute_dtype,
        "--batched_forks", str(GROUP_SIZE),
    ] + (["--frozen_cache"] if args.frozen_cache else [])


def wait_for(pattern: str, log_dir: str, timeout: float,
             proc=None) -> str | None:
    """Poll the sweep's main_training_log_* under log_dir for a regex."""
    deadline = time.time() + timeout
    rx = re.compile(pattern)
    while time.time() < deadline:
        if proc is not None and proc.poll() is not None:
            return None
        try:
            logs = [f for f in os.listdir(log_dir)
                    if f.startswith("main_training_log_")]
        except FileNotFoundError:
            logs = []
        for f in logs:
            with open(os.path.join(log_dir, f)) as fh:
                m = rx.search(fh.read())
                if m:
                    return m.group(0)
        time.sleep(0.25)
    return None


def read_rows(csv_path: str) -> list[str]:
    with open(csv_path) as f:
        return f.read().splitlines()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--backbone", default="ViT-L/14")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--n_train", type=int, default=1806)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--frozen_cache", action="store_true")
    args = ap.parse_args(argv)

    if args.epochs <= max(FORKS):
        # a fork at epoch N trains epochs [N-1, epochs): with the cap at or
        # below N it trains NOTHING and the A/B diff passes vacuously
        raise SystemExit(f"--epochs must exceed the largest fork epoch "
                         f"({max(FORKS)}); got {args.epochs}")
    work = os.path.abspath(args.workdir)
    os.makedirs(work, exist_ok=True)
    data = make_synthetic_things(work, args.n_train)
    env = run_env()
    t_all = time.time()

    base = os.path.join(work, "baseline")
    print(f"== baseline ({args.epochs} epochs, {args.backbone})")
    code = (
        "import json,sys;"
        "from vit_project_tpu.core.compile_cache import "
        "enable_persistent_cache;enable_persistent_cache();"
        "from vit_project_tpu.train.clip_loop import "
        "run_behavioral_training;"
        "run_behavioral_training(json.load(open(sys.argv[1])))")
    cfg = dict(data, backbone=args.backbone, epochs=args.epochs,
               batch_size=args.batch_size, train_portion=0.8, lr=3e-4,
               logger=None, early_stopping_patience=args.epochs * 2,
               random_seed=1, vision_layers=2, transformer_layers=1,
               rank=args.rank, criterion="mse", cuda=0,
               perturb_distribution="target", perturb_seed=0,
               compute_dtype=args.compute_dtype,
               frozen_cache=args.frozen_cache,
               perturb_type="baseline", perturb_length=0, training_run=0,
               checkpoint_path=f"{base}/model.ckpt",
               training_res_path=f"{base}/training_res.csv",
               dora_parameters_path=f"{base}/dora_params",
               random_state_path=f"{base}/random_states")
    os.makedirs(base, exist_ok=True)
    import json
    cfg_path = f"{base}/config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    subprocess.run([sys.executable, "-c", code, cfg_path], env=env,
                   check=True)

    sweep_a = os.path.join(work, "sweepA")
    print("== sweep A (uninterrupted oracle)")
    rc = subprocess.run(sweep_cmd(args, data, base, sweep_a, FORKS),
                        env=env).returncode
    assert rc == 0, f"sweep A failed rc={rc}"

    sweep_b = os.path.join(work, "sweepB")
    print("== sweep B (SIGTERM as group 1 starts)")
    os.makedirs(sweep_b, exist_ok=True)
    proc = subprocess.Popen(sweep_cmd(args, data, base, sweep_b, FORKS),
                            env=env)
    # group 1's first per-epoch log line = the group loop is mid-group
    hit = wait_for(r"run 2 epoch \d+:", sweep_b, timeout=3600, proc=proc)
    assert hit, ("sweep B finished or died before group 1 logged an epoch - "
                 f"rc={proc.poll()}")
    print(f"   group 1 is training ({hit!r}) -> SIGTERM")
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=3600)
    assert rc == 143, f"preempted sweep exited {rc}, want 143"
    undispatched = wait_for(r"undispatched.*", sweep_b, timeout=10)
    print(f"   exit 143 OK; log: {undispatched!r}")
    for run in GROUP2:
        path = os.path.join(sweep_b, f"training_run{run}",
                            f"training_res_run{run}.csv")
        rows = read_rows(path)[1:] if os.path.exists(path) else []
        assert not rows, f"run {run} should be undispatched, has {len(rows)} rows"

    print("== sweep B re-invoke (undispatched runs)")
    rc = subprocess.run(sweep_cmd(args, data, base, sweep_b, GROUP2),
                        env=env).returncode
    assert rc == 0, f"re-invoked sweep exited {rc}"

    print("== diff A vs B")
    for run in FORKS:
        a = read_rows(os.path.join(sweep_a, f"training_run{run}",
                                   f"training_res_run{run}.csv"))
        b = read_rows(os.path.join(sweep_b, f"training_run{run}",
                                   f"training_res_run{run}.csv"))
        assert a == b, (f"run {run}: CSV mismatch between uninterrupted and "
                        f"preempted+resumed trees\nA={a}\nB={b}")
        assert len(a) > 1, f"run {run} trained no epochs — vacuous diff"
        print(f"   run {run}: {len(a) - 1} rows byte-equal")

    print(f"PREEMPTION DRILL PASSED in {time.time() - t_all:.1f}s "
          f"(SIGTERM mid-group -> 143 -> resume -> byte-equal trees)")


if __name__ == "__main__":
    main()
