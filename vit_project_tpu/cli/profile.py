"""Step profiler: a reproducible per-bucket device-time table of the
production train step.

The reference has no profiler at all (coarse time.time() prints,
train_vit_sgd.py:130,159-163; SURVEY.md section 5). This CLI is the tool
behind BENCHLOG.md's bucket tables: it runs the REAL jitted train step
(normalize + forward + backward + SGD update) on device-resident synthetic
batches under `jax.profiler.trace`, converts the captured xplane with the
xprof/tensorboard-profile converter, and prints

  - the per-bucket table (dense fusions / dW+update / flash attention
    fwd+bwd / reduces+converts / copies / other) in ms per step, and
  - the top-K individual HLO ops by self time,

so the perf story in BASELINE.md is one command to re-derive on any chip:

    python -m vit_project_tpu.cli.profile --batch 256 --steps 3

Needs a real accelerator plane (TPU): the converter's hlo_stats tool is
empty for host-CPU execution. The classification itself (`bucket_of`,
`summarize`) is pure and unit-tested on synthetic tables.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import tempfile


# bucket names, in the order BENCHLOG.md's tables use
BUCKETS = ("dense matmul fusions (fwd + dx, fused epilogues)",
           "dW matmuls + optimizer update",
           "attention kernels fwd (pallas)",
           "attention kernels bwd (pallas)",
           "elementwise/reduce glue (LN stats, bias grads)",
           "copies/async",
           "other")


def bucket_of(category: str, name: str, expr: str) -> str:
    """Classify one hlo_stats row into a BENCHLOG bucket.

    The rules are calibrated against the actual TPU hlo_stats taxonomy of
    the production step (raw dump committed to BENCHLOG round 3 cont.):
    - `custom-call` rows are the pallas attention kernels; under autodiff
      XLA names the backward's transposed call `transpose_jvp___*` and the
      forward `jvp__*` (an eval-only program's kernels also land here, as
      forward);
    - `convolution fusion` rows are the MXU matmul fusions. The dW matmuls
      are fused with the SGD update, which names them
      `multiply_subtract_fusion*` (p - lr*(m*buf + g + wd*p)); everything
      else (plain `fusion`, `convolution_add_fusion`,
      `convert_reduce_fusion`) is a forward/dx matmul with its LN/bias
      epilogues fused in;
    - `loop fusion` / `reduce` / `non-fusion elementwise` / `broadcast` /
      `iota` / `data formatting` are the bandwidth-bound glue;
    - `copy-start/done` and `async-start/done` are transfers/layout.
    """
    cat = category.lower()
    n = name.lower()
    if cat == "custom-call":
        return BUCKETS[3] if "transpose_jvp" in n else BUCKETS[2]
    if "convolution" in cat or cat == "dot" or "dot(" in expr.lower():
        return BUCKETS[1] if "multiply_subtract" in n else BUCKETS[0]
    if cat.startswith("copy") or cat.startswith("async"):
        return BUCKETS[5]
    if cat in ("loop fusion", "fusion", "reduce", "non-fusion elementwise",
               "broadcast", "iota", "data formatting", "convert",
               "all-reduce"):
        return BUCKETS[4]
    return BUCKETS[6]


def summarize(rows, steps: int):
    """hlo_stats DataTable rows -> (bucket table, top ops).

    Returns ({bucket: {"ms": per-step ms, "ops": n}}, [(self_ms, occ,
    bucket, name), ...] sorted desc). `rows` is the google.visualization
    row list: row["c"][i]["v"] with columns (rank, program_id, category,
    hlo_op_name, hlo_op_expression, tf_op_name, occurrences, total_time,
    avg_time, total_self_time, avg_self_time, ...)."""
    table = {b: {"ms": 0.0, "ops": 0} for b in BUCKETS}
    tops = []
    for row in rows:
        c = [cell.get("v") for cell in row["c"]]
        category, name, expr = str(c[2]), str(c[3]), str(c[4])
        occurrences = int(c[6] or 0)
        self_us = float(c[9] or 0.0)
        b = bucket_of(category, name, expr)
        ms = self_us / 1000.0 / max(steps, 1)
        table[b]["ms"] += ms
        table[b]["ops"] += 1
        tops.append((ms, occurrences, b, name))
    tops.sort(reverse=True)
    return table, tops


def render(table, tops, steps: int, batch: int, top_k: int) -> str:
    total = sum(v["ms"] for v in table.values())
    lines = [f"per-step device time ({steps} traced steps, batch {batch}):",
             "",
             "| bucket | ms/step | % | ops |",
             "|---|---|---|---|"]
    for b in BUCKETS:
        v = table[b]
        if v["ops"] == 0:
            continue
        lines.append(f"| {b} | {v['ms']:.2f} | "
                     f"{100 * v['ms'] / max(total, 1e-9):.1f}% | {v['ops']} |")
    lines.append(f"| **total** | **{total:.2f}** | 100% | "
                 f"{sum(v['ops'] for v in table.values())} |")
    if total > 0:
        lines.append("")
        lines.append(f"device-bound throughput bound: "
                     f"{batch / (total / 1000.0):.1f} img/s "
                     f"(batch {batch} / {total:.1f} ms)")
    if top_k > 0:
        lines.append("")
        lines.append(f"top {top_k} ops by self time:")
        for ms, occ, b, name in tops[:top_k]:
            lines.append(f"  {ms:8.3f} ms  x{occ:<4d} [{b.split(' (')[0]}] "
                         f"{name}")
    return "\n".join(lines)


def hlo_stats_rows(trace_dir: str):
    """Convert the newest xplane capture under `trace_dir` to hlo_stats rows."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as r2t
    out, _ = r2t.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    data = json.loads(out.decode() if isinstance(out, bytes) else out)
    return data["rows"]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="vit_base_patch16_224",
                   help="name from models.vit.VIT_CONFIGS")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=3,
                   help="steps inside the trace window (after 1 warmup)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--trace_dir", default=None,
                   help="where to write the trace (kept for TensorBoard); "
                        "default: a temp dir, deleted after the table")
    p.add_argument("--top", type=int, default=12,
                   help="also list the top-K ops by self time (0 = off)")
    p.add_argument("--raw", default=None,
                   help="dump the raw hlo_stats JSON table to this path")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--grad_accum", type=int, default=1)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import numpy as np
    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from ..core.configs import ViTTrainConfig
    from ..models import vit as vvit
    from ..parallel import mesh as vmesh
    from ..train.vit_loop import ViTTrainer, sgd_init

    vit_cfg = vvit.VIT_CONFIGS[args.model]
    tcfg = ViTTrainConfig(batch_size=args.batch,
                          compute_dtype=args.compute_dtype,
                          remat=args.remat, grad_accum=args.grad_accum)
    mesh = vmesh.make_mesh()
    trainer = ViTTrainer(vit_cfg, tcfg, mesh)
    params = vmesh.replicate(mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), vit_cfg))
    buf = vmesh.replicate(mesh, sgd_init(params))
    rs = np.random.RandomState(0)
    n = args.batch * mesh.devices.size
    side = vit_cfg.image_size
    images = rs.randint(0, 255, (n, side, side, 3), np.uint8)
    labels = rs.randint(0, vit_cfg.num_classes or 1000, n).astype(np.int32)
    si, sl = trainer.shard(images, labels)
    step = trainer._make_train_step(None)
    key = jax.random.PRNGKey(1)

    # compile + warm (sync via host transfer — block_until_ready does not
    # wait for remote execution on tunneled backends, see bench.py)
    params, buf, loss = step(params, buf, si, sl, 0.1, key, 0.1)
    float(loss)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="vitprof_")
    with jax.profiler.trace(trace_dir):
        acc = loss * 0
        for _ in range(args.steps):
            params, buf, loss = step(params, buf, si, sl, 0.1, key, 0.1)
            acc = acc + loss
        float(acc)  # one sync depending on every traced step

    rows = hlo_stats_rows(trace_dir)
    if args.raw:
        with open(args.raw, "w") as f:
            json.dump(rows, f)
    table, tops = summarize(rows, args.steps)
    print(render(table, tops, args.steps, n, args.top))
    if args.trace_dir:
        print(f"\ntrace kept at {trace_dir} (tensorboard --logdir {trace_dir})")
    else:
        import shutil
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
