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

`--memory` is the compile-only sibling: it lowers the SAME production step
abstractly (ShapeDtypeStruct args — no weights materialized, no execution)
and prints XLA's buffer-assignment memory analysis (arguments / donated /
outputs / temps / peak, per device), the fits-on-chip planner for
`--remat`, `--grad_accum`, `--fsdp`, `--zero1`. Runs on any backend;
`--virtual_devices N` re-execs over an N-device virtual CPU mesh to plan
pod memory from a chipless host:

    python -m vit_project_tpu.cli.profile --memory --batch 64 \
        --fsdp --virtual_devices 8

Backend fidelity: on TPU the temp figure is the real liveness-based HBM
arena, so --remat's activation savings show up. The CPU backend allocates
buffers individually and reports temps WITHOUT liveness reuse — argument/
sharding effects (fsdp/zero1/tp batch sizing, grad_accum's smaller
microbatch buffers) are exact there, but remat is invisible; the CLI
prints a caveat when that applies.
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


def _mib(n: float) -> str:
    return f"{n / (1 << 20):,.1f} MiB"


def tree_bytes(shapes) -> int:
    """Global (unsharded) bytes of a ShapeDtypeStruct / array pytree."""
    import jax
    import numpy as np
    return sum(int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
               for x in jax.tree_util.tree_leaves(shapes))


def render_memory(ma, n_dev: int, global_bytes: dict) -> str:
    """CompiledMemoryStats + global tree sizes -> the planning table.

    Every XLA figure is PER DEVICE (the SPMD module is per-device); the
    `global_bytes` dict gives the unsharded tree sizes for contrast, so the
    fsdp/zero1 sharding factor is visible at a glance."""
    lines = [f"compiled per-device memory (SPMD over {n_dev} device(s)):",
             "",
             "| buffer class | bytes/device |",
             "|---|---|",
             f"| arguments (params + momentum + batch) | "
             f"{_mib(ma.argument_size_in_bytes)} |",
             f"| donated/aliased (params, momentum -> outputs) | "
             f"{_mib(ma.alias_size_in_bytes)} |",
             f"| outputs | {_mib(ma.output_size_in_bytes)} |",
             f"| temps (activations, grads, collectives) | "
             f"{_mib(ma.temp_size_in_bytes)} |",
             f"| **peak live** | **{_mib(ma.peak_memory_in_bytes)}** |",
             f"| generated code | {_mib(ma.generated_code_size_in_bytes)} |",
             "",
             "global (unsharded) tree sizes for reference:"]
    for name, b in global_bytes.items():
        lines.append(f"  {name}: {_mib(b)} ({_mib(b / n_dev)}/device if "
                     "fully sharded)")
    return "\n".join(lines)


def analyze_memory(model: str, batch: int, *, compute_dtype="bfloat16",
                   remat=False, grad_accum=1, fsdp=False, zero1=False):
    """Abstractly lower + compile the production train step at the given
    flags and return (CompiledMemoryStats, n_devices, global_bytes dict) —
    the fits-on-chip planner for --remat/--grad_accum/--fsdp/--zero1. No
    step is executed and no weights are materialized (ShapeDtypeStruct
    lowering), so it runs anywhere, including a chipless host."""
    import jax
    import numpy as np
    from ..core.configs import ViTTrainConfig
    from ..models import vit as vvit
    from ..parallel import mesh as vmesh
    from ..train.vit_loop import ViTTrainer

    vit_cfg = vvit.VIT_CONFIGS[model]
    tcfg = ViTTrainConfig(batch_size=batch, compute_dtype=compute_dtype,
                          remat=remat, grad_accum=grad_accum,
                          fsdp=fsdp, zero1=zero1)
    mesh = vmesh.make_mesh()
    trainer = ViTTrainer(vit_cfg, tcfg, mesh)
    # key passed as an eval_shape ARGUMENT so the init traces abstractly
    # (a closed-over concrete key would constant-fold the init eagerly)
    pshapes = jax.eval_shape(lambda k: vvit.init_vit_params(k, vit_cfg),
                             jax.random.PRNGKey(0))

    rep = vmesh.replicated(mesh)
    pshard = ((lambda x: vmesh.fsdp_sharding(mesh, x)) if fsdp
              else (lambda x: rep))
    bshard = ((lambda x: vmesh.fsdp_sharding(mesh, x)) if fsdp
              else (lambda x: vmesh.zero1_sharding(mesh, x)) if zero1
              else (lambda x: rep))

    def sds(tree, sh):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh(x)),
            tree)

    n_dev = mesh.devices.size
    n = batch * n_dev
    side = vit_cfg.image_size
    ds = vmesh.data_sharding(mesh)
    img_s = jax.ShapeDtypeStruct((n, side, side, 3), np.dtype(np.uint8),
                                 sharding=ds)
    lbl_s = jax.ShapeDtypeStruct((n,), np.dtype(np.int32), sharding=ds)
    step = trainer._make_train_step(None)
    lowered = step.lower(sds(pshapes, pshard), sds(pshapes, bshard),
                         img_s, lbl_s, 0.1, jax.random.PRNGKey(1), 0.1)
    ma = lowered.compile().memory_analysis()
    global_bytes = {
        "params": tree_bytes(pshapes),
        "momentum": tree_bytes(pshapes),
        "batch (uint8 images + labels)": (tree_bytes([img_s])
                                          + tree_bytes([lbl_s])),
    }
    return ma, n_dev, global_bytes


def _memory_main(args) -> int:
    ma, n_dev, global_bytes = analyze_memory(
        args.model, args.batch, compute_dtype=args.compute_dtype,
        remat=args.remat, grad_accum=args.grad_accum,
        fsdp=args.fsdp, zero1=args.zero1)
    flags = [f for f, on in (("remat", args.remat), ("fsdp", args.fsdp),
                             ("zero1", args.zero1)) if on]
    if args.grad_accum > 1:
        flags.append(f"grad_accum={args.grad_accum}")
    print(f"{args.model} train step, global batch {args.batch * n_dev}, "
          f"{args.compute_dtype}" + (f", {'+'.join(flags)}" if flags else ""))
    print(render_memory(ma, n_dev, global_bytes))
    import jax
    if jax.default_backend() != "tpu":
        print("\nNOTE: non-TPU backend — temps/peak lack liveness reuse "
              "(remat savings are invisible here; argument/sharding and "
              "grad_accum figures are exact). Run on the TPU for the true "
              "HBM arena.")
    return 0


def _reexec_virtual(args, argv) -> int:
    """Re-run this CLI in a subprocess seeing N virtual CPU devices (the
    dryrun_multichip recipe — the calling process may already have pinned a
    1-chip backend, which cannot be undone in-process)."""
    import subprocess
    import sys

    from ..core.vdev import virtual_cpu_env
    env = virtual_cpu_env(args.virtual_devices)
    child = list(argv)
    if "--virtual_devices" in child:  # split form: flag + value
        i = child.index("--virtual_devices")
        del child[i:i + 2]
    else:  # --virtual_devices=N form
        child = [a for a in child
                 if not a.startswith("--virtual_devices=")]
    return subprocess.run(
        [sys.executable, "-m", "vit_project_tpu.cli.profile"] + child,
        env=env).returncode


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
    p.add_argument("--fused_dw", action="store_true",
                   help="route dense backward through the streaming Pallas "
                        "dW+bias-grad kernel (ops/fused_dw.py)")
    p.add_argument("--memory", action="store_true",
                   help="compile-only: print XLA's per-device memory "
                        "analysis of the step instead of tracing execution "
                        "(no weights materialized, runs without a TPU)")
    p.add_argument("--fsdp", action="store_true",
                   help="analyze the FSDP/ZeRO-3 step (params + momentum "
                        "sharded 1/N; --memory mode)")
    p.add_argument("--zero1", action="store_true",
                   help="analyze the ZeRO-1 step (momentum sharded 1/N; "
                        "--memory mode)")
    p.add_argument("--virtual_devices", type=int, default=None,
                   help="with --memory: re-exec over an N-device virtual "
                        "CPU mesh (plan pod memory from any host)")
    return p.parse_args(argv)


def main(argv=None):
    import sys
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    args = parse_args(argv)
    if args.virtual_devices and not args.memory:
        raise SystemExit("--virtual_devices is a --memory planning option "
                         "(tracing needs real devices)")
    if args.memory:
        if args.virtual_devices:
            return _reexec_virtual(args, argv)
        return _memory_main(args)
    if args.fsdp or args.zero1:
        raise SystemExit("--fsdp/--zero1 profiling applies to --memory mode; "
                         "trace mode runs the plain dp step")
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
                          remat=args.remat, grad_accum=args.grad_accum,
                          fused_dw=args.fused_dw)
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

    try:
        rows = hlo_stats_rows(trace_dir)
        if args.raw:
            with open(args.raw, "w") as f:
                json.dump(rows, f)
        table, tops = summarize(rows, args.steps)
        print(render(table, tops, args.steps, n, args.top))
    finally:
        # a failed hlo_stats conversion must not leak the capture (hundreds
        # of MB for real steps) when we own the temp dir
        if args.trace_dir:
            print(f"\ntrace kept at {trace_dir} "
                  f"(tensorboard --logdir {trace_dir})")
        else:
            import shutil
            shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
