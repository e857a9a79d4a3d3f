"""Unit tests for the step profiler's pure classification/summary layer
(cli/profile.py). The converter path needs a real TPU plane (hlo_stats is
empty for host-CPU traces), so the device run is exercised on hardware via
the CLI itself; here we pin the bucketing contract on synthetic tables."""
import json

from vit_project_tpu.cli import profile as prof


def _row(category, name, expr, occ, self_us):
    # google.visualization DataTable row with the hlo_stats column order
    cells = [1, "p1", category, name, expr, "tf_op", occ,
             self_us, self_us / max(occ, 1), self_us, self_us / max(occ, 1)]
    return {"c": [{"v": v} for v in cells]}


# Rows mirror the REAL TPU hlo_stats taxonomy of the production step
# (see bucket_of's docstring; raw dump in BENCHLOG.md round 3 cont.)
ROWS = [
    # dense forward fc1 matmul with fused LN/bias epilogue
    _row("convolution fusion", "convolution_add_fusion.5",
         "bf16[256,197,3072] fusion(...)", 12, 30000.0),
    # dx matmul fusion
    _row("convolution fusion", "fusion.1346",
         "(bf16[3072], bf16[256,197,3072]) fusion(...)", 12, 9000.0),
    # dW matmul fused with the SGD update
    _row("convolution fusion", "multiply_subtract_fusion.4",
         "(f32[3072,768], f32[3072,768]) fusion(...)", 12, 18000.0),
    # pallas attention kernels: custom-calls; autodiff names the backward
    # transpose_jvp___*, the forward jvp__*
    _row("custom-call", "jvp__.3",
         "bf16[256,197,768] custom-call(...)", 12, 4200.0),
    _row("custom-call", "transpose_jvp___.15",
         "bf16[256,197,2304] custom-call(...)", 12, 7800.0),
    # bandwidth glue
    _row("reduce", "reduce_sum.5", "f32[768] reduce(...)", 25, 7200.0),
    _row("loop fusion", "multiply_multiply_fusion.48",
         "f32[256,197] fusion(...)", 10, 1100.0),
    # transfers/layout
    _row("copy-done", "copy-done.839", "f32[3072,768] copy-done(...)",
         4, 700.0),
    _row("async-start", "slice-start.2", "async-start(...)", 4, 10.0),
    # uncategorized
    _row("rng", "rng.1", "rng-bit-generator", 1, 50.0),
]


class TestBucketing:
    def test_each_row_lands_in_its_bucket(self):
        got = [prof.bucket_of(str(r["c"][2]["v"]), str(r["c"][3]["v"]),
                              str(r["c"][4]["v"])) for r in ROWS]
        assert got == [prof.BUCKETS[0], prof.BUCKETS[0], prof.BUCKETS[1],
                       prof.BUCKETS[2], prof.BUCKETS[3], prof.BUCKETS[4],
                       prof.BUCKETS[4], prof.BUCKETS[5], prof.BUCKETS[5],
                       prof.BUCKETS[6]]

    def test_summarize_per_step_ms_and_totals(self):
        table, tops = prof.summarize(ROWS, steps=3)
        # dense: (30 + 9) ms total self over 3 steps -> 13 ms/step
        assert abs(table[prof.BUCKETS[0]]["ms"] - 13.0) < 1e-9
        assert abs(table[prof.BUCKETS[1]]["ms"] - 6.0) < 1e-9
        assert abs(table[prof.BUCKETS[2]]["ms"] - 1.4) < 1e-9
        assert abs(table[prof.BUCKETS[3]]["ms"] - 2.6) < 1e-9
        # reduce + loop-fusion glue share one bucket
        assert table[prof.BUCKETS[4]]["ops"] == 2
        assert table[prof.BUCKETS[5]]["ops"] == 2
        total = sum(v["ms"] for v in table.values())
        assert abs(total - sum(float(r["c"][9]["v"]) for r in ROWS)
                   / 1000.0 / 3) < 1e-9
        # tops sorted descending by ms
        assert [t[0] for t in tops] == sorted([t[0] for t in tops],
                                              reverse=True)
        assert tops[0][3] == "convolution_add_fusion.5"

    def test_render_table_and_throughput_bound(self):
        table, tops = prof.summarize(ROWS, steps=3)
        out = prof.render(table, tops, steps=3, batch=256, top_k=3)
        assert "| bucket | ms/step |" in out
        assert "**total**" in out
        # 256 / (23.0166... ms) ~= 11122 img/s
        assert "device-bound throughput bound" in out
        assert "convolution_add_fusion.5" in out

    def test_summarize_handles_null_cells(self):
        rows = [_row("fusion", "f", "dot( lhs_contracting_dims={2}", 0, 0.0)]
        rows[0]["c"][9]["v"] = None
        table, _ = prof.summarize(rows, steps=1)
        assert table[prof.BUCKETS[0]]["ms"] == 0.0

    def test_rows_roundtrip_json(self, tmp_path):
        # the --raw dump is plain JSON of the rows
        p = tmp_path / "raw.json"
        p.write_text(json.dumps(ROWS))
        assert json.loads(p.read_text())[0]["c"][2]["v"] == "convolution fusion"


class TestMemoryMode:
    """--memory: abstract lowering + XLA buffer-assignment stats. Runs on
    the test env's 8-virtual-device CPU mesh — the whole point of the mode
    is that it needs no real chip."""

    def _stats(self, **kw):
        kw.setdefault("compute_dtype", "float32")
        return prof.analyze_memory("test-tiny", 4, **kw)

    def test_dp_stats_and_render(self):
        ma, n_dev, gb = self._stats()
        assert n_dev == 8
        assert ma.peak_memory_in_bytes > 0
        assert ma.argument_size_in_bytes > 0
        assert gb["params"] == gb["momentum"] > 0
        out = prof.render_memory(ma, n_dev, gb)
        assert "compiled per-device memory (SPMD over 8 device(s))" in out
        assert "peak live" in out and "global (unsharded)" in out

    def test_fsdp_and_zero1_shrink_per_device_arguments(self):
        # dp: params + momentum replicated per device; zero1: momentum 1/8;
        # fsdp: both 1/8 — strict ordering of per-device argument bytes
        # (the batch shards over 'data' identically in all three)
        dp = self._stats()[0].argument_size_in_bytes
        z1 = self._stats(zero1=True)[0].argument_size_in_bytes
        fs = self._stats(fsdp=True)[0].argument_size_in_bytes
        assert fs < z1 < dp, (fs, z1, dp)

    def test_cli_prints_table(self, capsys):
        rc = prof.main(["--memory", "--model", "test-tiny", "--batch", "4",
                        "--compute_dtype", "float32", "--fsdp"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "fsdp" in out and "| buffer class | bytes/device |" in out

    def test_trace_mode_refuses_memory_only_flags(self):
        import pytest
        with pytest.raises(SystemExit):
            prof.main(["--fsdp", "--model", "test-tiny"])
        with pytest.raises(SystemExit):
            prof.main(["--virtual_devices", "4", "--model", "test-tiny"])
