"""Driver-entry regression tests.

Round-1 failure mode: the driver imports __graft_entry__ in a process whose
JAX backend is already initialized with ONE real chip and calls
dryrun_multichip(n) directly — the dryrun must self-provision an n-device
virtual CPU mesh (it re-execs in a subprocess), not assert on the caller's
device count (MULTICHIP_r01.json: rc=1, "need 8 devices, have 1").
"""
import importlib.util
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _load_graft_entry():
    spec = importlib.util.spec_from_file_location(
        "graft_entry_under_test", ROOT / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_self_provisions(capfd):
    # The calling process (this test) sees 8 CPU devices, but the dryrun must
    # not depend on that: it re-execs with its own forced device count.
    g = _load_graft_entry()
    g.dryrun_multichip(2)
    out = capfd.readouterr().out
    assert "dryrun_multichip(2)" in out and "OK" in out


def test_entry_compiles_single_device():
    import jax
    g = _load_graft_entry()
    fn, example_args = g.entry()
    logits = jax.jit(fn)(*example_args)
    assert logits.shape == (8, 1000)


def test_dryrun_guard_trips_on_involuntary_remat(monkeypatch):
    """A sharding regression that makes GSPMD fall back to replicate-then-
    repartition must FAIL the dryrun even when the step still runs (rc=0):
    the guard matches the SPMD warning on the subprocess's stderr."""
    import subprocess
    import types

    g = _load_graft_entry()

    def fake_run(*a, **k):
        return types.SimpleNamespace(
            returncode=0, stdout="dryrun_multichip(8): ... - OK\n",
            stderr="W0000 spmd_partitioner.cc:652] [SPMD] Involuntary full "
                   "rematerialization. The compiler cannot go from sharding "
                   "{devices=[8,1,1,1]<=[8]} to {devices=[1,2,1,1,4]<=[8]}"
                   " ...\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    try:
        g.dryrun_multichip(8)
    except RuntimeError as e:
        assert "full-rematerialization" in str(e)
    else:
        raise AssertionError("guard did not trip on the seeded warning")
