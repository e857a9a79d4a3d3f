"""Multi-host data path: loader sharding (DistributedSampler semantics) and
the dataset-order RSA gather.

The sharding logic itself is pure Python/numpy, so it is tested directly for
N processes without spawning them; the true 2-process jax.distributed CPU
drive (examples/multihost_cpu_demo.py) is exercised end-to-end as a
subprocess in TestTwoProcessDistributed.
"""
import os

import numpy as np
import pytest

from vit_project_tpu.data.imagenet import ImageFolderLoader
from vit_project_tpu.parallel import dist


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("shardfolder")
    rs = np.random.RandomState(0)
    for ci, cls in enumerate(("a", "b", "c")):
        d = root / cls
        os.makedirs(d)
        for i in range(7):  # 21 images, deliberately not divisible by shards
            Image.fromarray(rs.randint(0, 255, (16, 16, 3),
                                       dtype=np.uint8)).save(d / f"{i}.png")
    return str(root)


class TestLoaderSharding:
    def _collect(self, loader, epoch):
        labels = []
        for _, lb in loader.epoch(epoch):
            labels.append(lb)
        return np.concatenate(labels) if labels else np.zeros(0, np.int32)

    def _indices(self, root, num_shards, shard_id, epoch, train=True):
        ld = ImageFolderLoader(root, 4, train=train, seed=3,
                               num_shards=num_shards, shard_id=shard_id)
        n = len(ld.paths)
        if train:
            rng = np.random.Generator(np.random.PCG64([3, epoch]))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        total = ld._shard_len() * num_shards
        if total > n:
            order = np.concatenate([order, order[:total - n]])
        return order[shard_id::num_shards]

    def test_shards_cover_dataset_with_wrap_padding(self, folder):
        # reference DistributedSampler: shards are equal-size, disjoint up to
        # the wrapped tail, and their union covers every sample
        all_idx = [self._indices(folder, 4, s, epoch=1) for s in range(4)]
        sizes = {len(ix) for ix in all_idx}
        assert len(sizes) == 1                      # equal per-shard counts
        union = np.concatenate(all_idx)
        assert len(union) == 24                     # 21 wrapped up to 24
        assert set(union.tolist()) == set(range(21))  # full coverage

    def test_shard_batches_match_index_contract(self, folder):
        ld = ImageFolderLoader(folder, 4, train=True, seed=3,
                               num_shards=2, shard_id=1)
        got = self._collect(ld, epoch=2)
        want_idx = self._indices(folder, 2, 1, epoch=2)
        assert np.array_equal(got, ld.labels[want_idx])

    def test_single_shard_unchanged(self, folder):
        a = ImageFolderLoader(folder, 4, train=True, seed=3)
        b = ImageFolderLoader(folder, 4, train=True, seed=3,
                              num_shards=1, shard_id=0)
        np.testing.assert_array_equal(self._collect(a, 0), self._collect(b, 0))

    def test_val_shards_are_strided_dataset_order(self, folder):
        idx0 = self._indices(folder, 3, 0, epoch=0, train=False)
        assert np.array_equal(idx0, np.arange(0, 21, 3))
        idx1 = self._indices(folder, 3, 1, epoch=0, train=False)
        assert np.array_equal(idx1, np.arange(1, 21, 3))


class TestOrderedGather:
    def test_single_process_passthrough(self):
        x = np.arange(12).reshape(6, 2)
        out = dist.ordered_allgather_strided(x, 5)
        np.testing.assert_array_equal(out, x[:5])

    def test_interleave_reconstruction_math(self):
        # simulate what process_allgather returns for 3 strided shards and
        # check the reorder restores dataset order (the reference's rank-
        # order concatenation does NOT — SURVEY.md section 0 defect)
        n, P = 10, 3
        data = np.arange(n * 4).reshape(n, 4)
        per = (n + P - 1) // P
        shards = []
        for p in range(P):
            idx = np.arange(p, P * per, P) % n
            shards.append(data[idx])
        stacked = np.stack(shards)                   # [P, per, 4]
        out = np.swapaxes(stacked, 0, 1).reshape(-1, 4)[:n]
        np.testing.assert_array_equal(out, data)


class TestDataEcho:
    def test_each_batch_repeats_echo_times(self, folder):
        base = ImageFolderLoader(folder, 4, train=True, seed=5, size=16,
                                 workers=2, drop_last=True)
        echoed = ImageFolderLoader(folder, 4, train=True, seed=5, size=16,
                                   workers=2, drop_last=True, echo=3)
        assert len(echoed) == 3 * len(base)
        b = [lb for _, lb in base.epoch(2)]
        e = [lb for _, lb in echoed.epoch(2)]
        assert len(e) == 3 * len(b)
        for i, lb in enumerate(b):
            for k in range(3):
                np.testing.assert_array_equal(e[3 * i + k], lb)


class TestLoaderAbandonment:
    def test_producer_thread_exits_when_consumer_abandons(self, folder):
        """Closing the epoch generator mid-iteration must not leave the
        producer thread blocked in q.put on a full prefetch queue."""
        import threading
        before = set(threading.enumerate())
        ld = ImageFolderLoader(folder, 2, train=True, seed=0, size=16,
                               workers=2, prefetch=1)
        it = ld.epoch(0)
        next(it)   # producer started; prefetch queue fills and put() blocks
        it.close()  # abandon mid-epoch -> generator finally joins the producer
        leftover = [t for t in set(threading.enumerate()) - before
                    if t.is_alive()]
        assert leftover == [], f"leaked threads: {leftover}"


class TestProducerFailure:
    def test_corrupt_image_raises_instead_of_hanging(self, folder, tmp_path):
        """A decode failure in the producer thread must surface in the
        consumer (re-raised from epoch()), not strand it in q.get()."""
        import shutil
        root = tmp_path / "corrupt"
        shutil.copytree(folder, root)
        bad = root / "a" / "0.png"
        bad.write_bytes(b"not an image at all")
        ld = ImageFolderLoader(str(root), 21, train=False, size=16, workers=2)
        with pytest.raises(Exception) as ei:
            for _ in ld.epoch(0):
                pass
        assert "image" in str(ei.value).lower() or "identify" in \
            str(ei.value).lower() or isinstance(ei.value, OSError)


class TestSetupDistributed:
    """Init-failure handling: multi-process intent must be loud (a swallowed
    rendezvous failure degrades a pod into N independent 'process 0' runs),
    while double-init and single-process stay silent."""

    def test_rendezvous_failure_reraises(self, monkeypatch):
        import jax

        def boom(**kw):
            raise RuntimeError("connection to coordinator failed")
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="coordinator"):
            dist.setup_distributed(coordinator_address="10.0.0.1:1234",
                                   num_processes=2, process_id=0)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        with pytest.raises(RuntimeError, match="coordinator"):
            dist.setup_distributed()

    def test_stale_coordinator_port_reraises(self, monkeypatch):
        # "address already in use" contains "already" but is a REAL failure
        # (stale coordinator holding the port), not an idempotent re-init.
        import jax

        def port_taken(**kw):
            raise RuntimeError("bind failed: Address already in use")
        monkeypatch.setattr(jax.distributed, "initialize", port_taken)
        with pytest.raises(RuntimeError, match="already in use"):
            dist.setup_distributed(coordinator_address="10.0.0.1:1234",
                                   num_processes=2, process_id=0)

    def test_double_init_absorbed(self, monkeypatch):
        import jax

        def already(**kw):
            raise RuntimeError("distributed.initialize should only be "
                               "called once.")
        monkeypatch.setattr(jax.distributed, "initialize", already)
        idx, count = dist.setup_distributed(
            coordinator_address="10.0.0.1:1234", num_processes=2, process_id=0)
        assert (idx, count) == (jax.process_index(), jax.process_count())

    def test_single_process_never_initializes(self, monkeypatch):
        import jax

        def forbidden(**kw):  # no intent -> initialize must not be called
            raise AssertionError("initialize called without multi-process intent")
        monkeypatch.setattr(jax.distributed, "initialize", forbidden)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert dist.setup_distributed()[1] >= 1

    def test_is_primary_single_process_avoids_backend_init(self, monkeypatch):
        """is_primary() in a plain single process must answer True WITHOUT
        jax.process_index(): that call forces accelerator-backend init, which
        the sweep --workers dispatcher must avoid (on a TPU VM the parent
        would acquire every chip its workers are about to pin)."""
        import jax

        def forbidden():
            raise AssertionError("process_index() forces backend init")
        monkeypatch.setattr(jax, "process_index", forbidden)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        assert dist.is_primary() is True
        # with jax.distributed initialized, the real rank decides
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
        monkeypatch.setattr(jax, "process_index", lambda: 3)
        assert dist.is_primary() is False

    def test_is_primary_stale_env_avoids_backend_init(self, monkeypatch):
        """Stale coordinator env vars (e.g. left by a previous pod launcher)
        must NOT make the uninitialized path fall through to
        jax.process_index() — before initialize() the backend could only
        report 0 anyway, and the call acquires every local chip out from
        under a --workers dispatcher. The rendezvous rank env var decides
        instead, when present."""
        import jax

        def forbidden():
            raise AssertionError("process_index() forces backend init")
        monkeypatch.setattr(jax, "process_index", forbidden)
        monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
        monkeypatch.delenv("PROCESS_ID", raising=False)
        assert dist.is_primary() is True
        monkeypatch.setenv("JAX_PROCESS_ID", "0")
        assert dist.is_primary() is True
        monkeypatch.setenv("JAX_PROCESS_ID", "3")
        assert dist.is_primary() is False


class TestTwoProcessDistributed:
    def test_multihost_cpu_demo_end_to_end(self):
        """Spawns 2 coordinated jax.distributed CPU processes: disjoint
        loader shards -> global dp train step (XLA grad all-reduce) ->
        dataset-order RSA gather equal to the single-process oracle."""
        import pathlib
        import subprocess
        import sys
        demo = pathlib.Path(__file__).resolve().parents[1] / "examples" / \
            "multihost_cpu_demo.py"
        env = dict(os.environ)
        env.pop("MH_DEMO_PORT", None)  # demo picks a free port itself
        env.pop("XLA_FLAGS", None)  # workers set their own device count
        env.pop("JAX_PLATFORMS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # skip remote-plugin startup
        out = subprocess.run([sys.executable, str(demo)], env=env,
                             capture_output=True, text=True, timeout=3000)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "multihost_cpu_demo: OK" in out.stdout
