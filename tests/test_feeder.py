"""Unit tests for core/feeder.py — the bounded background feeder shared by
the input pipeline and the device prefetcher, including the abandoned-
producer leak registry (a producer wedged inside one long native-decode
work unit can outlive the consumer's abandonment join; VERDICT round-3
weak #6)."""
import threading
import time

from vit_project_tpu.core import feeder


def test_passthrough_order_and_completion():
    assert list(feeder.feed(iter(range(17)), depth=3)) == list(range(17))


def test_depth_zero_is_synchronous():
    ident = []

    def producer():
        for i in range(3):
            ident.append(threading.get_ident())
            yield i

    assert list(feeder.feed(producer(), depth=0)) == [0, 1, 2]
    assert set(ident) == {threading.get_ident()}


def test_producer_exception_delivered():
    def producer():
        yield 1
        raise RuntimeError("decode failed")

    g = feeder.feed(producer(), depth=2)
    assert next(g) == 1
    try:
        next(g)
    except RuntimeError as e:
        assert "decode failed" in str(e)
    else:
        raise AssertionError("producer exception was not re-raised")


def test_wedged_producer_is_tracked_then_reaped():
    """Abandoning a consumer while the producer is wedged inside ONE long
    work unit must (1) not block the consumer past the join timeout,
    (2) land the thread in the leak registry, and (3) reap it once the
    work unit completes and the thread drains on the stop event."""
    feeder.reap_leaked()  # isolate from any earlier test's threads
    base = feeder.leaked_count()
    release = threading.Event()
    wedged = threading.Event()

    def producer():
        yield 1
        wedged.set()
        # one long "work unit" that cannot observe the stop event —
        # the shape of a native batch decode
        release.wait(30)
        yield 2

    g = feeder.feed(producer(), depth=1, abandon_join_timeout=0.2)
    assert next(g) == 1
    assert wedged.wait(5)
    t0 = time.perf_counter()
    g.close()  # abandon mid-epoch
    assert time.perf_counter() - t0 < 5, "abandonment join did not bound"
    assert feeder.leaked_count() == base + 1

    release.set()  # the work unit returns; the thread sees stop and exits
    deadline = time.time() + 10
    while feeder.reap_leaked() > base and time.time() < deadline:
        time.sleep(0.02)
    assert feeder.reap_leaked() == base


def test_fast_abandonment_leaves_no_leak():
    feeder.reap_leaked()
    base = feeder.leaked_count()
    g = feeder.feed(iter(range(100)), depth=2)
    assert next(g) == 0
    g.close()
    assert feeder.leaked_count() == base
