"""Bounded background-thread feeder: run a producer generator on its own
thread and deliver its items through a depth-bounded queue.

The ONE home for the overlap-stage discipline shared by the input pipeline
(decode overlap, data/imagenet.ImageFolderLoader.epoch) and the device
feeder (h2d overlap, train/vit_loop._device_prefetch):

- puts keep watching a stop event, so an abandoned consumer (generator
  closed mid-epoch) can never leave the thread blocked on a full queue;
- any producer exception is DELIVERED to the consumer (re-raised from the
  feeder) instead of dying silently in the thread — a dead producer with no
  sentinel would leave the consumer blocked in q.get() forever;
- the consumer's finally sets stop and joins the thread.
"""
from __future__ import annotations

import queue as _queue
import threading


def feed(producer, depth: int):
    """Yield `producer`'s items, produced on a feeder thread, through a
    queue of the given depth (depth items may be in flight ahead of the
    consumer). depth <= 0 means NO lookahead: consume synchronously on the
    caller's thread (Queue(maxsize=0) would be UNBOUNDED — the producer
    would race a whole epoch into memory, the opposite of what a caller
    passing 0 asked for)."""
    if depth <= 0:
        yield from producer
        return
    q: _queue.Queue = _queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.05)
                return True
            except _queue.Full:
                continue
        return False

    def run():
        try:
            for item in producer:
                if stop.is_set():
                    return
                if not put(item):
                    return
        except BaseException as e:  # noqa: BLE001 - forwarded, not dropped
            put(e)
            return
        put(None)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        t.join(timeout=10.0)
