"""Preemption-safe training: catch SIGTERM, checkpoint, exit resumable.

TPU capacity is routinely preemptible (spot/queued v5e slices get ~30 s of
SIGTERM notice before the VM is killed). The reference has no equivalent —
its recovery story is per-epoch checkpoints + auto-resume
(train_vit_sgd.py:320-335), which loses the whole in-flight epoch on
preemption. Here a `PreemptionGuard` turns the notice into a MID-EPOCH
checkpoint: the batch loop finishes its current step, the loop state
(params, momentum, scheduler, epoch, batch index, running loss) is written
atomically, and the process exits; the next invocation replays the
deterministic loader to the saved batch index and continues BIT-EXACTLY
(every stream is keyed, so the resumed tail reproduces the uninterrupted
run — tests/test_vit_training.py asserts equality).

Scope: mid-epoch save is a SINGLE-PROCESS feature. On a multi-host pod,
signal delivery is not synchronized across hosts, and a host that stops at
batch k while another stops at k+1 would desync the collective program —
`should_stop()` therefore always answers False when jax.process_count() > 1
and preemption falls back to the per-epoch checkpoint cadence (which is
collective-safe because every host completes the same epoch).
"""
from __future__ import annotations

import signal
import threading


def exit_if_undispatched(guard) -> None:
    """Shared CLI epilogue for the batched drivers: when a preemption left
    runs/conditions undispatched, exit 143 so orchestration re-queues. The
    caller must NOT have reported those items as failed first — a worker
    dispatcher reading a failed-report file would otherwise account the
    preempted worker as cleanly finished (see cli/sweep.py)."""
    if getattr(guard, "undispatched", None):
        import sys
        sys.exit(143)


class PreemptionGuard:
    """Signal-flag holder with scoped handler installation.

    Use as a context manager around the training loop; `should_stop()` is
    polled at batch boundaries. `request()` triggers programmatically (used
    by tests and by SDK callers that learn of preemption out-of-band, e.g.
    from the GCE metadata server)."""

    #: handled by default: SIGTERM is what spot/queued-resource preemption
    #: delivers. SIGINT is deliberately NOT claimed (Ctrl-C keeps its
    #: KeyboardInterrupt semantics).
    DEFAULT_SIGNALS = (signal.SIGTERM,)

    def __init__(self, signals=DEFAULT_SIGNALS):
        self._signals = tuple(signals)
        self._event = threading.Event()
        self._prev: dict = {}
        self.signaled_by: int | None = None

    # -- flag ----------------------------------------------------------------

    def request(self) -> None:
        self._event.set()

    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def should_stop(self) -> bool:
        """True when a mid-epoch stop is both requested AND safe (single
        process — see module docstring for the pod rationale)."""
        if not self._event.is_set():
            return False
        import jax
        return jax.process_count() == 1

    def should_stop_collective(self) -> bool:
        """Pod-safe poll for EPOCH boundaries: every process must call this
        at the same loop point (it is a collective on pods). Any one host's
        flag stops all of them, so a notice delivered to a subset of hosts
        cannot desync the collective program — the cost is one tiny
        all-gather per epoch, nothing next to an epoch's work."""
        import jax
        if jax.process_count() == 1:
            return self._event.is_set()
        import numpy as np
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray([1.0 if self._event.is_set() else 0.0]))
        return bool(np.asarray(flags).sum() > 0)

    # -- scoped handler installation ------------------------------------------

    def _handler(self, signum, frame):
        self.signaled_by = signum
        self._event.set()

    def __enter__(self):
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:
                # signal.signal only works on the main thread; a guard built
                # on a worker thread still supports request()/should_stop()
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        return False
