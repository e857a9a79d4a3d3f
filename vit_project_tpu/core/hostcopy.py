"""Async device-to-host prefetch for per-epoch artifact trees.

The training loops checkpoint (DoRA tree + optimizer state) every epoch.
Fetching those trees with a blocking ``jax.device_get`` right before the
disk write serializes the d2h transfer behind the eval/RSA dispatches; on a
high-latency link (the axon tunnel) that transfer is the remaining
sequential overhead of the batched paradigm run (BENCHLOG.md round 3).

``prefetch_to_host`` enqueues the copies as soon as the train program's
output arrays exist, so the transfer overlaps the eval/RSA device work, and
the later ``device_get``/``np.asarray`` calls find the data already on the
host. It is a pure scheduling hint: values and dtypes are unchanged, and
arrays without ``copy_to_host_async`` (numpy leaves, exotic backends) are
skipped. The reference has no analogue (torch ``.cpu()`` in its save paths
is synchronous, e.g. dora_training_function.py save_dora_parameters).
"""

from __future__ import annotations

import jax


def prefetch_to_host(*trees) -> None:
    """Kick off async d2h copies for every jax.Array leaf of ``trees``.

    Call right after the producing program returns (dispatch is async, the
    copy is enqueued after the compute that defines each array) and before
    other device work whose completion the eventual blocking fetch would
    otherwise wait behind.
    """
    for tree in trees:
        for leaf in jax.tree_util.tree_leaves(tree):
            fn = getattr(leaf, "copy_to_host_async", None)
            if fn is None:
                continue
            try:
                fn()
            except Exception:
                # a backend that rejects the hint must not break training —
                # but one bad leaf (e.g. a donated buffer) must not abort
                # the prefetch for every remaining leaf/tree either
                continue
