"""Multi-host runtime initialization.

TPU-native equivalent of the reference's torchrun/NCCL rendezvous
(setup_distributed, train_vit_sgd.py:13-27: env-var rendezvous + nccl process
group). On TPU pods, `jax.distributed.initialize()` reads the coordinator from the
environment; collectives then ride ICI within a slice and DCN across slices via
XLA — there is no hand-written communication layer to configure.
"""
from __future__ import annotations

import jax


def setup_distributed(coordinator_address: str | None = None,
                      num_processes: int | None = None,
                      process_id: int | None = None) -> tuple[int, int]:
    """Initialize multi-host JAX if running under a multi-process launcher.

    Returns (process_index, process_count). Single-process (including one TPU VM
    with all local chips, or the CPU test mesh) needs no initialization — the
    'not using distributed mode' fallback of the reference.

    When the caller or environment *does* indicate multi-process intent, init
    failures re-raise: swallowing them would degrade the pod into N independent
    runs that each believe they are process 0 (N writers to the same shared-FS
    artifacts). Only the idempotent already-initialized case is absorbed.
    """
    multi_process_intent = coordinator_address is not None or _env_configured()
    if multi_process_intent and not jax.distributed.is_initialized():
        try:
            if coordinator_address is not None:
                jax.distributed.initialize(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes,
                    process_id=process_id)
            else:
                jax.distributed.initialize()
        except RuntimeError as e:
            # jax raises "distributed.initialize should only be called once."
            # on re-init. Match ONLY that sentence: a broader substring (e.g.
            # "already") would also absorb real rendezvous failures such as
            # "address already in use" from a stale coordinator.
            if "only be called once" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def _env_configured() -> bool:
    import os
    return any(k in os.environ for k in
               ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"))


def is_primary() -> bool:
    """rank-0 gating for checkpoint/CSV writes (reference local_rank==0).

    While jax.distributed is uninitialized this answers WITHOUT calling
    jax.process_index(): that call forces accelerator-backend
    initialization, which a host-side dispatcher (cli/sweep.py --workers)
    must avoid — on a TPU VM the parent process would acquire every chip
    its workers are about to pin, even when stale coordinator env vars are
    lying around. Before initialize() the backend could only report
    process 0 anyway; when a rendezvous env names this process's rank
    (JAX_PROCESS_ID / PROCESS_ID), answer from that instead."""
    if not jax.distributed.is_initialized():
        import os
        pid = os.environ.get("JAX_PROCESS_ID", os.environ.get("PROCESS_ID"))
        return pid in (None, "", "0")
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync (reference dist.barrier, train_vit_sgd.py:279)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def ordered_allgather_strided(local, n_total: int):
    """Gather per-process rows back into DATASET order.

    Each process holds the rows of a strided shard: process p computed
    dataset indices p, p+P, p+2P, ... (the ImageFolderLoader num_shards
    contract, wrap-padded so every process holds the same count). Gathers all
    shards and interleaves them so row i of the result is dataset item i,
    then trims the wrap padding to n_total rows.

    This FIXES the reference's RSA gather defect (SURVEY.md section 0): its
    all_gather concatenates rank shards in rank order and takes [:48], so the
    rows do not match the reference-RDM image order under an interleaving
    DistributedSampler (measure_single_epoch_perturbation_effect.py:327-334).
    """
    import numpy as np
    if jax.process_count() == 1:
        return np.asarray(local)[:n_total]
    from jax.experimental import multihost_utils
    stacked = multihost_utils.process_allgather(np.asarray(local))
    # stacked: [P, per_shard, ...] -> interleave: dataset idx = p + P*j
    out = np.swapaxes(np.asarray(stacked), 0, 1).reshape(
        (-1,) + stacked.shape[2:])
    return out[:n_total]
