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
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        elif _env_configured():
            jax.distributed.initialize()
    except Exception:
        # already initialized, or single-process: both fine
        pass
    return jax.process_index(), jax.process_count()


def _env_configured() -> bool:
    import os
    return any(k in os.environ for k in
               ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"))


def is_primary() -> bool:
    """rank-0 gating for checkpoint/CSV writes (reference local_rank==0)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync (reference dist.barrier, train_vit_sgd.py:279)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
