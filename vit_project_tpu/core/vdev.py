"""Virtual-device subprocess environment (the shared re-exec recipe).

Several entry points need to run JAX code over an N-device *virtual* CPU
mesh from a process that may already have pinned a 1-chip accelerator
backend (which cannot be undone in-process): ``__graft_entry__
.dryrun_multichip``, ``cli.profile --memory --virtual_devices``, and the
multihost CPU demo. They all need the same three env edits, kept in one
place so a new plugin-gating variable only has to be handled once:

- replace any stale ``--xla_force_host_platform_device_count`` in
  ``XLA_FLAGS`` with the requested count,
- pin ``JAX_PLATFORMS=cpu``,
- drop ``PALLAS_AXON_POOL_IPS`` so sitecustomize skips registering the
  remote-accelerator PJRT plugin (a CPU-only subprocess must not pay the
  plugin's connection retries — minutes when the tunnel is down).
"""

import os


def virtual_cpu_env(n_devices: int, base=None) -> dict:
    """Return a subprocess env dict seeing `n_devices` virtual CPU devices.

    `base` defaults to ``os.environ``; the returned dict is a copy — the
    caller's environment is never mutated.
    """
    env = dict(os.environ if base is None else base)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={int(n_devices)}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env
