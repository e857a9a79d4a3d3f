"""Benchmark: ViT-B/16 fwd+bwd images/sec/chip (the BASELINE.json headline).

Runs the real supervised training step (normalize + forward + backward + SGD
update, bf16 compute, Pallas attention) at ImageNet shapes on one TPU chip and
prints ONE JSON line. vs_baseline is against the 3,000 img/s/chip target from
BASELINE.json (reference hardware: 2xA100-40GB at batch 256/GPU).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vit_project_tpu.core.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # re-runs skip the step compile
    from vit_project_tpu.core.configs import ViTTrainConfig
    from vit_project_tpu.models import vit as vvit
    from vit_project_tpu.parallel import mesh as vmesh
    from vit_project_tpu.train.vit_loop import ViTTrainer, sgd_init

    B = 256
    vit_cfg = vvit.VIT_B16
    tcfg = ViTTrainConfig(batch_size=B, compute_dtype="bfloat16")
    mesh = vmesh.make_mesh()
    n_chips = mesh.devices.size
    trainer = ViTTrainer(vit_cfg, tcfg, mesh)

    params = vmesh.replicate(mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), vit_cfg))
    buf = vmesh.replicate(mesh, sgd_init(params))
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (B * n_chips, 224, 224, 3), np.uint8)
    labels = rs.randint(0, 1000, B * n_chips).astype(np.int32)
    si, sl = trainer.shard(images, labels)
    step = trainer._make_train_step(None)
    key = jax.random.PRNGKey(1)

    # warmup / compile (sync via host transfer: on the axon tunnel backend,
    # block_until_ready does not actually wait for remote execution)
    params, buf, loss = step(params, buf, si, sl, 0.1, key, 0.1)
    float(loss)

    iters = 20
    best = float("inf")
    for _ in range(3):  # best-of-3 windows: the tunnel adds run-to-run noise
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(iters):
            params, buf, loss = step(params, buf, si, sl, 0.1, key, 0.1)
            acc = acc + loss
        float(acc)  # one sync depending on every step
        best = min(best, (time.perf_counter() - t0) / iters)
    dt = best

    imgs_per_sec_per_chip = (B * n_chips) / dt / n_chips
    target = 3000.0
    print(json.dumps({
        "metric": "vit_b16_fwd_bwd_images_per_sec_per_chip",
        "value": round(imgs_per_sec_per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / target, 3),
    }))


if __name__ == "__main__":
    main()
