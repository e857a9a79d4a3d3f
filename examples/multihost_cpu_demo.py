"""2-process multi-host drive on CPU (no TPU pod required).

Spawns 2 coordinated jax.distributed processes (2 virtual CPU devices each =
a 4-device global data mesh) and demonstrates the full multi-host data path
the reference gets from torchrun + DistributedSampler + NCCL
(train_vit_sgd.py:13-27,58-66; measure...effect.py:327-334):

1. each process loads a DISJOINT strided shard of a synthetic ImageFolder
   (ImageFolderLoader num_shards/shard_id);
2. the per-process batches are assembled into one global data-sharded array
   (parallel/mesh.py shard_batch -> jax.make_array_from_process_local_data)
   and a jitted data-parallel ViT train step runs on the global mesh, with
   XLA inserting the gradient all-reduce;
3. per-process THINGS embeddings are gathered back into DATASET order
   (parallel/dist.py ordered_allgather_strided) and both processes compute
   the identical RSA score — fixing the reference's rank-order concatenation
   defect (SURVEY.md section 0).

Run:  python examples/multihost_cpu_demo.py
(or with an existing folder/port: see _main/_worker below)
"""
from __future__ import annotations

import os
import subprocess
import sys


def _worker(process_id: int, num_processes: int, port: int, root: str):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}",
                               num_processes=num_processes,
                               process_id=process_id)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vit_project_tpu.core.configs import ViTTrainConfig
    from vit_project_tpu.data.imagenet import ImageFolderLoader
    from vit_project_tpu.models import vit as vvit
    from vit_project_tpu.parallel import dist, mesh as vmesh
    from vit_project_tpu.train.vit_loop import ViTTrainer, sgd_init

    pid, pc = jax.process_index(), jax.process_count()
    assert (pid, pc) == (process_id, num_processes)

    # --- 1. disjoint shards
    ld = ImageFolderLoader(os.path.join(root, "train"), 4, train=True,
                           seed=0, size=32, workers=2, drop_last=True,
                           num_shards=pc, shard_id=pid)
    batches = list(ld.epoch(0))
    my_first_labels = batches[0][1]
    other = np.asarray(dist.ordered_allgather_strided(
        my_first_labels[None], pc))  # just to exercise a collective early

    # --- 2. global dp train step from per-process local batches
    mesh = vmesh.make_mesh()
    assert mesh.devices.size == 2 * pc
    tiny = vvit.ViTConfig(patch=8, width=32, layers=2, heads=2,
                          image_size=32, num_classes=3)
    tcfg = ViTTrainConfig(batch_size=4 * pc, compute_dtype="float32",
                          num_classes=3, image_size=32)
    trainer = ViTTrainer(tiny, tcfg, mesh)
    params = vmesh.replicate(mesh, vvit.init_vit_params(
        jax.random.PRNGKey(0), tiny))
    buf = vmesh.replicate(mesh, sgd_init(params))
    step = trainer._make_train_step(None)
    imgs, lbls = batches[0]
    si, sl = trainer.shard(imgs, lbls)
    assert si.shape[0] == 4 * pc, si.shape  # global batch assembled
    params, buf, loss = step(params, buf, si, sl, 0.01,
                             jax.random.PRNGKey(1), 0.1)
    loss = float(loss)
    assert np.isfinite(loss)

    # --- 3. dataset-order RSA gather across processes
    rs = np.random.RandomState(7)
    things = rs.randint(0, 255, (48, 32, 32, 3), np.uint8)
    rdm = rs.rand(48, 48)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    rho, p = trainer.compute_rsa_score(params, things, rdm, batch_size=8)

    # single-process oracle for the same params: embeddings in dataset order
    emb = []
    for s in range(0, 48, 8):
        emb.append(np.asarray(trainer._feature_step(
            params, jnp.asarray(things[s:s + 8]))))
    from vit_project_tpu.ops import rsa as vrsa
    rho1, p1, _ = vrsa.behavioral_rsa(jnp.asarray(np.concatenate(emb)),
                                      jnp.asarray(rdm))
    assert abs(rho - float(rho1)) < 1e-5, (rho, float(rho1))

    print(f"proc {pid}: dp loss {loss:.4f} rsa {rho:.4f} "
          f"(oracle {float(rho1):.4f}) shard_batches {len(batches)} OK",
          flush=True)


def _main():
    import tempfile

    import numpy as np
    from PIL import Image

    root = tempfile.mkdtemp(prefix="mh_demo_")
    rs = np.random.RandomState(0)
    for cls in ("a", "b", "c"):
        d = os.path.join(root, "train", cls)
        os.makedirs(d)
        for i in range(8):
            Image.fromarray(rs.randint(0, 255, (32, 32, 3),
                                       dtype=np.uint8)).save(f"{d}/{i}.png")
    port = int(os.environ.get("MH_DEMO_PORT", "49741"))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i), "2",
         str(port), root],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    ok = True
    for p in procs:
        out, _ = p.communicate(timeout=600)
        sys.stdout.write(out)
        ok = ok and (p.returncode == 0)
    if not ok:
        raise SystemExit("multihost demo FAILED")
    print("multihost_cpu_demo: OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sys.argv[5])
    else:
        _main()
