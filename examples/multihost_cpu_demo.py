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
   defect (SURVEY.md section 0);
4. the CLIP-HBA trainer evaluates a REPLICATED dataset (every process holds
   the same THINGS batches, unlike the sharded ImageFolder path) and the
   multi-host loss must equal a local single-process oracle — regression
   guard for the duplicate-batch defect where each process fed the full
   batch into the global assembly, inflating eval sums P-fold;
5. train_model's whole-epoch lax.scan runs on the multi-host mesh
   (per-process column-block index assembly + in-scan optimizer updates)
   with per-batch losses matching the local oracle;
6. every process calls the collective orbax pod-checkpoint writer (a
   primary-only gate would deadlock) and the restored tree round-trips;
7. the MEASUREMENT CLI (cli/vit_measure.py) runs as a real 2-process job:
   both processes fork from the collective .orbax baseline checkpoint, the
   loaders shard disjointly (num_shards=P), and exactly one process writes
   the effects CSV — the reference's torchrun measure...effect.py:121-135,601
   semantics.

Run:  python examples/multihost_cpu_demo.py
(or with an existing folder/port: see _main/_worker below)
"""
from __future__ import annotations

import os
import subprocess
import sys



def _check(cond, msg=""):
    """Validation that must abort under `python -O` too (a plain assert
    compiles away and the demo would print success while checking nothing —
    same rule as examples/paradigm_tpu.py)."""
    if not cond:
        raise AssertionError(repr(msg) if msg != "" else "demo check failed")

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
    _check((pid, pc) == (process_id, num_processes))

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
    _check(mesh.devices.size == 2 * pc)
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
    _check(si.shape[0] == 4 * pc, si.shape)  # global batch assembled
    params, buf, loss = step(params, buf, si, sl, 0.01,
                             jax.random.PRNGKey(1), 0.1)
    loss = float(loss)
    _check(np.isfinite(loss))

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
    _check(abs(rho - float(rho1)) < 1e-5, (rho, float(rho1)))

    # --- 4. CLIP-HBA eval on a replicated dataset vs local oracle
    from vit_project_tpu.adapters import dora as adora
    from vit_project_tpu.models import clip as vclip
    from vit_project_tpu.train.clip_loop import ClipHBATrainer

    ccfg = vclip.tiny_clip_config()
    cparams = vclip.init_clip_params(jax.random.PRNGKey(3), ccfg)
    spec = adora.dora_spec(ccfg.visual.layers, ccfg.text.layers, 1, 1)
    ctrain, cstatic, acfg = adora.apply_dora(cparams, spec, r=4,
                                             key=jax.random.PRNGKey(4))
    prompts = np.random.RandomState(1).randint(
        1, 400, (66, ccfg.text.context_length)).astype(np.int32)
    rs2 = np.random.RandomState(13)
    # 20 images with batch 8 -> a partial final batch exercises the
    # pad_to + device-count padding + local-rows slicing together
    ev_imgs = rs2.randint(0, 255, (20, 32, 32, 3), np.uint8)
    ev_tgts = rs2.rand(20, 66).astype(np.float32)

    mh = ClipHBATrainer(ccfg, cparams, acfg, cstatic, prompts, lr=3e-4,
                        compute_dtype=jnp.float32, mesh=mesh)
    tr_mh = mh.prepare_state(jax.tree_util.tree_map(jnp.array, ctrain))
    loss_mh = mh.evaluate(tr_mh, ev_imgs, ev_tgts, batch_size=8)
    imgs_dev, tgts_dev = mh.upload_dataset(ev_imgs, ev_tgts)
    loss_mhr = mh.evaluate_resident(tr_mh, imgs_dev, tgts_dev, len(ev_imgs),
                                    batch_size=8)

    lo = ClipHBATrainer(ccfg, cparams, acfg, cstatic, prompts, lr=3e-4,
                        compute_dtype=jnp.float32, mesh=None)
    tr_lo = jax.tree_util.tree_map(jnp.array, ctrain)
    loss_lo = lo.evaluate(tr_lo, ev_imgs, ev_tgts, batch_size=8)
    # a duplicate-batch regression would inflate these by exactly P
    _check(abs(loss_mh - loss_lo) < 1e-4, (loss_mh, loss_lo))
    _check(abs(loss_mhr - loss_lo) < 1e-4, (loss_mhr, loss_lo))

    # --- 5. whole-epoch train scan on the multi-host mesh vs local oracle
    # (drives _prep_idx_mat's per-process column-block assembly + the scanned
    # optimizer updates under jax.distributed — the pod path of train_model)
    order2 = np.random.RandomState(5).permutation(len(ev_imgs))
    blist = [order2[:8], order2[8:16], order2[16:]]
    dkey, pkey = jax.random.PRNGKey(30), jax.random.PRNGKey(31)

    def run_epoch(trainer, tr0):
        im, tg = trainer.upload_dataset(ev_imgs, ev_tgts)
        idx_mat, valid_mat = trainer._prep_idx_mat(blist, 8)
        opt = trainer.prepare_state(trainer.init_opt_state(tr0))
        tr1, _, losses, oks = trainer._epoch_scan("none")(
            tr0, opt, trainer.params, trainer.static, im, tg, idx_mat,
            valid_mat, dkey, pkey)
        return tr1, np.asarray(losses), np.asarray(oks)

    _, losses_mh, oks_mh = run_epoch(
        mh, mh.prepare_state(jax.tree_util.tree_map(jnp.array, ctrain)))
    _, losses_lo, oks_lo = run_epoch(
        lo, jax.tree_util.tree_map(jnp.array, ctrain))
    _check(oks_mh.all() and oks_lo.all())
    np.testing.assert_allclose(losses_mh, losses_lo, rtol=0, atol=1e-5)

    # --- 6. collective pod checkpoint: EVERY process calls the sharded
    # writer (a primary-only gate deadlocks in orbax's global barrier — the
    # exact regression this drive guards), then restores host-side and
    # checks round-trip fidelity + the auto-resume scan.
    from vit_project_tpu.ckpt import vit_ckpt
    ck_dir = os.path.join(root, "ckpt_out")
    path = vit_ckpt.save_checkpoint(0, params, buf, {"last_epoch": 0},
                                    1.0, 2.0, 0.5, ck_dir)
    _check(path.endswith("checkpoint_epoch_000.orbax"), path)
    latest = vit_ckpt.latest_checkpoint(ck_dir)
    ck = vit_ckpt.load_checkpoint(latest)
    _check(int(ck["epoch"]) == 0)
    np.testing.assert_array_equal(np.asarray(ck["params"]["cls"]),
                                  np.asarray(params["cls"]))

    # --- 7. the measurement CLI as a real 2-process job
    from vit_project_tpu.cli import vit_measure
    from vit_project_tpu.data import imagenet as dimg
    from vit_project_tpu.train.schedules import CosineAnnealingLRWithWarmup

    meas_ck = os.path.join(root, "measure_baseline")
    sched = CosineAnnealingLRWithWarmup(0.1, 2, 4)
    # epoch-0 baseline checkpoint, written COLLECTIVELY (.orbax on a pod) —
    # the CLI must resolve it through vit_ckpt.epoch_checkpoint
    vit_ckpt.save_checkpoint(0, params, buf, sched.state_dict(),
                             1.0, 2.0, 0.4, meas_ck)
    metrics_csv = os.path.join(root, "baseline_rsa.csv")
    if dist.is_primary():
        with open(metrics_csv, "w") as f:
            f.write("epoch,val_loss,rsa_score\n1,2.0,0.1\n")
    dist.barrier("measure_fixture")

    # record the loader sharding the CLI builds (disjointness proof)
    loader_args = []
    orig_loader = dimg.ImageFolderLoader

    class RecordingLoader(orig_loader):
        def __init__(self, *a, **kw):
            loader_args.append((kw.get("num_shards", 1),
                                kw.get("shard_id", 0)))
            super().__init__(*a, **kw)

    dimg.ImageFolderLoader = RecordingLoader
    try:
        out_csv = os.path.join(root, "measure_out",
                               "perturbation_effects.csv")
        results = vit_measure.main([
            "--baseline_checkpoint_dir", meas_ck,
            "--baseline_metrics_csv", metrics_csv,
            "--data_path", root, "--output_csv", out_csv,
            "--things_csv", os.path.join(root, "things48.csv"),
            "--things_img_dir", os.path.join(root, "things48"),
            "--things_rdm_path", os.path.join(root, "rdm48.mat"),
            "--perturbation_types", "gaussian",
            "--perturb_epochs", "1", "--batch_size", str(2 * pc),
            "--lr", "0.1", "--warmup_epochs", "2", "--total_epochs", "4",
            "--num_workers", "2", "--compute_dtype", "float32",
            "--backbone", "test-tiny"])
    finally:
        dimg.ImageFolderLoader = orig_loader
    _check(len(results) == 1 and np.isfinite(results[0]["perturbed_loss"]))
    _check((pc, pid) in loader_args, (loader_args, pc, pid))  # disjoint shards
    dist.barrier("measure_done")
    _check(os.path.exists(out_csv))  # the (single) primary writer produced it
    with open(out_csv) as f:
        _check(len(f.readlines()) == 2)  # header + the single grid cell

    # 8) collective preemption poll (core/preempt.py): a SIGTERM delivered
    # to ONE host must stop BOTH at the same epoch boundary — the local
    # poll always declines on pods (a mid-epoch stop seen by a subset of
    # hosts would desync the collective program), while the collective
    # poll agrees ring-wide.
    from vit_project_tpu.core.preempt import PreemptionGuard
    g = PreemptionGuard()
    if pid == 1:
        g.request()  # the notice lands on one host only
    _check(g.should_stop() is False)          # pod-local poll never fires
    _check(g.should_stop_collective() is True)   # ...but both hosts agree
    quiet = PreemptionGuard()
    _check(quiet.should_stop_collective() is False)  # and quiet stays quiet
    dist.barrier("preempt_done")

    print(f"proc {pid}: dp loss {loss:.4f} rsa {rho:.4f} "
          f"(oracle {float(rho1):.4f}) clip eval {loss_mh:.4f}/"
          f"{loss_mhr:.4f} (oracle {loss_lo:.4f}) "
          f"train-scan losses {np.round(losses_mh, 4).tolist()} "
          f"pod-ckpt {os.path.basename(latest)} "
          f"measure-cli {results[0]['perturbation_type']}@"
          f"{results[0]['perturb_epoch']} OK", flush=True)


def _main():
    import tempfile

    import numpy as np
    from PIL import Image

    root = tempfile.mkdtemp(prefix="mh_demo_")
    rs = np.random.RandomState(0)
    for split, n_img in (("train", 8), ("val", 3)):
        for cls in ("a", "b", "c"):
            d = os.path.join(root, split, cls)
            os.makedirs(d)
            for i in range(n_img):
                Image.fromarray(rs.randint(0, 255, (32, 32, 3),
                                           dtype=np.uint8)).save(f"{d}/{i}.png")

    # THINGS-48 fixture for the measurement CLI's RSA leg
    import pandas as pd
    import scipy.io
    tdir = os.path.join(root, "things48")
    os.makedirs(tdir)
    names = []
    for i in range(48):
        n = f"t{i:02d}.png"
        Image.fromarray(rs.randint(0, 255, (32, 32, 3),
                                   dtype=np.uint8)).save(os.path.join(tdir, n))
        names.append(n)
    pd.DataFrame({"image_name": names}).to_csv(
        os.path.join(root, "things48.csv"), index=False)
    rdm = rs.rand(48, 48)
    rdm = (rdm + rdm.T) / 2
    np.fill_diagonal(rdm, 0)
    scipy.io.savemat(os.path.join(root, "rdm48.mat"), {"RDM48_triplet": rdm})
    def _free_port() -> int:
        # bind-to-0 picks a free port: a fixed default can collide with a
        # stale coordinator or a concurrently running demo
        import socket
        with socket.socket() as s:
            s.bind(("localhost", 0))
            return s.getsockname()[1]

    fixed_port = int(os.environ.get("MH_DEMO_PORT", "0"))
    # the free port is released before the coordinator rebinds it, so another
    # process can still race into the window — retry once with a fresh port
    for attempt in range(2):
        port = fixed_port or _free_port()
        env = dict(os.environ)
        # CPU-only workers: skip any remote-accelerator plugin the image
        # registers at interpreter startup (its connection retries would
        # serialize ahead of the worker's main)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        procs = [subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(i), "2",
             str(port), root],
            env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for i in range(2)]
        ok = True
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=1200)
            except subprocess.TimeoutExpired:
                # a worker hung (e.g. in the distributed rendezvous): kill
                # BOTH processes and reap them so the retry loop below can
                # run on a fresh port instead of leaking orphans that hold
                # the port and tempdir
                for q in procs:
                    if q.poll() is None:
                        q.kill()
                out, _ = p.communicate()
                out = (out or "") + "\n[worker timed out after 1200s]"
                ok = False
            outs.append(out)
            ok = ok and (p.returncode == 0)
        if ok or fixed_port or attempt == 1:
            for out in outs:
                sys.stdout.write(out)
            break
        print(f"attempt on port {port} failed; retrying on a fresh port",
              flush=True)
    if not ok:
        raise SystemExit("multihost demo FAILED")
    print("multihost_cpu_demo: OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sys.argv[5])
    else:
        _main()
