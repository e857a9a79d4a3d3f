"""Batch-serving CLI: finished checkpoint + image folder -> predictions CSV.

No reference counterpart — the reference's only way to get outputs from a
trained model is to re-enter its measurement scripts
(measure_single_epoch_perturbation_effect.py / the CLIP eval loop). This CLI
is the deployment surface: it loads a finished ViT checkpoint (or CLIP
weights + trained DoRA adapters, baked), builds a serve.InferenceEngine, and
streams every image under a directory through it at serving throughput.

  # ViT classifier top-k (or --mode features for pooled embeddings -> .npy)
  python -m vit_project_tpu.cli.serve --model vit_base_patch16_224 \\
      --checkpoint runs/checkpoint_epoch_010.pth --images val/ --out preds.csv

  # CLIP-HBA behavioral scores over the 66 SPoSE dimensions
  python -m vit_project_tpu.cli.serve --clip_weights ViT-L-14.pt \\
      --dora_checkpoint runs/epoch10_dora.pth --bpe_vocab bpe.txt.gz \\
      --images things/ --out scores.csv
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def collect_images(root: str) -> list[str]:
    """Every image file under `root` (a file, a flat dir, or a class tree),
    sorted for a deterministic output order."""
    if os.path.isfile(root):
        return [root]
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.lower().endswith(IMAGE_EXTS):
                out.append(os.path.join(dirpath, f))
    out.sort()
    if not out:
        raise SystemExit(f"no images found under {root}")
    return out


def batched_reader(paths: list[str], batch: int, size: int, *,
                   normalize=None):
    """Decode + Resize/CenterCrop `batch` images at a time (the ViT val
    transform, data.imagenet.resize_center_crop). normalize=(mean,std)
    emits f32 normalized batches (the CLIP pipeline contract); None emits
    uint8 (the ViT engines fold normalization into the patch matmul)."""
    from PIL import Image
    from ..data import imagenet as dimg
    for s in range(0, len(paths), batch):
        imgs = []
        for p in paths[s:s + batch]:
            img = Image.open(p).convert("RGB")
            imgs.append(np.asarray(dimg.resize_center_crop(img, size),
                                   np.uint8))
        arr = np.stack(imgs)
        if normalize is not None:
            mean, std = normalize
            arr = ((arr.astype(np.float32) / 255.0 - np.asarray(mean))
                   / np.asarray(std)).astype(np.float32)
        yield arr


def build_vit_engine(args):
    from ..ckpt import vit_ckpt
    from ..core.configs import IMAGENET_MEAN, IMAGENET_STD
    from ..models import vit as vvit
    from ..serve import vit_classifier_engine, vit_features_engine
    cfg = vvit.VIT_CONFIGS[args.model]
    if args.checkpoint:
        params = vit_ckpt.load_checkpoint(args.checkpoint)["params"]
    elif args.random_init:
        import jax
        params = vvit.init_vit_params(jax.random.PRNGKey(0), cfg)
    else:
        raise SystemExit("pass --checkpoint (or --random_init for smoke "
                         "tests; random weights serve garbage)")
    ctor = (vit_features_engine if args.mode == "features"
            else vit_classifier_engine)
    eng = ctor(params, cfg, buckets=args.bucket_list,
               input_norm=(IMAGENET_MEAN, IMAGENET_STD),
               param_dtype=args.dtype, quantize=args.quantize)
    return eng, cfg.image_size, None


def auto_use_pos_embedding(clip_cfg) -> bool:
    """The --pos_embedding auto rule: the reference CLIPHBA convention is
    RN50-ONLY — pos_embedding=False iff config['backbone'] == 'RN50'
    (cvpr_..._baseline.py:757-758); RN101/RN50x4/x16/x64 keep it on like
    the ViT towers. The weights are identified by geometry (the config is
    shape-inferred, there is no backbone name here). A plain OpenAI RN50
    checkpoint wants --pos_embedding on instead."""
    from ..models import resnet as vresnet
    from ..models.resnet import ResNetConfig
    is_rn50 = (isinstance(clip_cfg.visual, ResNetConfig)
               and clip_cfg.visual.layers == vresnet.RN50.layers
               and clip_cfg.visual.width == vresnet.RN50.width)
    return not is_rn50


def build_clip_engine(args):
    from ..adapters import dora as adora
    from ..ckpt import clip_ckpt
    from ..core.configs import THINGS_MEAN, THINGS_STD
    from ..data.spose66 import SPOSE_DIMENSIONS_66
    from ..models import convert as vconvert
    from ..models import tokenizer as vtok
    from ..serve import clip_hba_engine
    sd = vconvert.load_torch_state_dict(args.clip_weights)
    params, clip_cfg = vconvert.clip_params_from_state_dict(sd)
    tok = vtok.default_tokenizer(args.bpe_vocab)
    if isinstance(tok, vtok.HashTokenizer) and not args.allow_hash_tokenizer:
        raise SystemExit(
            "pretrained CLIP weights need the BPE vocab (--bpe_vocab / "
            "CLIP_BPE_PATH); hash-tokenized prompts serve meaningless "
            "scores. --allow_hash_tokenizer overrides (testing only).")
    prompts = vtok.tokenize(
        SPOSE_DIMENSIONS_66, tokenizer=tok,
        context_length=clip_cfg.text.context_length,
        truncate=isinstance(tok, vtok.HashTokenizer))
    prompts = np.minimum(prompts, clip_cfg.text.vocab_size - 1)
    from ..models.resnet import ResNetConfig
    is_rn = isinstance(clip_cfg.visual, ResNetConfig)
    trainable = static = None
    if args.dora_checkpoint:
        if is_rn:
            raise SystemExit(
                "--dora_checkpoint needs a ViT visual tower (DoRA surgery "
                "targets transformer resblocks; the reference's RN50 path "
                "has no DoRA either)")
        import jax
        spec = adora.dora_spec(clip_cfg.visual.layers, clip_cfg.text.layers,
                               args.vision_layers, args.transformer_layers)
        init_tr, static, _ = adora.apply_dora(
            params, spec, r=args.rank, alpha=args.dora_alpha,
            key=jax.random.PRNGKey(0))
        trainable = clip_ckpt.load_dora_parameters(args.dora_checkpoint,
                                                   init_tr, spec)
    if args.pos_embedding == "auto":
        use_pos = auto_use_pos_embedding(clip_cfg)
    else:
        use_pos = args.pos_embedding == "on"
    eng = clip_hba_engine(params, prompts, clip_cfg, trainable=trainable,
                          static=static, alpha=args.dora_alpha, r=args.rank,
                          buckets=args.bucket_list, param_dtype=args.dtype,
                          quantize=args.quantize,
                          use_pos_embedding=use_pos)
    return eng, clip_cfg.visual.image_size, (THINGS_MEAN, THINGS_STD)


def write_outputs(paths, outputs, args):
    names = [os.path.relpath(p, args.images) if os.path.isdir(args.images)
             else os.path.basename(p) for p in paths]
    if args.mode == "features":
        out = args.out if args.out.endswith(".npy") else args.out + ".npy"
        np.save(out, outputs)
        with open(os.path.splitext(out)[0] + ".filenames.txt", "w") as f:
            f.write("\n".join(names) + "\n")
        return out
    import csv
    k = min(args.topk, outputs.shape[1])
    top = np.argsort(-outputs, axis=1)[:, :k]
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        hdr = ["filename"]
        for i in range(k):
            hdr += [f"top{i+1}_index", f"top{i+1}_score"]
        w.writerow(hdr)
        for name, row, idxs in zip(names, outputs, top):
            rec = [name]
            for i in idxs:
                rec += [int(i), f"{row[i]:.6f}"]
            w.writerow(rec)
    return args.out


def _http_preprocess(norm):
    """Per-request input canonicalization for the HTTP daemon.

    Wire contract: clients post RAW images — uint8 in 0..255 or float in
    [0, 1]. This runs per request BEFORE micro-batch coalescing (see
    serve/server.py), so the uint8/float distinction can never be lost to
    dtype promotion across a mixed window.
    - CLIP engines (`norm=(mean, std)`) expect normalized float inputs:
      scale uint8 to [0,1], then apply (x - mean) / std.
    - ViT engines (norm=None here) fold normalization into the patch matmul
      and expect RAW 0..255-scale values: uint8 casts, [0,1] floats scale up.
    """
    if norm is not None:
        mean = np.asarray(norm[0], np.float32)
        std = np.asarray(norm[1], np.float32)

        def pre(arr):
            arr = (arr.astype(np.float32) / 255.0 if arr.dtype == np.uint8
                   else arr.astype(np.float32))
            return (arr - mean) / std
    else:
        def pre(arr):
            return (arr.astype(np.float32) if arr.dtype == np.uint8
                    else arr.astype(np.float32) * 255.0)
    return pre


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--images",
                    help="image file, flat dir, or class tree (batch mode)")
    ap.add_argument("--out", help="output CSV (.npy for --mode features)")
    ap.add_argument("--http_port", type=int, default=None,
                    help="run as an online HTTP daemon on this port instead "
                         "of batch mode (0 = ephemeral; serve/server.py: "
                         "micro-batching onto the bucket ladder; POST .npy "
                         "arrays to /v1/predict, GET /v1/healthz, /v1/stats)")
    ap.add_argument("--http_host", default="127.0.0.1",
                    help="bind address for --http_port (0.0.0.0 to expose)")
    ap.add_argument("--max_delay_ms", type=float, default=5.0,
                    help="micro-batching window: max wait for more requests "
                         "before dispatching a partial batch")
    ap.add_argument("--request_timeout", type=float, default=300.0,
                    help="per-request wait bound on the micro-batcher "
                         "(covers a cold bucket compile when --no_warmup)")
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip pre-compiling every bucket before the daemon "
                         "binds (first requests then pay the XLA compiles)")
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--checkpoint", help="ViT full checkpoint (.pth/.orbax)")
    ap.add_argument("--random_init", action="store_true")
    ap.add_argument("--clip_weights", help="torch CLIP .pt — switches to "
                    "CLIP-HBA scoring over the 66 SPoSE prompts")
    ap.add_argument("--dora_checkpoint", help="trained DoRA adapters to bake")
    ap.add_argument("--bpe_vocab")
    ap.add_argument("--allow_hash_tokenizer", action="store_true")
    ap.add_argument("--pos_embedding", choices=["auto", "on", "off"],
                    default="auto",
                    help="attnpool/CLS positional embedding: 'auto' = the "
                    "reference CLIPHBA convention (on for ViT towers, off "
                    "for RN — cvpr_..._baseline.py:757-758); 'on' restores "
                    "stock OpenAI semantics when serving a plain RN .pt")
    ap.add_argument("--vision_layers", type=int, default=2)
    ap.add_argument("--transformer_layers", type=int, default=1)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--dora_alpha", type=int, default=16)
    ap.add_argument("--mode", choices=["logits", "features"],
                    default="logits")
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--buckets", default="8,32,128,256")
    ap.add_argument("--param_dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--quantize", choices=["int8"], default=None)
    ap.add_argument("--depth", type=int, default=2,
                    help="map_stream in-flight chunks")
    ap.add_argument("--export_dir", default=None,
                    help="build the engine, serialize its bucket programs + "
                         "params as an AOT artifact (serve/export.py) to "
                         "this directory, and exit — later `--from_export` "
                         "serves the artifact with no model tracing")
    ap.add_argument("--from_export", default=None,
                    help="serve from an --export_dir artifact instead of "
                         "building an engine (model/checkpoint/bucket flags "
                         "are ignored; the manifest pins them)")
    args = ap.parse_args(argv)
    if args.export_dir and args.from_export:
        ap.error("--export_dir produces an artifact, --from_export consumes "
                 "one; pass at most one of them")
    if (args.http_port is None and not args.export_dir
            and (not args.images or not args.out)):
        # fail BEFORE the (possibly minutes-long) engine/checkpoint build
        ap.error("batch mode needs --images and --out "
                 "(or pass --http_port for the online daemon)")
    args.bucket_list = tuple(int(b) for b in args.buckets.split(","))
    args.dtype = jnp.bfloat16 if args.param_dtype == "bf16" else None

    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    if args.from_export:
        from ..serve.export import load_serving
        eng = load_serving(args.from_export)
        size = eng.manifest["example_shape"][0]
        norm = eng.manifest.get("normalize")
        if norm is not None:
            norm = (tuple(norm[0]), tuple(norm[1]))
        # the artifact pins the output surface; ignore a stale --mode
        args.mode = eng.manifest.get("mode", args.mode)
        print(f"loaded AOT artifact {args.from_export} "
              f"(buckets {eng.buckets}, platform "
              f"{eng.manifest['platforms']})", flush=True)
    elif args.clip_weights:
        eng, size, norm = build_clip_engine(args)
        if args.mode == "features":
            raise SystemExit("--mode features is the ViT surface; the CLIP "
                             "engine serves [B,66] behavioral scores")
    else:
        eng, size, norm = build_vit_engine(args)

    if args.export_dir:
        from ..serve.export import export_serving
        # float32 input dtype serves BOTH request paths losslessly: the
        # batch reader's uint8 (ViT raw 0..255 — upcast exact) and the HTTP
        # daemon's float32. The normalize constants (CLIP host-side
        # preprocessing) ride the manifest so --from_export rebuilds the
        # same preprocessing.
        manifest = export_serving(
            eng, (size, size, 3), args.export_dir,
            input_dtype=np.float32,
            extra={"normalize": norm, "mode": args.mode,
                   # args.model is a ViT-only flag; a CLIP-HBA artifact must
                   # not be stamped with its (defaulted) ViT model name
                   "model": "clip_hba" if args.clip_weights else args.model})
        print(f"exported {len(manifest['buckets'])} bucket programs + "
              f"params to {args.export_dir} "
              f"(platforms {manifest['platforms']})")
        return 0

    if args.http_port is not None:
        from ..serve import ServingDaemon
        if not args.no_warmup:
            # compile every bucket BEFORE binding: no live request ever
            # waits on XLA (first TPU compiles run 20-40s+, far above any
            # sane request timeout)
            import time
            t0 = time.time()
            eng.warmup((size, size, 3), dtype=np.float32)
            print(f"warmed {len(eng.buckets)} buckets in "
                  f"{time.time() - t0:.0f}s", flush=True)
        daemon = ServingDaemon(eng, image_shape=(size, size, 3),
                               port=args.http_port, host=args.http_host,
                               max_delay_ms=args.max_delay_ms,
                               request_timeout=args.request_timeout,
                               preprocess=_http_preprocess(norm))
        print(f"serving on http://{args.http_host}:{daemon.port} "
              f"(buckets {eng.buckets}, POST /v1/predict)", flush=True)
        daemon.serve_forever()
        return 0

    paths = collect_images(args.images)
    batch = args.bucket_list[-1]
    reader = batched_reader(paths, batch, size, normalize=norm)
    import time
    t0 = time.time()
    outputs = np.concatenate(list(eng.map_stream(reader, depth=args.depth)))
    dt = time.time() - t0
    out = write_outputs(paths, outputs, args)
    print(f"served {len(paths)} images in {dt:.1f}s "
          f"({len(paths)/dt:.1f} img/s incl. decode) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
