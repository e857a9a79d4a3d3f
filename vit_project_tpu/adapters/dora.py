"""DoRA adapter application: parameter surgery as a pure tree transformation.

The reference mutates nn.Modules in place (apply_dora_to_ViT replaces the
attn.out_proj of the last n visual / text resblocks with DoRALayer,
new_cvpr_train_behavior_things_pipeline.py:484-513) and then flips requires_grad
flags (switch_dora_layers, :516-544). Functionally, that's two trees:

- `trainable`: {tower: {block_idx: {m, delta_D_A, delta_D_B}}} — what the optimizer
  sees (so "freeze control" = which tree you differentiate; no masking needed);
- `static`:    {tower: {block_idx: {D, bias}}} — the frozen unit-column direction
  matrix and the cloned bias (the reference clones the bias into the DoRALayer and
  freezes it, ref :437-441, :534-535).

`assemble` zips them into the per-block adapter dicts the model forward consumes.
"""
from __future__ import annotations

import jax
import numpy as np

from ..ops import dora as vdora


def dora_spec(visual_layers_total: int, text_layers_total: int,
              n_vision_layers: int, n_transformer_layers: int) -> dict:
    """Which block indices get adapters: the LAST n of each tower
    (reference uses range(-n, 0) indexing)."""
    return {
        "visual": list(range(visual_layers_total - n_vision_layers,
                             visual_layers_total)),
        "text": list(range(text_layers_total - n_transformer_layers,
                           text_layers_total)),
    }


def apply_dora(clip_params: dict, spec: dict, *, r: int, alpha: int = 16,
               dropout: float = 0.1, key: jax.Array) -> tuple[dict, dict, dict]:
    """Build DoRA trees for the out_proj of the specified blocks.

    Returns (trainable, static, adapter_cfg). clip_params is NOT modified; the
    original out_w/out_b stay in the frozen tree but are bypassed for adapted
    blocks.
    """
    trainable = {"visual": {}, "text": {}}
    static = {"visual": {}, "text": {}}
    towers = {"visual": clip_params["visual"]["blocks"],
              "text": clip_params["text"]["blocks"]}
    for tower, indices in spec.items():
        for idx in indices:
            blk = towers[tower][idx]
            key, sub = jax.random.split(key)
            tr, buf = vdora.dora_init(sub, blk["out_w"], r=r)
            buf["bias"] = blk["out_b"]
            trainable[tower][idx] = tr
            static[tower][idx] = buf
    cfg = {"r": r, "alpha": alpha, "dropout": dropout}
    return trainable, static, cfg


def assemble(trainable: dict, static: dict) -> dict:
    """Zip trainable+static into {"visual": {idx: {trainable, buffers}}, ...}
    for clip_hba_forward."""
    out = {}
    for tower in trainable:
        out[tower] = {idx: {"trainable": trainable[tower][idx],
                            "buffers": static[tower][idx]}
                      for idx in trainable[tower]}
    return out


def count_trainable_parameters(trainable: dict) -> int:
    return vdora.count_params(trainable)


# -- reference-compatible checkpoint naming ---------------------------------
# The reference saves {module_path}.{m,delta_D_A,delta_D_B} with module paths like
# clip_model.visual.transformer.resblocks.22.attn.out_proj
# (save_dora_parameters, new_cvpr...pipeline.py:657-693).

def _module_path(tower: str, idx: int) -> str:
    t = "visual.transformer" if tower == "visual" else "transformer"
    return f"clip_model.{t}.resblocks.{idx}.attn.out_proj"


# the three per-adapter parameter names of the reference checkpoint format
ADAPTER_PARAM_NAMES = ("m", "delta_D_A", "delta_D_B")


def spec_module_paths(spec: dict) -> set:
    """Reference-style module paths of every adapter a spec covers."""
    return {_module_path(t, int(i)) for t, idxs in spec.items() for i in idxs}


def checkpoint_module_paths(flat: dict) -> set:
    """Reference-style module paths of every adapter present in a flat
    {path.param: array} checkpoint mapping (to_reference_names layout)."""
    suffixes = tuple(f".{n}" for n in ADAPTER_PARAM_NAMES)
    return {k.rsplit(".", 1)[0] for k in flat if k.endswith(suffixes)}


def to_reference_names(trainable: dict) -> dict:
    """Flatten a trainable tree to reference-style {path.param: np.ndarray}."""
    flat = {}
    for tower, blocks in trainable.items():
        for idx, tr in blocks.items():
            base = _module_path(tower, int(idx))
            for name, val in tr.items():
                flat[f"{base}.{name}"] = np.asarray(val)
    return flat


def from_reference_names(flat: dict, spec: dict) -> dict:
    """Inverse of to_reference_names for the blocks named in `spec`.

    Fully missing blocks are skipped (reference loads with strict=False,
    ref :1168) — callers keep their initialized values for those. A block
    with SOME of its three params present is a torn/renamed checkpoint, not
    a fresh block: torch's strict=False would load the present tensors, so
    loading nothing would silently train from a half-random adapter —
    that case is a hard error instead.
    """
    out = {"visual": {}, "text": {}}
    for tower, indices in spec.items():
        for idx in indices:
            base = _module_path(tower, int(idx))
            entry = {}
            for name in ADAPTER_PARAM_NAMES:
                k = f"{base}.{name}"
                if k in flat:
                    entry[name] = np.asarray(flat[k])
            if len(entry) == 3:
                out[tower][idx] = entry
            elif entry:
                missing = sorted(set(ADAPTER_PARAM_NAMES) - set(entry))
                raise ValueError(
                    f"DoRA checkpoint is torn: block {base} has "
                    f"{sorted(entry)} but is missing {missing}")
    return out


def bake(clip_params: dict, trainable: dict, static: dict, *,
         alpha: int, r: int) -> dict:
    """Merge trained DoRA adapters into the frozen CLIP weights.

    Returns a copy of `clip_params` where each adapted block's out_w is the
    deterministic adapted weight m * colnorm(D + B@A * alpha/r) and out_b is
    the adapter's (cloned, frozen) bias — i.e. a plain CLIP tree whose
    no-adapter forward equals the adapted forward with dropout off. Use for
    zero-overhead inference/serving and for exporting a finished run as an
    ordinary checkpoint. The reference has no merge path (its DoRALayer
    recomputes the adapted weight every forward, even in eval,
    new_cvpr...pipeline.py:447-470).
    """
    out = dict(clip_params)
    for tower, blocks in trainable.items():
        if not blocks:
            continue
        tower_p = dict(out[tower])
        tower_blocks = list(tower_p["blocks"])
        for idx, tr in blocks.items():
            buf = static[tower][idx]
            blk = dict(tower_blocks[int(idx)])
            w = vdora.dora_weight(tr, buf["D"], alpha=alpha, r=r)
            blk["out_w"] = w.astype(blk["out_w"].dtype)
            if buf.get("bias") is not None:
                blk["out_b"] = buf["bias"]
            tower_blocks[int(idx)] = blk
        tower_p["blocks"] = tower_blocks
        out[tower] = tower_p
    return out


def merge_loaded(trainable: dict, loaded: dict) -> dict:
    """Overlay loaded adapter params onto an initialized trainable tree
    (strict=False load semantics)."""
    out = {t: dict(b) for t, b in trainable.items()}
    for tower, blocks in loaded.items():
        for idx, tr in blocks.items():
            if idx in out.get(tower, {}):
                out[tower][idx] = {k: jax.numpy.asarray(v)
                                   for k, v in tr.items()}
    return out
