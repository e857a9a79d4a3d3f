"""Full / partial tower fine-tuning as trainable-tree selection.

The reference's RN50-path unfreezers (unfreeze_image_layers /
unfreeze_image_layers_all, new_cvpr_train_behavior_things_pipeline.py:552-581)
flip requires_grad on whole submodules. Functionally, "what is trainable" is just
which subtree you hand the optimizer and differentiate; these helpers carve those
subtrees out of a CLIP param pytree and merge updates back.

Usage:
    trainable, frozen = split_visual_tower(params)          # train whole tower
    trainable, frozen = split_last_blocks(params, "visual", n=2)
    ...
    params = merge(frozen, trainable)
"""
from __future__ import annotations

import jax


def split_visual_tower(clip_params: dict) -> tuple[dict, dict]:
    """Equivalent of unfreeze_image_layers_all: the whole visual tower trains."""
    trainable = {"visual": clip_params["visual"]}
    frozen = {k: v for k, v in clip_params.items() if k != "visual"}
    return trainable, frozen


def split_last_blocks(clip_params: dict, tower: str, n: int) -> tuple[dict, dict]:
    """Equivalent of unfreeze_image_layers (last-n blocks of one tower train).

    Like split_visual_tower, `frozen` EXCLUDES the trainable subtree (the
    trainable block slots are None placeholders) — a frozen tree that
    aliased the trainable blocks would double-count params and hand stale
    pre-update weights to any frozen-only consumer. merge() restores the
    full tree."""
    blocks = clip_params[tower]["blocks"]
    cut = len(blocks) - n
    trainable = {tower: {"blocks": {i: blocks[i]
                                    for i in range(cut, len(blocks))}}}
    frozen = dict(clip_params)
    tower_params = dict(frozen[tower])
    tower_params["blocks"] = [bp if i < cut else None
                              for i, bp in enumerate(blocks)]
    frozen[tower] = tower_params
    return trainable, frozen


def split_rn_image_layers(clip_params: dict) -> tuple[dict, dict]:
    """Equivalent of unfreeze_image_layers on an RN50 tower
    (new_cvpr_train_behavior_things_pipeline.py:552-567): the visual tower's
    layer3 / layer4 / attnpool train; everything else stays frozen. Same
    no-aliasing contract as split_last_blocks — the trainable slots are None
    placeholders in `frozen`; merge() restores the full tree."""
    vis = clip_params["visual"]
    keys = ("layer3", "layer4", "attnpool")
    missing = [k for k in keys if k not in vis]
    if missing:
        raise ValueError(f"not an RN visual tower (missing {missing}); "
                         "use split_last_blocks for transformer towers")
    trainable = {"visual": {k: vis[k] for k in keys}}
    frozen = dict(clip_params)
    frozen["visual"] = {k: (None if k in keys else v) for k, v in vis.items()}
    return trainable, frozen


def merge(frozen: dict, trainable: dict) -> dict:
    """Overlay a trainable subtree back onto the full param tree."""
    out = dict(frozen)
    for tower, sub in trainable.items():
        if tower not in out:
            out[tower] = sub
            continue
        tower_params = dict(out[tower])
        if isinstance(sub, dict) and "blocks" in sub and \
                isinstance(sub["blocks"], dict):
            blocks = list(tower_params["blocks"])
            for i, bp in sub["blocks"].items():
                blocks[i] = bp
            tower_params["blocks"] = blocks
            out[tower] = tower_params
        elif isinstance(sub, dict) and isinstance(tower_params, dict) and \
                all(k in tower_params for k in sub):
            # partial dict overlay (split_rn_image_layers: named submodules
            # rather than indexed blocks)
            tower_params.update(sub)
            out[tower] = tower_params
        else:
            out[tower] = sub
    return out


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
