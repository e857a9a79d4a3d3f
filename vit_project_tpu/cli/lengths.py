"""Variable-length perturbation CLI.

Reference: Training/clip_behavioral_finetuning/length_experiments/
clip_train_behavior_lengths.py — one (onset epoch E, duration L) condition per
invocation, output layout `{base}/{type}_e{E}_l{L}/training_res.csv` parsed by the
fig4 recovery analysis. Resume semantics preserved:
1. in-place resume by scanning the existing CSV for the last completed epoch;
2. otherwise cross-run resume from the longest shorter-length run at the same
   onset (find_previous_run_dir), pre-populating the CSV;
3. `--perturb_type baseline` mode for the unperturbed trajectory.
"""
from __future__ import annotations

import argparse
import os
import re
from datetime import datetime
from pathlib import Path

from ..core import csvio
from ..core.logs import setup_main_logger
from ..train.clip_loop import run_behavioral_training

# the `{type}_e{E}_l{L}` condition-directory naming shared with the fig4
# recovery analysis (reference layout: clip_train_behavior_lengths.py:128-134)
_CONDITION_DIR = re.compile(r"(?P<kind>.+)_e(?P<onset>\d+)_l(?P<length>\d+)$")
_INJECTOR_KINDS = frozenset(
    ["random_target", "label_shuffle", "uniform_images", "image_noise"])


def find_previous_run_dir(base_dir: str, perturb_type: str, start_epoch: int,
                          current_length: int):
    """Locate the longest already-trained condition at the same onset with a
    strictly smaller window, for cross-run resume (reference behavior:
    clip_train_behavior_lengths.py:188-218). Returns (dir_path, length) or
    (None, None).

    Candidates are ANCHORED like the in-place path (rollback_to_checkpoint)
    and the batched path (_init_length_condition require=resuming): a
    sibling only qualifies if its resume epoch's DoRA + random-state files
    actually exist — a torn sibling (crashed mid-run) must fall through to
    the next shorter one (or a fresh start), not silently resume into a
    fresh adapter. The reference does not anchor (SURVEY §0-style defect)."""
    def _sibling_anchored(path: str, length: int) -> bool:
        epoch1 = max(0, start_epoch - 1) + length
        return (os.path.exists(os.path.join(
                    path, f"dora_params_{start_epoch}",
                    f"epoch{epoch1}_dora_params.pth"))
                and os.path.exists(os.path.join(
                    path, f"random_states_{start_epoch}",
                    f"epoch{epoch1}_random_states.pth")))

    def shorter_siblings():
        for entry in Path(base_dir).iterdir():
            m = _CONDITION_DIR.match(entry.name)
            if m is None or not entry.is_dir():
                continue
            if int(m["onset"]) != start_epoch:
                continue
            if perturb_type in _INJECTOR_KINDS and m["kind"] != perturb_type:
                continue
            length = int(m["length"])
            if length < current_length and _sibling_anchored(str(entry),
                                                             length):
                yield length, str(entry)

    if not os.path.isdir(base_dir):
        return None, None
    best = max(shorter_siblings(), default=None)
    return (None, None) if best is None else (best[1], best[0])


def rollback_to_checkpoint(dora_dir: str, last_epoch0: int,
                           rs_dir: str | None = None) -> int:
    """Newest 1-indexed epoch <= last_epoch0+1 whose checkpoint state exists
    (0 = none). In-place resume must anchor on an epoch whose state is
    actually on disk: pointing run_behavioral_training at a missing
    epoch{N} file silently falls back to a FRESH adapter (the reference's
    strict=False load), continuing a mid-lineage CSV with meaningless
    numbers. When `rs_dir` is given the anchor additionally requires that
    epoch's random-states file — a DoRA file whose random states are missing
    (legacy CSV-first write order, crash between the two saves) would
    silently resume with a fresh AdamW state and the default data seed, the
    same contaminated-but-continuous-looking CSV this walk exists to
    prevent. With the checkpoint-before-CSV write order at most the final
    row is uncovered; legacy CSV-first trees may need a deeper walk."""
    def _anchored(epoch1: int) -> bool:
        if not os.path.exists(
                os.path.join(dora_dir, f"epoch{epoch1}_dora_params.pth")):
            return False
        return rs_dir is None or os.path.exists(
            os.path.join(rs_dir, f"epoch{epoch1}_random_states.pth"))

    rfe = last_epoch0 + 1
    while rfe > 0 and not _anchored(rfe):
        rfe -= 1
    return rfe


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="CLIP-HBA variable-length "
                                            "perturbation run (TPU-native)")
    p.add_argument("--model", default="clip_hba")
    p.add_argument("--perturb_type", default="random_target",
                   choices=["random_target", "label_shuffle", "uniform_images",
                            "image_noise", "baseline"])
    p.add_argument("--perturb_epoch", type=int, default=None,
                   help="Epoch to perturb (0 for baseline); required unless "
                        "--onsets is given")
    p.add_argument("--perturb_length", type=int, required=True,
                   help="Length of perturbation (0 for baseline)")
    p.add_argument("--perturb_distribution", default="target",
                   choices=["normal", "target"])
    p.add_argument("--perturb_seed", type=int, default=0)
    p.add_argument("--output_dir", default=None,
                   help="e.g. random_target_e2_l2 (relative to base)")
    p.add_argument("--cuda", type=int, default=0)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--early_stopping_patience", type=int, default=20)
    p.add_argument("--random_seed", type=int, default=1)
    p.add_argument("--baseline_dora_directory", required=True)
    p.add_argument("--baseline_random_state_path", required=True)
    p.add_argument("--baseline_split_indices_path", required=True)
    p.add_argument("--output_base_directory", required=True)
    # data/model args (the reference hardcodes relative ../Data paths)
    p.add_argument("--csv_file", default="../Data/spose_embedding66d_rescaled_1806train.csv")
    p.add_argument("--img_dir", default="../Data/Things1854")
    p.add_argument("--inference_csv_file",
                   default="../Data/spose_embedding66d_rescaled_48val_reordered.csv")
    p.add_argument("--RDM48_triplet_dir", default="../Data/RDM48_triplet.mat")
    p.add_argument("--backbone", default="ViT-L/14")
    p.add_argument("--clip_weights", default=None)
    p.add_argument("--bpe_vocab", default=None)
    p.add_argument("--allow_hash_tokenizer", action="store_true",
                   help="permit pretrained weights without a BPE vocab "
                        "(RSA will be scientifically void; testing only)")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each visual block (memory lever for "
                        "backbones whose activations outgrow HBM)")
    p.add_argument("--host_prefetch", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="async d2h of per-epoch checkpoint trees "
                        "(overlaps eval/RSA; core/hostcopy.py). Default ON: "
                        "measured -19%% steady per-epoch on the chip "
                        "(BENCHLOG round 3); --no-host_prefetch to disable")
    p.add_argument("--frozen_cache", action="store_true",
                   help="cache the frozen tower prefixes once and train only "
                        "the adapted suffix blocks (numerically equivalent, "
                        "~92%% fewer fwd FLOPs at the reference config; "
                        "costs ~[N,S,width] HBM; incompatible with "
                        "--sp_devices)")
    # reference hardcodes these (clip_train_behavior_lengths.py:110-112);
    # exposed as flags so forks can match any baseline's adapter config
    p.add_argument("--vision_layers", type=int, default=2)
    p.add_argument("--transformer_layers", type=int, default=1)
    p.add_argument("--rank", type=int, default=32)
    p.add_argument("--onsets", default=None,
                   help="comma-separated perturb onsets, e.g. '3,8,15': "
                        "train ALL (onset x perturb_length) conditions of "
                        "this length in vmapped fork groups on one chip "
                        "(train/multi_fork.run_batched_lengths) instead of "
                        "one condition per invocation. --perturb_epoch/"
                        "--output_dir are ignored; each condition keeps the "
                        "reference {type}_e{E}_l{L}/ layout and the full "
                        "resume ladder.")
    p.add_argument("--batched_forks", type=int, default=8,
                   help="group size for --onsets batching")
    p.add_argument("--fork_devices", type=int, default=1,
                   help="shard the batched fork axis over N local devices "
                        "(see cli/sweep.py --fork_devices)")
    return p


def _base_config(args) -> dict:
    """The run-config template shared by the solo and --onsets modes —
    ONE home, so a flag added to the parser cannot silently train with its
    default in one of the two modes."""
    return {
        "csv_file": args.csv_file,
        "img_dir": args.img_dir,
        "inference_csv_file": args.inference_csv_file,
        "RDM48_triplet_dir": args.RDM48_triplet_dir,
        "backbone": args.backbone,
        "clip_weights": args.clip_weights,
        "bpe_vocab": args.bpe_vocab,
        "allow_hash_tokenizer": args.allow_hash_tokenizer,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "train_portion": 0.8,
        "lr": args.lr,
        "logger": None,
        "early_stopping_patience": args.early_stopping_patience,
        "random_seed": args.random_seed,
        "vision_layers": args.vision_layers,
        "transformer_layers": args.transformer_layers,
        "rank": args.rank,
        "criterion": "mse",
        "cuda": args.cuda,
        "compute_dtype": args.compute_dtype,
        "remat": args.remat,
        "host_prefetch": args.host_prefetch,
        "frozen_cache": args.frozen_cache,
        "baseline_dora_directory": args.baseline_dora_directory,
        "baseline_random_state_path": args.baseline_random_state_path,
        "baseline_split_indices_path": args.baseline_split_indices_path,
        "perturb_type": args.perturb_type,
        "perturb_distribution": args.perturb_distribution,
        "perturb_seed": args.perturb_seed,
        "output_base_directory": args.output_base_directory,
    }


def _main_batched(args, timestamp: str):
    """--onsets mode: every (onset, perturb_length) condition of one length
    trained as vmapped fork groups (train/multi_fork.run_batched_lengths).
    Returns the list of failed condition dir names (empty = all good)."""
    if args.perturb_type == "baseline":
        build_parser().error("--onsets batching is for perturbed conditions; "
                             "run the baseline mode per condition")
    onsets = [int(x) for x in args.onsets.split(",") if x.strip()]
    config = {**_base_config(args), "perturb_length": args.perturb_length}
    from ..train.multi_fork import make_fork_mesh, run_batched_lengths
    # the mesh spans ONE vmapped group's forks, not the whole onset list:
    # sizing it by len(onsets) would pad small groups with ballast forks
    # across chips (sweep's call gets this right with args.batched_forks)
    fork_mesh = make_fork_mesh(args.fork_devices,
                               min(args.batched_forks, len(onsets)))

    os.makedirs(args.output_base_directory, exist_ok=True)
    logger = setup_main_logger(os.path.join(
        args.output_base_directory,
        f"lengths_batched_log_{timestamp}.txt"))
    logger.info(f"Batched lengths mode: type={args.perturb_type} "
                f"length={args.perturb_length} onsets={onsets}")
    from ..core.preempt import PreemptionGuard, exit_if_undispatched
    guard = PreemptionGuard()
    with guard:
        failed = run_batched_lengths(
            config, onsets, args.perturb_length,
            group_size=args.batched_forks, logger=logger, mesh=fork_mesh,
            preempt_guard=guard)
    if failed:
        logger.info(f"Failed conditions: {failed}")
    exit_if_undispatched(guard)  # 143: undispatched conditions resume in place
    return failed


def main(argv=None):
    from ..parallel import dist
    args = build_parser().parse_args(argv)
    # no-op single-process; on a pod launcher (env rendezvous) this
    # initializes jax.distributed so the process-0 write gates and
    # global batch assembly in the training loop see real ranks
    from ..core.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # forks re-use the epoch-scan compile
    dist.setup_distributed()
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")

    if args.onsets is not None:
        return _main_batched(args, timestamp)
    if args.perturb_epoch is None or args.output_dir is None:
        build_parser().error(
            "--perturb_epoch and --output_dir are required "
            "(or pass --onsets for the batched multi-condition mode)")

    config = {
        **_base_config(args),
        "training_run": args.perturb_epoch,
        "resume_from_epoch": max(0, args.perturb_epoch - 1),
    }

    out_dir = os.path.join(args.output_base_directory, args.output_dir)
    config["checkpoint_path"] = os.path.join(
        out_dir, f"model_checkpoint_{args.perturb_epoch}.pth")
    config["training_res_path"] = os.path.join(out_dir, "training_res.csv")
    config["dora_parameters_path"] = os.path.join(
        out_dir, f"dora_params_{args.perturb_epoch}")
    config["random_state_path"] = os.path.join(
        out_dir, f"random_states_{args.perturb_epoch}")

    # in-place resume scan (reference :141-160), anchored on the newest
    # epoch whose checkpoint actually exists — a CSV row without its
    # checkpoint (torn tree) must not resume into a fresh adapter
    last_completed_epoch = csvio.last_completed_epoch0(
        config["training_res_path"])
    resume_epoch = rollback_to_checkpoint(config["dora_parameters_path"],
                                          last_completed_epoch,
                                          rs_dir=config["random_state_path"])
    resume_from_existing = last_completed_epoch >= 0 and resume_epoch > 0

    os.makedirs(out_dir, exist_ok=True)
    logger = setup_main_logger(
        os.path.join(out_dir, f"training_log_{timestamp}.txt"))
    logger.info("=" * 80)
    logger.info("STARTING SINGLE TRAINING RUN")
    logger.info(f"Perturbation Type: {args.perturb_type}")
    logger.info(f"Perturbation Epoch: {args.perturb_epoch}")
    logger.info(f"Perturbation Length: {args.perturb_length}")
    logger.info(f"Output Directory: {out_dir}")
    logger.info("=" * 80)

    if args.perturb_type == "baseline":
        logger.info("Running baseline training (no perturbations)")
        config["perturb_type"] = "baseline"
        config["perturb_length"] = 0
        config["training_run"] = 0
        if resume_from_existing:
            config["resume_from_epoch"] = resume_epoch
            config["previous_training_res_path"] = config["training_res_path"]
            config["resume_random_state_path"] = config["random_state_path"]
            config["resume_dora_parameters_path"] = \
                config["dora_parameters_path"]
            if resume_epoch <= last_completed_epoch:
                logger.info(f"CSV reaches epoch {last_completed_epoch + 1} "
                            f"but the newest checkpoint is epoch "
                            f"{resume_epoch} - rolled back (torn tree)")
            logger.info(f"Resuming existing baseline run from epoch "
                        f"{config['resume_from_epoch'] + 1}")
        else:
            config["resume_from_epoch"] = 0
    else:
        config["perturb_length"] = args.perturb_length
        if resume_from_existing:
            config["resume_from_epoch"] = resume_epoch
            config["previous_training_res_path"] = config["training_res_path"]
            config["resume_random_state_path"] = config["random_state_path"]
            config["resume_dora_parameters_path"] = \
                config["dora_parameters_path"]
            if resume_epoch <= last_completed_epoch:
                logger.info(f"CSV reaches epoch {last_completed_epoch + 1} "
                            f"but the newest checkpoint is epoch "
                            f"{resume_epoch} - rolled back (torn tree)")
            logger.info(f"Resuming existing run from epoch "
                        f"{config['resume_from_epoch'] + 1}")
        else:
            prev_dir, prev_length = find_previous_run_dir(
                args.output_base_directory, args.perturb_type,
                args.perturb_epoch, args.perturb_length)
            if prev_dir and prev_length is not None:
                last_epoch = max(0, args.perturb_epoch - 1) + prev_length
                config["resume_from_epoch"] = last_epoch
                config["previous_training_res_path"] = os.path.join(
                    prev_dir, "training_res.csv")
                config["resume_random_state_path"] = os.path.join(
                    prev_dir, f"random_states_{args.perturb_epoch}")
                config["resume_dora_parameters_path"] = os.path.join(
                    prev_dir, f"dora_params_{args.perturb_epoch}")
                logger.info(f"Detected previous run at '{prev_dir}' with "
                            f"length {prev_length}; resuming from epoch "
                            f"{last_epoch + 1}")
            else:
                logger.info("No previous matching run found; starting from "
                            "baseline epoch.")

    try:
        summary = run_behavioral_training(config)
        if summary.get("preempted"):
            logger.info("TRAINING RUN PREEMPTED (artifacts saved; re-invoke "
                        "to resume in place)")
            import sys
            sys.exit(143)
        logger.info("TRAINING RUN COMPLETED SUCCESSFULLY")
        logger.info(f"Results saved to: {out_dir}")
    except Exception as e:
        logger.error("TRAINING RUN FAILED")
        logger.error(f"Error: {e}")
        raise


if __name__ == "__main__":
    import sys
    # --onsets mode returns the failed-condition list (solo mode re-raises
    # and returns None): exit nonzero so grid automation can detect and
    # retry failed conditions instead of treating them as complete
    sys.exit(1 if main() else 0)
