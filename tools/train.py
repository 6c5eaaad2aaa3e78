#!/usr/bin/env python
"""Baseline trainer CLI (COCO-format data, AdamW + cosine, per-epoch eval).

Counterpart of the reference baseline trainer (reference: tools/train.py:
135-309): same flags (--freeze-backbone freezes neck too, --head-reset),
per-epoch COCO eval and checkpointing with the same metadata keys. Runs
data-parallel over all local TPU chips when --data-parallel is set.

Example:
    python tools/train.py --train-images d/train --train-ann d/train/_annotations.coco.json \
        --val-images d/valid --val-ann d/valid/_annotations.coco.json --epochs 10
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="leanyolo-tpu baseline trainer")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default=None, help="'PRETRAINED_COCO', ckpt path, or None")
    p.add_argument("--train-images", required=True)
    p.add_argument("--train-ann", required=True)
    p.add_argument("--val-images", default=None)
    p.add_argument("--val-ann", default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--warmup-epochs", type=int, default=1)
    p.add_argument("--grad-clip", type=float, default=0.0)
    p.add_argument("--freeze-backbone", action="store_true", help="freeze backbone+neck")
    p.add_argument("--head-reset", action="store_true", help="re-init head with fresh random weights")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--max-boxes", type=int, default=128)
    p.add_argument(
        "--preprocess", choices=["host", "device"], default="host",
        help="'host': cv2 letterbox per image on CPU; 'device': raw pixels "
        "ship on a fixed canvas and the letterbox warp + affine GT-box "
        "transform run inside the compiled train step (the 1-core host "
        "pipeline then only decodes and memcpys)",
    )
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--data-parallel", action="store_true")
    from leanyolo_tpu.parallel.distributed import add_distributed_args

    add_distributed_args(
        p,
        batch_semantics="--batch-size is the GLOBAL batch (divided across "
        "processes); the TAL pad pins to --max-boxes for identical programs "
        "— pass a realistic value (e.g. 32 for COCO-like data)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default="runs/train")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=10, help="print loss every N steps (reference tools/train.py:251)")
    p.add_argument("--eval-conf", type=float, default=0.001, help="per-epoch eval score threshold (reference tools/train.py:284)")
    p.add_argument("--eval-iou", type=float, default=0.65, help="per-epoch eval NMS IoU (only used with nms decode paths)")
    p.add_argument(
        "--resume", action="store_true",
        help="resume from <out-dir>/last.npz + train_state.npz (exact: optimizer "
        "moments, step counter, augment PRNG stream, and shuffle order all restore)",
    )
    return p.parse_args()


def main() -> None:
    args = parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    nprocs, pid = 1, 0
    if args.distributed:
        # Must run before anything touches the XLA backend (jax.distributed
        # contract), i.e. before model/dataset construction below.
        from leanyolo_tpu.parallel.distributed import cli_distributed_setup

        nprocs, pid = cli_distributed_setup(args.coordinator, args.num_processes, args.process_id)

    import json

    import jax
    import numpy as np

    if args.distributed:
        print(f"distributed: process {pid}/{nprocs}, {jax.local_device_count()} local devices")

    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.dataset import CocoDetection, DataLoader
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.engine.validator import validate_coco
    from leanyolo_tpu.models.registry import save_checkpoint
    from leanyolo_tpu.models.yolov10.model import head_init

    with open(args.train_ann, "r", encoding="utf-8") as f:
        cats = json.load(f)["categories"]
    class_names = [c["name"] for c in sorted(cats, key=lambda c: c["id"])]

    weights = None if args.weights in (None, "none", "None", "") else args.weights
    model = get_model(args.model, weights=weights, class_names=class_names, seed=args.seed)
    if args.head_reset:
        model.params["head"] = head_init(
            jax.random.PRNGKey(args.seed + 1), model.nc, model.cfg.neck_out, model.cfg.reg_max
        )

    ds = CocoDetection(
        args.train_images, args.train_ann, img_size=args.imgsz,
        max_images=args.max_images, preprocess=args.preprocess,
    )

    local_bs = args.batch_size
    if args.distributed and nprocs > 1:
        # Disjoint per-process shard of the image list, trimmed so every
        # process sees the SAME number of steps per epoch (unequal lengths
        # would deadlock the collectives at the epoch tail).
        from leanyolo_tpu.parallel.distributed import shard_image_list

        try:
            ds.images = shard_image_list(ds.images, pid, nprocs)
        except ValueError as e:
            raise SystemExit(str(e))
        if args.batch_size % nprocs:
            raise SystemExit(f"--batch-size (global) must be divisible by {nprocs} processes")
        local_bs = args.batch_size // nprocs

    loader = DataLoader(
        ds,
        batch_size=local_bs,
        shuffle=True,
        max_boxes=args.max_boxes,
        workers=args.workers,
        seed=args.seed,
    )
    steps_per_epoch = max(1, len(loader))

    mesh = None
    if args.distributed:
        from leanyolo_tpu.parallel.mesh import make_hybrid_mesh

        mesh = make_hybrid_mesh()
        if args.batch_size % mesh.devices.size:
            raise SystemExit(f"--batch-size must be divisible by {mesh.devices.size} devices")
        if nprocs > 1:
            from leanyolo_tpu.parallel.distributed import warmup_collectives

            warmup_collectives(mesh)
        print(f"hybrid data-parallel over {mesh.devices.shape} (dcn, ici) devices")
    elif args.data_parallel:
        from leanyolo_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if args.batch_size % mesh.devices.size:
            raise SystemExit(f"--batch-size must be divisible by {mesh.devices.size} devices")
        print(f"data-parallel over {mesh.devices.size} devices")

    cfg = TrainConfig(
        lr=args.lr,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        freeze_backbone=args.freeze_backbone,
        unfreeze_epoch=args.epochs + 1 if args.freeze_backbone else 0,  # baseline: frozen for the whole run
        grad_clip=args.grad_clip,
        bf16=args.bf16,
        augment=args.augment,
        steps_per_epoch=steps_per_epoch,
        device_preprocess=args.preprocess == "device",
        imgsz=args.imgsz,
    )
    trainer = Trainer(model, cfg, mesh=mesh)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    start_epoch = 0
    if args.resume:
        from leanyolo_tpu.models.registry import load_checkpoint_into

        last_ckpt = out_dir / "last.npz"
        state_ckpt = out_dir / "train_state.npz"
        have = last_ckpt.exists() and state_ckpt.exists()
        if args.distributed and nprocs > 1:
            # Checkpoints are written by process 0 only, so --resume needs a
            # SHARED --out-dir. Agree on availability across processes BEFORE
            # anyone exits — a lone SystemExit would leave the others hung at
            # their first collective.
            from jax.experimental import multihost_utils

            all_have = bool(multihost_utils.process_allgather(np.asarray(have)).all())
            if not all_have:
                raise SystemExit(
                    f"--resume: {last_ckpt} / {state_ckpt} not visible on every process "
                    "(process 0 writes them — point --out-dir at a shared filesystem)"
                )
        elif not have:
            raise SystemExit(f"--resume: {last_ckpt} / {state_ckpt} not found")
        load_checkpoint_into(model, str(last_ckpt))
        trainer.load_train_state(str(state_ckpt))
        start_epoch = trainer.global_step // steps_per_epoch
        print(f"resumed from {out_dir} at epoch {start_epoch} (step {trainer.global_step})")

    base_key = jax.random.PRNGKey(args.seed)

    # Per-epoch metrics log (one JSON line per epoch). Loss means are
    # backend-insensitive convergence evidence (SQA QT-001's secondary gate
    # reads them): mAP gates are chip-calibrated, but "the loss fell 5x+"
    # holds on CPU and TPU alike. Fresh runs truncate; --resume appends.
    history_path = out_dir / "history.jsonl"
    if pid == 0 and not args.resume and history_path.exists():
        history_path.unlink()

    eval_predictor = None
    if args.val_images and args.val_ann and not (args.distributed and nprocs > 1):
        from leanyolo_tpu.engine.predictor import Predictor

        # One compiled eval program reused across epochs.
        eval_predictor = Predictor(
            model, imgsz=args.imgsz, decode="topk", conf_thresh=args.eval_conf,
            iou_thresh=args.eval_iou, donate=False,
        )

    for epoch in range(start_epoch, args.epochs):
        t0 = time.perf_counter()
        nb = 0
        ep_losses: list = []  # device scalars; floated once per epoch (no mid-epoch sync)
        loader.set_epoch(epoch)  # replay the exact shuffle order on resume
        for batch in loader:
            # Key derived from the step counter: resume reproduces the exact
            # augmentation stream of an uninterrupted run.
            sub = jax.random.fold_in(base_key, trainer.global_step)
            losses = trainer.train_step(batch, sub)
            ep_losses.append(losses)
            nb += 1
            if nb % max(1, args.log_interval) == 0 or nb == steps_per_epoch:
                vals = {k: float(losses[k]) for k in ("total", "cls", "reg")}
                print(
                    f"epoch {epoch + 1}/{args.epochs} step {nb}/{steps_per_epoch} "
                    f"total={vals['total']:.4f} cls={vals['cls']:.4f} reg={vals['reg']:.4f}"
                )
        dt = time.perf_counter() - t0
        print(f"epoch {epoch + 1} done in {dt:.1f}s ({nb * args.batch_size / dt:.1f} img/s)")
        epoch_row = {
            "epoch": epoch + 1,
            **{f"loss_{k}": float(np.mean([float(l[k]) for l in ep_losses]))
               for k in ("total", "cls", "reg")},
            "steps": nb,
            "time_s": round(dt, 2),
            "img_s": round(nb * args.batch_size / dt, 2),
        }

        if args.val_images and args.val_ann and (epoch + 1) % args.eval_every == 0 and pid == 0:
            try:
                eval_model = model
                if args.distributed and nprocs > 1:
                    from leanyolo_tpu.parallel.distributed import proc0_local_eval

                    eval_model, eval_predictor = proc0_local_eval(
                        model, eval_predictor, imgsz=args.imgsz, conf_thresh=args.eval_conf
                    )
                stats = validate_coco(
                    eval_model,
                    images_dir=args.val_images,
                    ann_json=args.val_ann,
                    imgsz=args.imgsz,
                    batch_size=local_bs,
                    decode="topk",
                    conf_thresh=args.eval_conf,
                    iou_thresh=args.eval_iou,
                    workers=args.workers,
                    predictor=eval_predictor,
                )
                print(f"epoch {epoch + 1} mAP50-95={stats['map_50_95']:.5f} mAP50={stats['map_50']:.5f}")
                epoch_row["map_50_95"] = round(stats["map_50_95"], 5)
                epoch_row["map_50"] = round(stats["map_50"], 5)
            except Exception as e:  # per-epoch eval failures shouldn't kill training
                print(f"eval failed: {e}")

        if pid == 0:
            with open(history_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(epoch_row) + "\n")
            save_checkpoint(model, str(out_dir / f"epoch{epoch + 1:03d}.npz"), extra_meta={"epoch": epoch + 1})
            save_checkpoint(model, str(out_dir / "last.npz"), extra_meta={"epoch": epoch + 1})
            trainer.save_train_state(str(out_dir / "train_state.npz"))

    if pid == 0:
        save_checkpoint(model, str(out_dir / "ckpt.npz"))
        print(f"saved final checkpoint: {out_dir / 'ckpt.npz'}")


if __name__ == "__main__":
    main()
