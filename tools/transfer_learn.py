#!/usr/bin/env python
"""Best-practice transfer-learning trainer (freeze -> gradual unfreeze, bf16).

Counterpart of the reference transfer trainer
(reference: tools/transfer_learn_aquarium.py:236-531): pretrained weights,
head reset, backbone LR multiplier (0.1), linear-warmup -> cosine schedule,
bf16 mixed precision (the TPU analog of CUDA AMP), grad-clip 1.0, on-device
hflip/brightness-contrast augmentation, gradual unfreeze at --unfreeze-epoch,
per-epoch COCO eval + checkpoints, file+stream logging.

Works on any COCO-format dataset; pair with tools/prepare_aquarium.py for
the reference's Aquarium recipe.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="leanyolo-tpu transfer learning")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default="PRETRAINED_COCO")
    p.add_argument("--train-images", required=True)
    p.add_argument("--train-ann", required=True)
    p.add_argument("--val-images", required=True)
    p.add_argument("--val-ann", required=True)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--bb-lr-mult", type=float, default=0.1)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--warmup-epochs", type=int, default=2)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--unfreeze-epoch", type=int, default=5)
    p.add_argument("--no-freeze-backbone", action="store_true")
    p.add_argument("--no-head-reset", action="store_true")
    p.add_argument("--no-amp", action="store_true", help="disable bf16 compute")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--max-boxes", type=int, default=128)
    p.add_argument(
        "--preprocess", choices=["host", "device"], default="host",
        help="'device' fuses the letterbox warp + affine GT-box transform "
        "into the compiled train step (host only decodes and memcpys)",
    )
    p.add_argument("--max-images", type=int, default=None, help="train debug subset size (reference --debug-train-size)")
    p.add_argument("--max-val-images", type=int, default=None, help="eval debug subset size (reference --debug-val-size)")
    p.add_argument("--eval-every", type=int, default=1, help="evaluate every N epochs (reference --debug-eval-every)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--eval-conf", type=float, default=0.001, help="per-epoch eval score threshold (reference --eval-conf)")
    p.add_argument("--eval-iou", type=float, default=0.65, help="per-epoch eval NMS IoU (reference --eval-iou)")
    p.add_argument(
        "--viz-interval", type=int, default=0,
        help="every N steps, decode the current weights on the first train image "
        "and save an annotated snapshot to <out-dir>/viz (reference "
        "transfer_learn_aquarium.py:474-484; 0 = off)",
    )
    p.add_argument(
        "--viz-conf", type=float, default=0.25,
        help="score threshold for train-viz snapshots (reference filters viz at "
        "its eval-conf default 0.25; ours defaults eval-conf to the mAP "
        "convention 0.001, so viz gets its own knob)",
    )
    p.add_argument("--data-parallel", action="store_true")
    from leanyolo_tpu.parallel.distributed import add_distributed_args

    add_distributed_args(
        p,
        batch_semantics="--batch-size is the GLOBAL batch (divided across "
        "processes); pass a realistic --max-boxes (TAL pad pins to it for "
        "identical programs)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", default="runs/transfer")
    return p.parse_args()


def setup_logger(out_dir: Path, *, file: bool = True) -> logging.Logger:
    """file=False keeps stream-only output — non-zero distributed processes
    must not append to a shared out-dir's train.log concurrently."""
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger("transfer")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(message)s")
    if file:
        fh = logging.FileHandler(out_dir / "train.log")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    return logger


def main() -> None:
    args = parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    nprocs, pid = 1, 0
    if args.distributed:
        # Must run before anything touches the XLA backend.
        from leanyolo_tpu.parallel.distributed import cli_distributed_setup

        nprocs, pid = cli_distributed_setup(args.coordinator, args.num_processes, args.process_id)

    import json

    import jax

    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.dataset import CocoDetection, DataLoader
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.engine.validator import validate_coco
    from leanyolo_tpu.models.registry import save_checkpoint
    from leanyolo_tpu.models.yolov10.model import head_init

    out_dir = Path(args.out_dir)
    log = setup_logger(out_dir, file=pid == 0)
    log.info(f"RUN START args={vars(args)}")

    with open(args.train_ann, "r", encoding="utf-8") as f:
        cats = json.load(f)["categories"]
    class_names = [c["name"] for c in sorted(cats, key=lambda c: c["id"])]
    log.info(f"classes: {class_names}")

    weights = None if args.weights in (None, "none", "None", "") else args.weights
    if weights is not None and Path(weights).is_file():
        # Local pretrained checkpoint: LENIENT transfer load — a pretrain
        # run's class count need not match the target dataset's (the nc-
        # dependent head leaves keep fresh init and are reset below anyway),
        # mirroring the reference's COCO(80)->Aquarium(7) semantics.
        from leanyolo_tpu.models.registry import load_checkpoint_transfer

        model = get_model(args.model, weights=None, class_names=class_names, seed=args.seed)
        stats = load_checkpoint_transfer(model, weights)
        log.info(
            f"transfer init from {weights}: {stats['loaded']}/{stats['total']} leaves loaded, "
            f"{len(stats['skipped'])} shape-mismatched kept fresh"
        )
    else:
        model = get_model(args.model, weights=weights, class_names=class_names, seed=args.seed)
    if not args.no_head_reset:
        model.params["head"] = head_init(
            jax.random.PRNGKey(args.seed + 1), model.nc, model.cfg.neck_out, model.cfg.reg_max
        )
        log.info("head reset to fresh random init")

    ds = CocoDetection(
        args.train_images, args.train_ann, img_size=args.imgsz,
        max_images=args.max_images, preprocess=args.preprocess,
    )

    local_bs = args.batch_size
    if args.distributed and nprocs > 1:
        from leanyolo_tpu.parallel.distributed import shard_image_list

        try:
            ds.images = shard_image_list(ds.images, pid, nprocs)
        except ValueError as e:
            raise SystemExit(str(e))
        if args.batch_size % nprocs:
            raise SystemExit(f"--batch-size (global) must be divisible by {nprocs} processes")
        local_bs = args.batch_size // nprocs

    loader = DataLoader(
        ds, batch_size=local_bs, shuffle=True, max_boxes=args.max_boxes, workers=args.workers, seed=args.seed
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
        log.info(f"hybrid data-parallel over {mesh.devices.shape} (dcn, ici) devices")
    elif args.data_parallel:
        from leanyolo_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        log.info(f"data-parallel over {mesh.devices.size} devices")

    cfg = TrainConfig(
        lr=args.lr,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        bb_lr_mult=args.bb_lr_mult,
        freeze_backbone=not args.no_freeze_backbone,
        unfreeze_epoch=args.unfreeze_epoch,
        grad_clip=args.grad_clip,
        bf16=not args.no_amp,
        augment=not args.no_augment,
        steps_per_epoch=steps_per_epoch,
        device_preprocess=args.preprocess == "device",
        imgsz=args.imgsz,
    )
    trainer = Trainer(model, cfg, mesh=mesh)
    key = jax.random.PRNGKey(args.seed)

    from leanyolo_tpu.engine.predictor import Predictor

    eval_predictor = None
    if not (args.distributed and nprocs > 1):
        eval_predictor = Predictor(
            model, imgsz=args.imgsz, decode="topk", conf_thresh=args.eval_conf,
            iou_thresh=args.eval_iou, donate=False,
        )

    def save_train_viz(batch) -> None:
        """Decode the CURRENT weights on the first image of the batch and save
        an annotated snapshot (reference transfer_learn_aquarium.py:474-484)."""
        nonlocal eval_predictor
        import cv2
        import numpy as np

        import jax.numpy as jnp

        from leanyolo_tpu.utils.viz import draw_detections

        if args.distributed and nprocs > 1:
            # The trainer's params are GLOBAL arrays committed across all
            # processes' devices — not fully addressable here. proc0_local_eval
            # host-copies them into a purely LOCAL predictor (creating it on
            # the first snapshot, so viz works even before the first eval).
            from leanyolo_tpu.parallel.distributed import proc0_local_eval

            _, eval_predictor = proc0_local_eval(
                model, eval_predictor, imgsz=args.imgsz, conf_thresh=args.eval_conf
            )
        else:
            eval_predictor.update_params(model.params)
        if hasattr(batch, "canvas"):
            # Device-preprocess batch: letterboxed pixels only exist on
            # device. Snapshot from the RAW first image (crop of the canvas)
            # through the predictor's full pipeline; boxes come back in
            # original-image coordinates.
            h, w = (int(v) for v in batch.hw[0])
            raw = np.ascontiguousarray(batch.canvas[0, :h, :w], np.uint8)
            d = eval_predictor.predict_images([raw])[0]
            bgr_src = raw
        else:
            dets, _ = eval_predictor.run_batch(jnp.asarray(batch.images[:1]))
            d = np.asarray(dets)[0]
            bgr_src = np.asarray(batch.images[0], np.uint8)
        d = d[d[:, 4] > args.viz_conf]
        viz_dir = out_dir / "viz"
        viz_dir.mkdir(parents=True, exist_ok=True)
        bgr = cv2.cvtColor(bgr_src, cv2.COLOR_RGB2BGR)
        path = str(viz_dir / f"step{trainer.global_step:06d}.jpg")
        cv2.imwrite(path, draw_detections(bgr, d, class_names))
        log.info(f"[viz] saved: {path}")

    best_map = -1.0
    for epoch in range(args.epochs):
        if cfg.freeze_backbone and epoch == args.unfreeze_epoch:
            log.info(f"UNFREEZE backbone at epoch {epoch + 1}")
        t0 = time.perf_counter()
        running = {"total": 0.0, "cls": 0.0, "reg": 0.0}
        nb = 0
        for batch in loader:
            key, sub = jax.random.split(key)
            losses = trainer.train_step(batch, sub)
            nb += 1
            if (
                args.viz_interval
                and pid == 0
                and trainer.global_step % args.viz_interval == 0
            ):
                save_train_viz(batch)
            if nb == steps_per_epoch:
                for k in running:
                    running[k] = float(losses[k])
        dt = time.perf_counter() - t0
        log.info(
            f"EPOCH {epoch + 1}/{args.epochs} loss={running['total']:.4f} "
            f"cls={running['cls']:.4f} reg={running['reg']:.4f} time={dt:.1f}s"
        )

        if pid == 0 and (epoch + 1) % max(1, args.eval_every) == 0:
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
                    max_images=args.max_val_images,
                    workers=args.workers,
                    predictor=eval_predictor,
                )
                log.info(f"VAL epoch {epoch + 1} mAP50-95={stats['map_50_95']:.5f} mAP50={stats['map_50']:.5f}")
                if stats["map_50_95"] > best_map:
                    best_map = stats["map_50_95"]
                    save_checkpoint(model, str(out_dir / "best.npz"), extra_meta={"epoch": epoch + 1, "map_50_95": best_map})
            except Exception as e:  # eval failures are non-fatal (reference transfer:511-512)
                log.info(f"VAL failed: {e}")

        if pid == 0:
            save_checkpoint(model, str(out_dir / f"epoch{epoch + 1:03d}.npz"), extra_meta={"epoch": epoch + 1})

    if pid == 0:
        save_checkpoint(model, str(out_dir / "ckpt.npz"))
        log.info(f"RUN END best mAP50-95={best_map:.5f}")


if __name__ == "__main__":
    main()
