#!/usr/bin/env python
"""COCO validation CLI (batched TPU inference + numpy COCO mAP + CSV log).

Counterpart of the reference validator CLI (reference: tools/val.py:309-405):
same dataset resolution (explicit dirs -> <root>/annotations.json subset ->
download val2017), decode modes, FPS measurement, and the 27-column CSV
run-log row.

Example:
    python tools/val.py --model yolov10s --weights PRETRAINED_COCO \
        --data-root datasets/coco --imgsz 640 --decode topk
"""

from __future__ import annotations

import argparse
import os
import sys
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="leanyolo-tpu COCO validation")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default="PRETRAINED_COCO")
    p.add_argument("--data-root", default="datasets/coco")
    p.add_argument("--images-dir", default=None)
    p.add_argument("--ann-json", default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--decode", choices=["topk", "nms"], default="topk")
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.65)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--class-wise-nms", action="store_true", help="per-class NMS (offset trick)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--dtype", choices=["float32", "bf16"], default="float32")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--save-detections", default=None)
    p.add_argument(
        "--viz-dir", default=None,
        help="save annotated images here (letterboxed pixels under host "
        "preprocessing; original images with unletterboxed boxes under "
        "--preprocess device, where the letterboxed pixels stay on device)",
    )
    p.add_argument("--viz-conf", type=float, default=0.25)
    p.add_argument("--viz-name-mode", choices=["file", "id", "index"], default="file")
    p.add_argument("--measure-fps", action="store_true")
    p.add_argument(
        "--warmup-iters", type=int, default=1,
        help="warm passes of the chained FPS loop before measuring "
        "(reference tools/val.py:83; one pass compiles AND warms here)",
    )
    p.add_argument(
        "--preprocess", choices=["host", "device"], default="host",
        help="'device' letterboxes on-TPU inside the compiled program (fixed canvas + bilinear warp)",
    )
    p.add_argument(
        "--data-parallel", type=int, default=0, metavar="N",
        help="shard eval batches over an N-device mesh (0 = single device)",
    )
    p.add_argument(
        "--spatial-parallel", type=int, default=0, metavar="S",
        help="shard image HEIGHT over S devices (GSPMD conv halo exchange); "
        "composes with --data-parallel into a (data, space) mesh — "
        "total chips = N*S (latency mode: --data-parallel 1 --spatial-parallel S)",
    )
    p.add_argument(
        "--tensor-parallel", type=int, default=0, metavar="M",
        help="shard conv filters (output channels) over M devices; composes "
        "with --data-parallel into a (data, model) mesh — total chips = N*M",
    )
    from leanyolo_tpu.parallel.distributed import add_distributed_args

    add_distributed_args(
        p,
        batch_semantics="NOTE: --batch-size is PER-PROCESS here (sharded "
        "eval has no cross-host step), unlike the trainer CLIs where it is "
        "the global batch; detections merge via one allgather and every "
        "process reports the global mAP",
    )
    p.add_argument("--log-csv", default="runs/val_log.csv")
    p.add_argument("--notes", default="")
    p.add_argument("--run-id", default=None, help="CSV run identifier override (reference tools/val.py:374)")
    return p.parse_args()


def resolve_dataset(args):
    """Explicit dirs -> <root>/annotations.json subset -> ensure_coco_val.

    Mirrors reference tools/val.py:251-268.
    """
    if args.images_dir and args.ann_json:
        return args.images_dir, args.ann_json
    root = Path(args.data_root)
    subset_ann = root / "annotations.json"
    if subset_ann.exists():
        images_dir = root / "images" if (root / "images").is_dir() else root
        return str(images_dir), str(subset_ann)
    from leanyolo_tpu.data.coco import ensure_coco_val

    return ensure_coco_val(str(root))


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

    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco
    from leanyolo_tpu.utils.val_log import append_row, collect_env_info, now_iso

    images_dir, ann_json = resolve_dataset(args)
    with open(ann_json, "r", encoding="utf-8") as f:
        cats = json.load(f)["categories"]
    class_names = [c["name"] for c in sorted(cats, key=lambda c: c["id"])]

    weights = None if args.weights in ("none", "None", "") else args.weights
    model = get_model(args.model, weights=weights, class_names=class_names)

    mesh = None
    if args.spatial_parallel and args.tensor_parallel:
        raise SystemExit("--spatial-parallel and --tensor-parallel are mutually exclusive")
    if args.spatial_parallel or args.tensor_parallel:
        from leanyolo_tpu.parallel.mesh import make_sp_mesh, make_tp_mesh

        if args.distributed and nprocs > 1:
            raise SystemExit("--spatial/tensor-parallel do not compose with --distributed")
        n_data = args.data_parallel or 1
        mesh = (
            make_sp_mesh(n_data, args.spatial_parallel)
            if args.spatial_parallel
            else make_tp_mesh(n_data, args.tensor_parallel)
        )
        if args.batch_size % n_data:
            raise SystemExit("--batch-size must be divisible by --data-parallel")
    elif args.data_parallel:
        from leanyolo_tpu.parallel.mesh import make_mesh

        # Under --distributed the DP mesh stays LOCAL to this process (its
        # own chips): each process's sharded eval slice runs collective-free.
        mesh = make_mesh(args.data_parallel, local=args.distributed and nprocs > 1)
        if args.batch_size % args.data_parallel:
            raise SystemExit("--batch-size must be divisible by --data-parallel")

    stats = validate_coco(
        model,
        images_dir=images_dir,
        ann_json=ann_json,
        imgsz=args.imgsz,
        batch_size=args.batch_size,
        decode=args.decode,
        conf_thresh=args.conf,
        iou_thresh=args.iou,
        max_det=args.max_det,
        max_images=args.max_images,
        dtype=args.dtype,
        workers=args.workers,
        class_wise_nms=args.class_wise_nms,
        save_detections=args.save_detections if pid == 0 else None,
        measure_speed=args.measure_fps,
        fps_warmup=args.warmup_iters,
        viz_dir=args.viz_dir if pid == 0 else None,
        viz_conf=args.viz_conf,
        viz_name_mode=args.viz_name_mode,
        preprocess=args.preprocess,
        mesh=mesh,
        shard=(pid, nprocs) if args.distributed and nprocs > 1 else None,
    )
    print(
        f"mAP50-95={stats['map_50_95']:.5f} mAP50={stats['map_50']:.5f} "
        f"mAP75={stats['map_75']:.5f} images={stats['n_images']} "
        f"throughput={stats['throughput_ips']:.1f} img/s"
        + (f" fps={stats['fps']:.1f}" if "fps" in stats else "")
    )

    if pid != 0:
        return  # CSV logging is process 0's job
    env = collect_env_info(device="tpu")
    append_row(
        Path(args.log_csv),
        {
            "timestamp": now_iso(),
            "run_id": args.run_id or uuid.uuid4().hex[:8],
            **env,
            "runtime": "jax",
            "precision": "bf16" if args.dtype == "bf16" else "fp32",
            "model": args.model,
            "weights": args.weights,
            "dataset": "coco",
            "images_dir": images_dir,
            "ann_json": ann_json,
            "split": "val2017",
            "n_images": stats["n_images"],
            "imgsz": args.imgsz,
            "conf": args.conf,
            "iou": args.iou,
            "max_images": args.max_images or "",
            "map_50_95": f"{stats['map_50_95']:.5f}",
            "map_50": f"{stats['map_50']:.5f}",
            "map_75": f"{stats['map_75']:.5f}",
            "fps": f"{stats.get('fps', ''):.1f}" if "fps" in stats else "",
            "detections_json": args.save_detections or "",
            "viz_dir": args.viz_dir or "",
            "notes": args.notes,
        },
    )
    print(f"logged: {args.log_csv}")


if __name__ == "__main__":
    main()
