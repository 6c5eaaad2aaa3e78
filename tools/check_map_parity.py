#!/usr/bin/env python
"""Check COCO mAP parity against the official published numbers.

Counterpart of reference tools/check_map_parity.py:39-84: runs validation at
conf=0.001 / iou=0.65 with top-k decode and asserts |mAP - official| <= tol.
Official numbers default to the reference README parity table
(reference: README.md:154-159) and can be overridden via --official-map.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Official THU-MIG eval results on COCO val2017 (reference README.md:154-159).
OFFICIAL_MAP = {
    "yolov10n": 0.38480,
    "yolov10s": 0.45866,
    "yolov10m": 0.50999,
    "yolov10b": 0.52303,
    "yolov10l": 0.53018,
    "yolov10x": 0.54231,
}


def main() -> None:
    p = argparse.ArgumentParser(description="mAP parity gate")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default="PRETRAINED_COCO")
    p.add_argument("--data-root", default="datasets/coco")
    p.add_argument("--images-dir", default=None)
    p.add_argument("--ann-json", default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--tolerance", type=float, default=0.01)
    p.add_argument("--official-map", type=float, default=None)
    args = p.parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import json

    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco

    official = args.official_map if args.official_map is not None else OFFICIAL_MAP[args.model]

    if args.images_dir and args.ann_json:
        images_dir, ann_json = args.images_dir, args.ann_json
    else:
        from leanyolo_tpu.data.coco import ensure_coco_val

        images_dir, ann_json = ensure_coco_val(args.data_root)

    with open(ann_json, "r", encoding="utf-8") as f:
        cats = json.load(f)["categories"]
    class_names = [c["name"] for c in sorted(cats, key=lambda c: c["id"])]
    weights = None if args.weights in ("none", "None", "") else args.weights
    model = get_model(args.model, weights=weights, class_names=class_names)

    stats = validate_coco(
        model,
        images_dir=images_dir,
        ann_json=ann_json,
        imgsz=args.imgsz,
        batch_size=args.batch_size,
        decode="topk",
        conf_thresh=0.001,
        iou_thresh=0.65,
        max_images=args.max_images,
    )
    diff = abs(stats["map_50_95"] - official)
    print(f"{args.model}: ours={stats['map_50_95']:.5f} official={official:.5f} diff={diff:.5f} tol={args.tolerance}")
    if diff > args.tolerance:
        raise SystemExit(f"PARITY FAILED: diff {diff:.5f} > tolerance {args.tolerance}")
    print("PARITY OK")


if __name__ == "__main__":
    main()
