#!/usr/bin/env python
"""Run YOLOv10 inference on images (TPU-native pipeline).

Counterpart of the reference CLI (reference: tools/infer.py:40-160): same
flags and behavior — `--decode topk` uses the one2one branch (NMS-free),
`--decode nms` uses the one2many branch with conf/IoU thresholds; detections
print per box and render into --save-dir.

Example:
    python tools/infer.py --source dog.jpg --model yolov10s \
        --weights PRETRAINED_COCO --imgsz 640 --decode topk
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="leanyolo-tpu inference")
    p.add_argument("--source", required=True, help="image file or directory")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default="PRETRAINED_COCO", help="'PRETRAINED_COCO', checkpoint path, or 'none'")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--decode", choices=["topk", "nms"], default="topk")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--dtype", choices=["float32", "bf16"], default="float32")
    p.add_argument("--save-dir", default="runs/infer")
    p.add_argument("--class-names", default=None, help="comma-separated; default COCO-80")
    p.add_argument(
        "--classes-ann", default=None,
        help="COCO-style annotations JSON to derive class names from "
        "(reference tools/infer.py:52,167-174); --class-names wins if both given",
    )
    p.add_argument(
        "--preprocess", choices=["host", "device"], default="host",
        help="'host': cv2 letterbox per image (reference-exact pixels); "
        "'device': paste onto a fixed canvas and letterbox on device inside "
        "the same XLA program as the forward (reference letterbox.py:9-91 is "
        "the behavioral spec; parity is at the detection level)",
    )
    p.add_argument(
        "--spatial-parallel", type=int, default=0, metavar="S",
        help="latency mode: run EACH image across S chips by sharding its "
        "height over a (1, S) mesh (GSPMD conv halo exchange over ICI)",
    )
    return p.parse_args()


def list_images(source: str):
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
    path = Path(source)
    if path.is_dir():
        return sorted(p for p in path.iterdir() if p.suffix.lower() in exts)
    if path.is_file():
        return [path]
    raise FileNotFoundError(source)


def main() -> None:
    args = parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import cv2

    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.coco import coco80_class_names
    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.utils.viz import draw_detections

    if args.class_names:
        class_names = args.class_names.split(",")
    elif args.classes_ann:
        import json

        with open(args.classes_ann, "r", encoding="utf-8") as f:
            cats = json.load(f).get("categories", [])
        class_names = [c.get("name", str(i)) for i, c in enumerate(sorted(cats, key=lambda c: c.get("id", 0)))]
    else:
        class_names = coco80_class_names()
    weights = None if args.weights in ("none", "None", "") else args.weights
    model = get_model(args.model, weights=weights, class_names=class_names)
    mesh = None
    if args.spatial_parallel:
        from leanyolo_tpu.parallel.mesh import make_sp_mesh

        mesh = make_sp_mesh(1, args.spatial_parallel)
    predictor = Predictor(
        model,
        imgsz=args.imgsz,
        decode=args.decode,
        conf_thresh=args.conf,
        iou_thresh=args.iou,
        max_det=args.max_det,
        dtype=args.dtype,
        donate=False,
        mesh=mesh,
    )

    paths = list_images(args.source)
    os.makedirs(args.save_dir, exist_ok=True)
    for path in paths:
        bgr = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if bgr is None:
            print(f"skip unreadable image: {path}")
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        dets = predictor.predict_images([rgb], preprocess=args.preprocess)[0]
        for d in dets:
            x1, y1, x2, y2, score, cls = d[:6]
            name = class_names[int(cls)] if int(cls) < len(class_names) else str(int(cls))
            print(f"{path.name}: {name} ({int(cls)}) {score:.3f} [{x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f}]")
        out = draw_detections(bgr, dets, class_names)
        out_path = os.path.join(args.save_dir, path.name)
        cv2.imwrite(out_path, out)
        print(f"saved: {out_path} ({len(dets)} detections)")


if __name__ == "__main__":
    main()
