#!/usr/bin/env python
"""Regenerate the repo demo visualization image.

Counterpart of reference tools/update_dog_viz.py:1-114 (which refreshes
dog_viz.jpg): runs inference on a demo image and writes the annotated
result. Falls back to a generated synthetic scene when no image is given.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(description="update demo viz image")
    p.add_argument("--source", default=None, help="input image (default: synthetic demo scene)")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default="PRETRAINED_COCO")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--out", default="demo_viz.jpg")
    args = p.parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import cv2
    import numpy as np

    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.coco import coco80_class_names
    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.utils.viz import draw_detections

    if args.source:
        bgr = cv2.imread(args.source, cv2.IMREAD_COLOR)
        if bgr is None:
            raise SystemExit(f"unreadable image: {args.source}")
    else:
        rng = np.random.RandomState(0)
        bgr = np.full((480, 640, 3), 180, np.uint8)
        for _ in range(6):
            x, y = rng.randint(0, 500), rng.randint(0, 340)
            cv2.rectangle(bgr, (x, y), (x + rng.randint(40, 140), y + rng.randint(40, 140)),
                          tuple(int(c) for c in rng.randint(0, 255, 3)), -1)

    weights = None if args.weights in ("none", "None", "") else args.weights
    model = get_model(args.model, weights=weights, class_names=coco80_class_names())
    pred = Predictor(model, imgsz=args.imgsz, decode="topk", conf_thresh=args.conf, donate=False)
    dets = pred.predict_images([cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)])[0]
    out = draw_detections(bgr, dets, coco80_class_names())
    cv2.imwrite(args.out, out)
    print(f"wrote {args.out} ({len(dets)} detections)")


if __name__ == "__main__":
    main()
