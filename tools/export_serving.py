#!/usr/bin/env python
"""Export a fixed-shape serving artifact (StableHLO) + metadata sidecar.

Counterpart of the reference ONNX export CLI (reference: tools/
export_onnx.py:91-145), including `--validate` which reloads the artifact
and compares detections against the live jitted model (shape + mean/std
parity, export_onnx.py:51-88).

Example:
    python tools/export_serving.py --model yolov10s --weights PRETRAINED_COCO \
        --imgsz 640 --decode topk --out runs/export/yolov10s
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="leanyolo-tpu serving export")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default="PRETRAINED_COCO")
    p.add_argument("--out", default=None, help="output path (default runs/export/<model>)")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument(
        "--sizes", default=None,
        help="comma list of bucket sizes (e.g. 640,960,1280): bucketed "
        "arbitrary-size export — one StableHLO program per size + manifest.json",
    )
    p.add_argument("--decode", choices=["topk", "nms"], default="topk")
    p.add_argument("--max-dets", type=int, default=300)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--pre-topk", type=int, default=1000)
    p.add_argument("--dtype", choices=["float32", "bf16"], default="float32")
    p.add_argument("--static-batch", action="store_true", help="fixed batch=1 instead of dynamic")
    p.add_argument("--no-fuse", action="store_true", help="skip BN folding / RepVGGDW fusion")
    p.add_argument("--class-names", default=None)
    p.add_argument("--validate", action="store_true")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import numpy as np

    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.coco import coco80_class_names
    from leanyolo_tpu.export.serving import build_serving_fn, export_serving, load_exported

    class_names = args.class_names.split(",") if args.class_names else coco80_class_names()
    weights = None if args.weights in ("none", "None", "") else args.weights
    model = get_model(args.model, weights=weights, class_names=class_names)

    if args.sizes:
        from leanyolo_tpu.export.serving import BucketedServing, export_serving_bucketed

        sizes = sorted({int(s) for s in args.sizes.split(",")})
        if args.imgsz not in sizes:
            print(
                f"note: --sizes {args.sizes} overrides --imgsz; {args.imgsz} is NOT "
                f"among the exported buckets (add it to --sizes if you want it served)"
            )
        out = args.out or f"runs/export/{args.model}_{args.decode}_bucketed"
        mpath = export_serving_bucketed(
            model, out, sizes=sizes, decode=args.decode, max_dets=args.max_dets,
            conf=args.conf, iou=args.iou, pre_topk=args.pre_topk, dtype=args.dtype,
            dynamic_batch=not args.static_batch, fuse=not args.no_fuse,
        )
        print(f"exported {len(sizes)} buckets: {mpath}")
        if args.validate:
            # Round-trip: mixed-size images through the bucketed server.
            rs = np.random.RandomState(0)
            imgs = [
                rs.randint(0, 256, (sizes[0] // 2, sizes[0] // 4 * 3, 3), np.uint8),
                rs.randint(0, 256, (max(sizes) * 2, max(sizes), 3), np.uint8),
            ]
            dets = BucketedServing(mpath).predict_images(imgs, apply_conf_filter=False)
            assert len(dets) == len(imgs) and all(d is not None and d.shape[-1] == 6 for d in dets)
            print(f"validate: per-image dets {[d.shape for d in dets]}")
            print("validation PASSED")
        return

    out = args.out or f"runs/export/{args.model}_{args.decode}_{args.imgsz}"
    path = export_serving(
        model,
        out,
        imgsz=args.imgsz,
        decode=args.decode,
        max_dets=args.max_dets,
        conf=args.conf,
        iou=args.iou,
        pre_topk=args.pre_topk,
        dtype=args.dtype,
        dynamic_batch=not args.static_batch,
        fuse=not args.no_fuse,
    )
    print(f"exported: {path} (+ {path}.json)")

    if args.validate:
        import jax.numpy as jnp

        fn, _ = build_serving_fn(
            model, imgsz=args.imgsz, decode=args.decode, max_dets=args.max_dets,
            conf=args.conf, iou=args.iou, pre_topk=args.pre_topk, dtype=args.dtype,
            fuse=not args.no_fuse,
        )
        x = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (1, args.imgsz, args.imgsz, 3)).astype(np.float32))
        ref_dets, ref_num = fn(x)
        got_dets, got_num = load_exported(path)(x)
        ref_dets, got_dets = np.asarray(ref_dets), np.asarray(got_dets)
        assert got_dets.shape == ref_dets.shape, (got_dets.shape, ref_dets.shape)
        mean_diff = float(np.abs(got_dets - ref_dets).mean())
        std_diff = float(np.abs(got_dets.std() - ref_dets.std()))
        num_ok = bool((np.asarray(got_num) == np.asarray(ref_num)).all())
        print(f"validate: shape={got_dets.shape} mean|diff|={mean_diff:.2e} std diff={std_diff:.2e} num_dets match={num_ok}")
        # On TPU, fp32 convs default to bf16 MXU passes; two separate
        # compilations can differ at the ~1e-3 level on pixel-scale outputs.
        if mean_diff > 5e-3 or not num_ok:
            raise SystemExit("validation FAILED")
        print("validation PASSED")


if __name__ == "__main__":
    main()
