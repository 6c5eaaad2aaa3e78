"""End-to-end (host-included) validation pipeline measurement — round 4.

The 3567 img/s headline is the chained DEVICE step; this probe measures what
a user of tools/val.py actually gets over a REAL on-disk JPEG directory:
host JPEG decode + letterbox + collate, threaded-prefetch overlapped with
the device forward+decode — and decomposes the wall into its legs so the
host-bound ceiling of this 1-core machine becomes a falsifiable roofline
prediction for real multi-core hosts (like PERF.md's ICI scaling model).

Reference protocol: tools/val.py:271-307 measures its own FPS end-to-end on
real images through a torch DataLoader(num_workers=2) (val.py:118-126).

Legs measured (all on the SAME generated JPEG set, COCO-val-like sizes):
  A. host-only: drain DataLoader (decode+letterbox+collate), no device.
  B. device-only: predictor.run_batch on one staged batch, chained.
  C. end-to-end: validate_coco wall (the product path, prefetch overlapped).
  D. decode-only: cv2.imread microbench -> bytes/image + ms/image for the
     input roofline.
  E. conversion: detections_to_coco_arrays on realistic 300-det batches
     (round 5: columnar numpy; round 4's dict loop was 1.6 ms/img).
  F. scoring: CocoEvaluator add+score_images per batch + the final
     aggregation (round 5: batched matcher, incremental & overlapped;
     round 4's scalar tail was ~2.2 ms/img, serial after the loop).

Writes experiments/logs/pipeline_e2e.json and prints a summary.

Usage:
    python experiments/exp_pipeline_e2e.py [--n 512] [--bs 64] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")


def make_jpeg_valset(root: str, n: int, seed: int = 0):
    """COCO-val-like JPEG directory + annotation json.

    Real COCO val2017 images are mostly 640x480-ish photos of ~50-250 KB.
    Pure random noise is incompressible (decode cost unrealistically high),
    a flat fill is unrealistically cheap; low-frequency random fields
    upsampled with mild noise land in the realistic size band.
    """
    import cv2

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, anns = [], []
    sizes = [(640, 480), (640, 427), (500, 375), (640, 426), (612, 612)]
    total_bytes = 0
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        low = rng.randint(0, 255, (h // 16, w // 16, 3), np.uint8)
        img = cv2.resize(low, (w, h), interpolation=cv2.INTER_CUBIC)
        img = np.clip(img.astype(np.int16) + rng.randint(-12, 12, img.shape, np.int16), 0, 255).astype(np.uint8)
        name = f"{i:012d}.jpg"
        path = os.path.join(img_dir, name)
        cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        total_bytes += os.path.getsize(path)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        # One box per image so the eval path has work to do.
        anns.append({
            "id": i, "image_id": i, "category_id": 1, "iscrowd": 0,
            "bbox": [w * 0.25, h * 0.25, w * 0.5, h * 0.5], "area": w * h * 0.25,
        })
    ann_json = os.path.join(root, "ann.json")
    with open(ann_json, "w", encoding="utf-8") as f:
        json.dump({
            "images": images, "annotations": anns,
            "categories": [{"id": c + 1, "name": f"c{c}"} for c in range(80)],
        }, f)
    return img_dir, ann_json, total_bytes / n


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--variant", default="yolov10s")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--root", default="/tmp/pipe_e2e")
    args = p.parse_args()

    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import cv2

    print(f"generating {args.n} JPEGs...", flush=True)
    img_dir, ann_json, bytes_per_img = make_jpeg_valset(args.root, args.n)
    print(f"avg {bytes_per_img/1024:.0f} KiB/img", flush=True)

    # D. decode-only microbench (the irreducible host cost per image).
    paths = [os.path.join(img_dir, f"{i:012d}.jpg") for i in range(0, args.n, max(1, args.n // 64))]
    for pth in paths[:4]:
        cv2.imread(pth)  # warm page cache
    t0 = time.perf_counter()
    for pth in paths:
        img = cv2.imread(pth, cv2.IMREAD_COLOR)
    decode_ms = (time.perf_counter() - t0) / len(paths) * 1e3

    from leanyolo_tpu.data.dataset import CocoDetection, DataLoader

    # A. host-only leg: full decode+letterbox+collate drain, no device.
    ds = CocoDetection(img_dir, ann_json, img_size=args.imgsz)
    loader = DataLoader(ds, batch_size=args.bs, shuffle=False, workers=args.workers, max_boxes=8)
    n_seen = 0
    t0 = time.perf_counter()
    for batch in loader:
        n_seen += sum(m is not None for m in batch.meta)
    host_wall = time.perf_counter() - t0
    host_ips = n_seen / host_wall
    print(f"A host-only: {host_ips:.1f} img/s ({host_wall:.1f}s)", flush=True)

    # B. device-only leg at the SAME batch size (not the bs128 headline):
    # per-batch run_batch calls with a staged input, per-call overhead
    # included — this is the device leg validate_coco actually pays.
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    model = YOLOv10.create(args.variant, class_names=[f"c{i}" for i in range(80)])
    pred = Predictor(model, imgsz=args.imgsz, decode="topk", conf_thresh=0.001,
                     iou_thresh=0.65, dtype="bfloat16", donate=False)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (args.bs, args.imgsz, args.imgsz, 3), np.uint8))
    d, nn_ = pred.run_batch(x)  # compile
    np.asarray(d)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        d, nn_ = pred.run_batch(x)
        np.asarray(d), np.asarray(nn_)  # same d2h sync the val loop pays
    dev_wall = time.perf_counter() - t0
    dev_ips = iters * args.bs / dev_wall
    print(f"B device-only (bs{args.bs}, per-call): {dev_ips:.1f} img/s", flush=True)

    # E+F. host-tail microbenches on REALISTIC detections: run one real
    # batch through the device, then replicate its output across the set so
    # conversion/scoring see production-shaped data (300 dets/img, conf
    # spread) without paying the tunnel per batch.
    from leanyolo_tpu.engine.validator import detections_to_coco_arrays, _load_gt
    from leanyolo_tpu.utils.coco_eval import CocoEvaluator

    ds_probe = CocoDetection(img_dir, ann_json, img_size=args.imgsz)
    loader_probe = DataLoader(ds_probe, batch_size=args.bs, shuffle=False, workers=args.workers, max_boxes=8)
    batch0 = next(iter(loader_probe))
    dets0, num0 = pred.run_batch(jnp.asarray(batch0.images))
    dets0, num0 = np.asarray(dets0), np.asarray(num0)
    metas0 = [
        None if m is None else
        {"image_id": m["image_id"], "gain": m["gain"], "pad": m["pad"], "orig_hw": m["orig_hw"]}
        for m in batch0.meta
    ]

    # E. conversion per image (columnar math; excludes d2h).
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        cols = detections_to_coco_arrays(dets0, num0, metas0, ds_probe.cat_ids, decode="topk")
    conv_ms = (time.perf_counter() - t0) / (reps * args.bs) * 1e3

    # F. scoring: feed every image of the set with batch0's detections
    # remapped to its image id (same det count/score distribution), score
    # incrementally per batch, then time the final aggregation.
    ev = CocoEvaluator(_load_gt(ann_json, None))
    row_pos = cols[0].astype(np.int64)  # valset image ids are 0..n-1; batch0 = 0..bs-1
    t0 = time.perf_counter()
    for s in range(0, args.n, args.bs):
        n_ids = min(args.bs, args.n - s)
        keep = row_pos < n_ids
        ev.add_detections_arrays(s + row_pos[keep], cols[1][keep], cols[2][keep], cols[3][keep])
        ev.score_images(range(s, s + n_ids))
    score_ms = (time.perf_counter() - t0) / args.n * 1e3
    t0 = time.perf_counter()
    stats_probe = ev.evaluate()
    agg_ms = (time.perf_counter() - t0) / args.n * 1e3
    print(f"E conversion: {conv_ms:.3f} ms/img  F scoring: {score_ms:.3f} ms/img "
          f"+ aggregation {agg_ms:.3f} ms/img (mAP probe {stats_probe['map_50_95']:.3f})", flush=True)

    # C. end-to-end product path (fresh predictor state, prefetch overlapped).
    from leanyolo_tpu.engine.validator import validate_coco

    t0 = time.perf_counter()
    stats = validate_coco(
        model, images_dir=img_dir, ann_json=ann_json, imgsz=args.imgsz,
        batch_size=args.bs, decode="topk", conf_thresh=0.001, iou_thresh=0.65,
        workers=args.workers, dtype="bfloat16", predictor=pred,
    )
    e2e_wall = time.perf_counter() - t0
    # validate_coco wall includes dataset indexing + final CPU mAP scoring;
    # separate the loop rate from the fixed eval tail via its own timing.
    e2e_ips = args.n / e2e_wall
    print(f"C end-to-end: {e2e_ips:.1f} img/s ({e2e_wall:.1f}s, mAP {stats['map_50_95']:.3f})", flush=True)

    # Overlap accounting: with perfect overlap wall ~= max(host, device) + fill;
    # fully serial wall ~= host + device.
    serial = args.n / host_ips + args.n / dev_ips
    best = max(args.n / host_ips, args.n / dev_ips)
    overlap_eff = (serial - e2e_wall) / max(serial - best, 1e-9)

    out = {
        "n_images": args.n, "batch_size": args.bs, "workers": args.workers,
        "variant": args.variant, "imgsz": args.imgsz,
        "bytes_per_image": round(bytes_per_img),
        "decode_ms_per_image_1core": round(decode_ms, 2),
        "host_only_ips": round(host_ips, 1),
        "device_only_ips_percall": round(dev_ips, 1),
        "end_to_end_ips": round(e2e_ips, 1),
        "end_to_end_wall_s": round(e2e_wall, 1),
        "conversion_ms_per_image": round(conv_ms, 3),
        "scoring_ms_per_image": round(score_ms, 3),
        "scoring_agg_ms_per_image": round(agg_ms, 3),
        "overlap_efficiency": round(float(overlap_eff), 3),
        "map_50_95": round(stats["map_50_95"], 4),
        "host_cores": os.cpu_count(),
        "notes": {
            "map_50_95": "synthetic unlabeled-noise JPEGs with one arbitrary box each -- "
                         "mAP here is NOT a model-quality signal, only evidence the eval "
                         "path ran (real-accuracy gates live in the parity/fidelity suites)",
            "overlap_efficiency": "(serial - e2e_wall) / (serial - best); can exceed 1 or go "
                                  "negative on this rig because the axon-tunnel h2d (~44 MB/s) "
                                  "dominates BOTH the device-only leg and the e2e wall -- on "
                                  "tunnel-bound runs this ratio is noise, not a pipeline verdict",
            "device_only_ips_percall": "axon tunnel h2d-bound on this rig, NOT chip throughput "
                                       "(the chip consumes the same batch in ~18 ms; see PERF.md)",
        },
    }
    os.makedirs(LOG_DIR, exist_ok=True)
    with open(os.path.join(LOG_DIR, "pipeline_e2e.json"), "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
