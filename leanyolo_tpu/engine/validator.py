"""Batched COCO validation: jitted forward+decode, numpy COCO mAP, CSV log.

TPU-native counterpart of the reference validator
(reference: tools/val.py:89-307). Differences by design:

- batched fixed-shape inference instead of the reference's batch=1 loop
  (north star config: batched val);
- detections stay on device until the whole batch finishes (one transfer);
- FPS measurement uses block_until_ready with the same 5-warmup/30-iteration
  protocol (reference val.py:271-307).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.dataset import CocoDetection, DataLoader
from ..utils.coco_eval import CocoEvaluator
from .predictor import Predictor


def detections_to_coco_arrays(
    dets: np.ndarray,
    num: np.ndarray,
    metas: Sequence[Optional[dict]],
    cat_ids: Sequence[int],
    *,
    decode: str,
    conf_for_topk: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fixed-shape device output -> columnar COCO results (xywh, original
    pixels): (image_ids [N], category_ids [N], boxes_xywh [N,4], scores [N]).

    Pure numpy column math over the whole batch — no per-detection Python
    objects (the round-4 dict loop cost 1.6 ms/img serial in the main
    process; PERF.md input-pipeline roofline). Class index -> dataset
    category_id by sorted id (reference val.py:216-227).
    """
    real = [i for i, m in enumerate(metas) if m is not None]
    if not real:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros((0, 4), np.float32),
            np.zeros(0, np.float32),
        )
    d = np.asarray(dets)[real]  # [n, A, 6]
    nim, A = d.shape[0], d.shape[1]
    gains = np.asarray([metas[i]["gain"] for i in real], np.float32)
    pads = np.asarray([metas[i]["pad"] for i in real], np.float32)
    ohw = np.asarray([metas[i]["orig_hw"] for i in real], np.float32)
    ids = np.asarray([metas[i]["image_id"] for i in real], np.int64)
    if decode == "topk":
        valid = d[:, :, 4] > conf_for_topk if conf_for_topk > 0 else np.ones((nim, A), bool)
    else:
        valid = np.arange(A)[None, :] < np.asarray(num)[real][:, None]
    gw, gh = gains[:, :1], gains[:, 1:2]
    px, py = pads[:, :1], pads[:, 1:2]
    oh, ow = ohw[:, :1], ohw[:, 1:2]
    x1 = np.clip((d[:, :, 0] - px) / gw, 0, ow)
    y1 = np.clip((d[:, :, 1] - py) / gh, 0, oh)
    x2 = np.clip((d[:, :, 2] - px) / gw, 0, ow)
    y2 = np.clip((d[:, :, 3] - py) / gh, 0, oh)
    boxes = np.stack((x1, y1, x2 - x1, y2 - y1), axis=-1)[valid]
    img_col = np.broadcast_to(ids[:, None], (nim, A))[valid]
    cat_col = np.asarray(cat_ids, np.int64)[d[:, :, 5].astype(np.int64)][valid]
    scores = d[:, :, 4][valid]
    return img_col, cat_col, boxes.astype(np.float32, copy=False), scores.astype(np.float32, copy=False)


def detections_to_coco_results(
    dets: np.ndarray,
    num: np.ndarray,
    metas: Sequence[Optional[dict]],
    cat_ids: Sequence[int],
    *,
    decode: str,
    conf_for_topk: float = 0.0,
) -> List[dict]:
    """COCO result DICTS — a thin wrapper over `detections_to_coco_arrays`,
    kept for the JSON boundary (--save-detections) and API compatibility;
    the validation loop itself stays columnar end-to-end."""
    img_col, cat_col, boxes, scores = detections_to_coco_arrays(
        dets, num, metas, cat_ids, decode=decode, conf_for_topk=conf_for_topk
    )
    return [
        {"image_id": i, "category_id": c, "bbox": b, "score": s}
        for i, c, b, s in zip(img_col.tolist(), cat_col.tolist(), boxes.tolist(), scores.tolist())
    ]


def measure_fps(predictor: Predictor, *, batch_size: int = 1, warmup: int = 1, iters: int = 30) -> float:
    """Throughput of the compiled forward+decode (reference val.py:271-307).

    Protocol (same as bench.py; see CLAUDE.md): on the axon-tunneled TPU,
    `block_until_ready` can return early and repeated identical executions are
    served from a cache, so a Python timing loop under-reports. Instead the
    `iters` iterations are chained with a data dependence inside ONE jitted
    fori_loop and a host readback closes the measurement; warmup runs the same
    static shape on a different buffer.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    fn = predictor._fn_raw
    params = predictor.params

    @partial(jax.jit, static_argnames=("n",))
    def chained(p, images, n):
        def body(_, x):
            dets, _num = fn(p, x)
            # Perturbation far below pixel resolution: keeps a data dependence
            # between iterations so XLA cannot elide or deduplicate them.
            return x + (jnp.tanh(jnp.sum(dets)) * 1e-30).astype(x.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n, body, images)[0, 0, 0])

    shape = (batch_size, predictor.imgsz, predictor.imgsz, 3)
    # uint8 pixels, matching what the data pipeline actually feeds (an f32
    # probe would measure a 4x-larger input read than production performs).
    x0 = jnp.zeros(shape, jnp.uint8)
    x1 = jnp.full(shape, 114, jnp.uint8)
    for _ in range(max(1, warmup)):
        float(chained(params, x0, iters))  # compile + warm at the same static n
    t0 = time.perf_counter()
    s = float(chained(params, x1, iters))  # fresh input: no result caching
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return (iters * batch_size) / dt


def _viz_name(ds, m, idx: int, name_mode: str) -> str:
    """Output file name for a viz image (the reference's three naming modes,
    tools/val.py:190-208)."""
    if name_mode == "id":
        return f"{m['image_id']}.jpg"
    if name_mode == "index":
        return f"{idx:06d}.jpg"
    # 'file': the original file name (id->info dict built once — a per-image
    # linear scan over ds.images is O(N*M) per epoch)
    if not hasattr(ds, "_viz_by_id"):
        ds._viz_by_id = {im["id"]: im for im in ds.images}
    info = ds._viz_by_id.get(m["image_id"])
    return os.path.basename(info["file_name"]) if info else f"{idx:06d}.jpg"


def _save_viz_batch(batch, dets, num, ds, *, decode, viz_dir, conf, name_mode, start_index) -> int:
    """Render detections on letterboxed batch images (reference val.py:190-208)."""
    import cv2

    from ..utils.viz import draw_detections

    os.makedirs(viz_dir, exist_ok=True)
    idx = start_index
    for i, m in enumerate(batch.meta):
        if m is None:
            continue
        d = dets[i]
        d = d[: int(num[i])] if decode != "topk" else d[d[:, 4] > conf]
        bgr = cv2.cvtColor(batch.images[i].astype(np.uint8), cv2.COLOR_RGB2BGR)
        out = draw_detections(bgr, d, ds.class_names)
        cv2.imwrite(os.path.join(viz_dir, _viz_name(ds, m, idx, name_mode)), out)
        idx += 1
    return idx


def _save_viz_original(raw_imgs, dets, num, metas, ds, *, decode, viz_dir, conf, name_mode, start_index) -> int:
    """Device-preprocess viz: letterboxed pixels never reach the host, so
    render on the ORIGINAL images with detections unletterboxed into original
    coordinates (the same transform the COCO results use)."""
    import cv2

    from ..utils.viz import draw_detections

    os.makedirs(viz_dir, exist_ok=True)
    idx = start_index
    for i, m in enumerate(metas):
        if m is None:
            continue
        d = np.array(dets[i], copy=True)
        d = d[: int(num[i])] if decode != "topk" else d[d[:, 4] > conf]
        gw, gh = m["gain"]
        px, py = m["pad"]
        oh, ow = m["orig_hw"]
        d[:, 0] = np.clip((d[:, 0] - px) / gw, 0, ow)
        d[:, 1] = np.clip((d[:, 1] - py) / gh, 0, oh)
        d[:, 2] = np.clip((d[:, 2] - px) / gw, 0, ow)
        d[:, 3] = np.clip((d[:, 3] - py) / gh, 0, oh)
        bgr = cv2.cvtColor(np.asarray(raw_imgs[i], np.uint8), cv2.COLOR_RGB2BGR)
        out = draw_detections(bgr, d, ds.class_names)
        cv2.imwrite(os.path.join(viz_dir, _viz_name(ds, m, idx, name_mode)), out)
        idx += 1
    return idx


def validate_coco(
    model,
    *,
    images_dir: str,
    ann_json: str,
    imgsz: int = 640,
    batch_size: int = 16,
    decode: str = "topk",
    conf_thresh: float = 0.001,
    iou_thresh: float = 0.65,
    max_det: int = 300,
    max_images: Optional[int] = None,
    dtype: str = "float32",
    workers: int = 8,
    class_wise_nms: bool = False,
    save_detections: Optional[str] = None,
    measure_speed: bool = False,
    fps_warmup: int = 1,
    predictor: Optional[Predictor] = None,
    viz_dir: Optional[str] = None,
    viz_conf: float = 0.25,
    viz_name_mode: str = "file",
    preprocess: str = "host",
    mesh=None,
    shard: Optional[Tuple[int, int]] = None,
) -> Dict[str, float]:
    """Run COCO bbox validation; returns {'map_50_95', 'map_50', 'map_75', ...}.

    Mirrors reference validate_coco semantics (tools/val.py:89-248): top-k
    decode keeps everything the decoder emits (conf ignored by official
    protocol); NMS decode applies conf/IoU thresholds. Pass `predictor` to
    reuse a compiled program across calls (e.g. per-epoch eval in training).

    viz_name_mode: 'file' (original filename), 'id' (image_id.jpg), or
    'index' (sequential) — the reference's three viz naming modes
    (tools/val.py:190-208).
    """
    ds = CocoDetection(images_dir, ann_json, img_size=imgsz, max_images=max_images)
    if shard is not None and shard[1] > 1:
        # Multi-host validation: each process evaluates a stride-slice of the
        # image list on its LOCAL devices (no per-step collectives, so shards
        # may be unequal — NO images are dropped; dropping any would change
        # the mAP), then the per-process results merge via one allgather
        # before scoring (see _finish_sharded).
        pid, nprocs = shard
        ds.images = ds.images[pid::nprocs]
    loader = DataLoader(ds, batch_size=batch_size, shuffle=False, workers=workers, max_boxes=1)

    if predictor is None:
        predictor = Predictor(
            model,
            imgsz=imgsz,
            decode=decode,
            conf_thresh=conf_thresh,
            iou_thresh=iou_thresh,
            max_det=max_det,
            class_wise_nms=class_wise_nms,
            dtype=dtype,
            donate=False,
            mesh=mesh,
        )
    else:
        import jax

        # Refresh weights but keep the compiled program; stage on device so
        # per-batch calls don't re-upload host arrays.
        predictor.update_params(model.params)

    import jax.numpy as jnp

    chunks: List[tuple] = []  # columnar per-batch results (shard merge / JSON)
    n_images = 0
    viz_index = 0
    # Single-process: score incrementally so conversion + matching overlap
    # the device step (the round-4 serial tail). Sharded: chunks merge
    # across processes first; process 0 scores once at the end.
    evaluator = None
    if shard is None or shard[1] <= 1:
        evaluator = CocoEvaluator(_load_gt(ann_json, max_images))
    t0 = time.perf_counter()

    def _consume(dets_h, num_h, metas, viz_payload) -> None:
        """Host work for one batch: d2h readback, columnar conversion,
        incremental scoring, viz. Runs while the NEXT batch executes on
        device (the caller dispatches before consuming)."""
        nonlocal n_images, viz_index
        dets = np.asarray(dets_h)
        num = np.asarray(num_h)
        cols = detections_to_coco_arrays(dets, num, metas, ds.cat_ids, decode=decode, conf_for_topk=0.0)
        chunks.append(cols)
        if evaluator is not None:
            evaluator.add_detections_arrays(*cols)
            evaluator.score_images([m["image_id"] for m in metas if m is not None])
        if viz_dir and viz_payload is not None:
            kind, payload = viz_payload
            if kind == "batch":
                viz_index = _save_viz_batch(
                    payload, dets, num, ds, decode=decode, viz_dir=viz_dir, conf=viz_conf,
                    name_mode=viz_name_mode, start_index=viz_index,
                )
            else:
                # Letterboxed pixels live on device in this mode; render on
                # the ORIGINAL images with unletterboxed coordinates.
                viz_index = _save_viz_original(
                    payload, dets, num, metas, ds, decode=decode, viz_dir=viz_dir,
                    conf=viz_conf, name_mode=viz_name_mode, start_index=viz_index,
                )
        n_images += sum(m is not None for m in metas)

    pending = None
    if preprocess == "device":
        for dets_h, num_h, metas, raw_imgs in _iter_device_preprocess(ds, predictor, batch_size, workers):
            if pending is not None:
                _consume(*pending)
            pending = (dets_h, num_h, metas, ("original", raw_imgs) if viz_dir else None)
    else:
        for batch in loader:
            dets_h, num_h = predictor.run_batch(jnp.asarray(batch.images))  # async dispatch
            if pending is not None:
                _consume(*pending)
            metas = [
                None
                if m is None
                else {"image_id": m["image_id"], "gain": m["gain"], "pad": m["pad"], "orig_hw": m["orig_hw"]}
                for m in batch.meta
            ]
            pending = (dets_h, num_h, metas, ("batch", batch) if viz_dir else None)
    if pending is not None:
        _consume(*pending)
    wall = time.perf_counter() - t0
    return _finish_sharded(
        chunks, evaluator, n_images, wall, ann_json, max_images, save_detections,
        measure_speed, fps_warmup, predictor, shard,
    )


def _iter_device_preprocess(ds: CocoDetection, predictor: Predictor, batch_size: int, workers: int):
    """Yield (dets, num, metas, raw_imgs) with letterboxing done on device.

    Raw decoded images go onto a fixed canvas (host memcpy only); the
    resize/pad warp runs inside the predictor's compiled program. The canvas
    bucket is chosen per dataset from the annotation-declared image sizes so
    the program compiles once.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from ..ops.letterbox import canvas_batch, dataset_canvas_size

    canvas_size = dataset_canvas_size(ds.images, ds.img_size)

    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        for s in range(0, len(ds), batch_size):
            idxs = list(range(s, min(s + batch_size, len(ds))))
            imgs = list(pool.map(ds.load_image, idxs))
            n_real = len(imgs)
            while len(imgs) < batch_size:  # fixed-shape padding batch
                imgs.append(imgs[0])
            canvas, new_hw, pads, hw, cmetas = canvas_batch(imgs, ds.img_size, canvas_size=canvas_size)
            dets, num = predictor.run_canvas(canvas, jnp.asarray(new_hw), jnp.asarray(pads), jnp.asarray(hw))
            metas = [
                {
                    "image_id": ds.images[idxs[i]]["id"],
                    "gain": cmetas[i][0],
                    "pad": cmetas[i][1],
                    "orig_hw": cmetas[i][2],
                }
                if i < n_real
                else None
                for i in range(batch_size)
            ]
            # Device handles, NOT numpy: the caller pipelines one batch deep
            # and reads back while the next batch executes.
            yield dets, num, metas, imgs


def _load_gt(ann_json: str, max_images: Optional[int]) -> dict:
    with open(ann_json, "r", encoding="utf-8") as f:
        gt = json.load(f)
    if max_images:
        keep = {im["id"] for im in sorted(gt["images"], key=lambda im: im["id"])[: int(max_images)]}
        gt = {
            "images": [im for im in gt["images"] if im["id"] in keep],
            "annotations": [a for a in gt["annotations"] if a["image_id"] in keep],
            "categories": gt["categories"],
        }
    return gt


def _finish_sharded(chunks, evaluator, n_images, wall, ann_json, max_images,
                    save_detections, measure_speed, fps_warmup, predictor, shard):
    """Sharded multi-host finish: merge per-process columnar detections,
    score ONCE on process 0 (the numpy evaluator is the expensive leg at
    full-COCO scale — running it on every host is pure waste), then share
    the small stats dict so every process returns the identical global
    numbers. Cluster wall time is the SLOWEST shard's wall (local wall
    would overstate distributed throughput). Single-process: plain
    _finish with the incrementally-fed evaluator."""
    if shard is None or shard[1] <= 1:
        return _finish(chunks, evaluator, n_images, wall, save_detections,
                       measure_speed, fps_warmup, predictor)
    import jax

    from ..parallel.distributed import allgather_obj

    # allgather_obj is JSON-based: ship the columnar chunks as plain lists
    # (still far smaller than per-detection dicts — no repeated keys).
    payload = [tuple(col.tolist() for col in c) for c in chunks]
    merged = allgather_obj({"c": payload, "n": n_images, "w": wall})
    chunks = [
        (
            np.asarray(c[0], np.int64),
            np.asarray(c[1], np.int64),
            np.asarray(c[2], np.float32).reshape(-1, 4),
            np.asarray(c[3], np.float32),
        )
        for m in merged
        for c in m["c"]
    ]
    n_images = sum(m["n"] for m in merged)
    wall = max(m["w"] for m in merged)
    stats = None
    if jax.process_index() == 0:
        evaluator = CocoEvaluator(_load_gt(ann_json, max_images))
        for c in chunks:
            evaluator.add_detections_arrays(*c)
        stats = _finish(chunks, evaluator, n_images, wall, save_detections,
                        measure_speed, fps_warmup, predictor)
    return allgather_obj(stats)[0]


def _finish(chunks, evaluator, n_images, wall, save_detections, measure_speed, fps_warmup, predictor):
    if save_detections:
        # The ONLY per-detection Python loop left, and only at the explicit
        # JSON boundary (same dict schema the reference emits, val.py:216-227).
        os.makedirs(os.path.dirname(os.path.abspath(save_detections)), exist_ok=True)
        results = [
            {"image_id": i, "category_id": c, "bbox": b, "score": s}
            for img_col, cat_col, boxes, scores in chunks
            for i, c, b, s in zip(img_col.tolist(), cat_col.tolist(), boxes.tolist(), scores.tolist())
        ]
        with open(save_detections, "w", encoding="utf-8") as f:
            json.dump(results, f)

    stats = evaluator.evaluate()
    stats["n_images"] = n_images
    stats["wall_s"] = wall
    stats["throughput_ips"] = n_images / wall if wall > 0 else 0.0
    if measure_speed:
        stats["fps"] = measure_fps(predictor, batch_size=1, warmup=fps_warmup)
    return stats
