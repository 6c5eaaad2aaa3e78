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


def detections_to_coco_results(
    dets: np.ndarray,
    num: np.ndarray,
    metas: Sequence[Optional[dict]],
    cat_ids: Sequence[int],
    *,
    decode: str,
    conf_for_topk: float = 0.0,
) -> List[dict]:
    """Fixed-shape device output -> COCO result dicts (xywh, original pixels).

    Class index -> dataset category_id by sorted id (reference val.py:216-227).
    """
    results = []
    for i, meta in enumerate(metas):
        if meta is None:  # padding image
            continue
        d = dets[i]
        if decode == "topk":
            d = d[d[:, 4] > conf_for_topk] if conf_for_topk > 0 else d
        else:
            d = d[: int(num[i])]
        if not len(d):
            continue
        gw, gh = meta["gain"]
        px, py = meta["pad"]
        oh, ow = meta["orig_hw"]
        x1 = np.clip((d[:, 0] - px) / gw, 0, ow)
        y1 = np.clip((d[:, 1] - py) / gh, 0, oh)
        x2 = np.clip((d[:, 2] - px) / gw, 0, ow)
        y2 = np.clip((d[:, 3] - py) / gh, 0, oh)
        for j in range(len(d)):
            results.append(
                {
                    "image_id": int(meta["image_id"]),
                    "category_id": int(cat_ids[int(d[j, 5])]),
                    "bbox": [float(x1[j]), float(y1[j]), float(x2[j] - x1[j]), float(y2[j] - y1[j])],
                    "score": float(d[j, 4]),
                }
            )
    return results


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

    all_results: List[dict] = []
    n_images = 0
    viz_index = 0
    t0 = time.perf_counter()

    if preprocess == "device":
        for dets, num, metas, raw_imgs in _iter_device_preprocess(ds, predictor, batch_size, workers):
            all_results.extend(
                detections_to_coco_results(dets, num, metas, ds.cat_ids, decode=decode, conf_for_topk=0.0)
            )
            if viz_dir:
                # Letterboxed pixels live on device in this mode; instead of
                # reading the warp back, render on the ORIGINAL images with
                # unletterboxed coordinates (same three naming modes).
                viz_index = _save_viz_original(
                    raw_imgs, dets, num, metas, ds, decode=decode, viz_dir=viz_dir,
                    conf=viz_conf, name_mode=viz_name_mode, start_index=viz_index,
                )
            n_images += sum(m is not None for m in metas)
        wall = time.perf_counter() - t0
        return _finish_sharded(
            ds, all_results, n_images, wall, ann_json, max_images, save_detections,
            measure_speed, fps_warmup, predictor, shard,
        )

    for batch in loader:
        dets, num = predictor.run_batch(jnp.asarray(batch.images))
        dets = np.asarray(dets)
        num = np.asarray(num)
        metas = [
            None
            if m is None
            else {"image_id": m["image_id"], "gain": m["gain"], "pad": m["pad"], "orig_hw": m["orig_hw"]}
            for m in batch.meta
        ]
        all_results.extend(
            detections_to_coco_results(dets, num, metas, ds.cat_ids, decode=decode, conf_for_topk=0.0)
        )
        if viz_dir:
            viz_index = _save_viz_batch(
                batch, dets, num, ds, decode=decode, viz_dir=viz_dir, conf=viz_conf,
                name_mode=viz_name_mode, start_index=viz_index,
            )
        n_images += sum(m is not None for m in batch.meta)
    wall = time.perf_counter() - t0
    return _finish_sharded(
        ds, all_results, n_images, wall, ann_json, max_images, save_detections,
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
            yield np.asarray(dets), np.asarray(num), metas, imgs


def _finish_sharded(ds, all_results, n_images, wall, ann_json, max_images,
                    save_detections, measure_speed, fps_warmup, predictor, shard):
    """Sharded multi-host finish: merge per-process detections, score ONCE on
    process 0 (the numpy evaluator costs minutes at full-COCO scale — running
    it on every host is pure waste), then share the small stats dict so every
    process returns the identical global numbers. Cluster wall time is the
    SLOWEST shard's wall (local wall would overstate distributed throughput).
    Single-process: plain _finish."""
    if shard is None or shard[1] <= 1:
        return _finish(ds, all_results, n_images, wall, ann_json, max_images,
                       save_detections, measure_speed, fps_warmup, predictor)
    import jax

    from ..parallel.distributed import allgather_obj

    merged = allgather_obj({"r": all_results, "n": n_images, "w": wall})
    all_results = [d for m in merged for d in m["r"]]
    n_images = sum(m["n"] for m in merged)
    wall = max(m["w"] for m in merged)
    stats = None
    if jax.process_index() == 0:
        stats = _finish(ds, all_results, n_images, wall, ann_json, max_images,
                        save_detections, measure_speed, fps_warmup, predictor)
    return allgather_obj(stats)[0]


def _finish(ds, all_results, n_images, wall, ann_json, max_images, save_detections, measure_speed, fps_warmup, predictor):
    if save_detections:
        os.makedirs(os.path.dirname(os.path.abspath(save_detections)), exist_ok=True)
        with open(save_detections, "w", encoding="utf-8") as f:
            json.dump(all_results, f)

    with open(ann_json, "r", encoding="utf-8") as f:
        gt = json.load(f)
    if max_images:
        keep = {im["id"] for im in sorted(gt["images"], key=lambda im: im["id"])[: int(max_images)]}
        gt = {
            "images": [im for im in gt["images"] if im["id"] in keep],
            "annotations": [a for a in gt["annotations"] if a["image_id"] in keep],
            "categories": gt["categories"],
        }
    evaluator = CocoEvaluator(gt)
    evaluator.add_detections(all_results)
    stats = evaluator.evaluate()
    stats["n_images"] = n_images
    stats["wall_s"] = wall
    stats["throughput_ips"] = n_images / wall if wall > 0 else 0.0
    if measure_speed:
        stats["fps"] = measure_fps(predictor, batch_size=1, warmup=fps_warmup)
    return stats
