"""Fixed-shape serving export: jitted program + StableHLO artifact.

TPU-native counterpart of the reference ONNX export
(reference: leanyolo/models/yolov10/export.py:32-276 and tools/
export_onnx.py:91-145). The serving contract is identical:

    detections [N, max_dets, 6]  ([x1, y1, x2, y2, score, cls])
    num_dets   [N] int

with two decode modes matching the wrapper's semantics exactly:

- topk (nms=False): best class per anchor, conf-mask to -1, top-k, clamp to
  image bounds, num_dets = count >= conf (export.py:126-144);
- nms  (nms=True): pre-top-k 1000 over (anchor, class) pairs, class+image
  offset trick -> ONE greedy NMS pass, per-image top-k, zero-out below conf
  (export.py:145-198).

Instead of ONNX, the artifact is serialized StableHLO via `jax.export` with
a symbolic (dynamic) batch dimension, plus a JSON metadata sidecar
(mirroring tools/export_onnx.py:121-137). Weights are baked in (BN-folded,
RepVGGDW-fused) so the artifact is self-contained.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.yolov10.decode import _flatten_pyramid, _nms_single
from ..ops.topk import topk_lastdim
from ..models.yolov10.model import YOLOv10, model_apply
from ..version import __version__


def build_serving_fn(
    model: YOLOv10,
    *,
    imgsz: int = 640,
    decode: str = "topk",
    max_dets: int = 300,
    conf: float = 0.25,
    iou: float = 0.45,
    pre_topk: int = 1000,
    dtype: str = "float32",
    fuse: bool = True,
    prefolded: bool = False,
):
    """Returns (fn(images) -> (detections, num_dets), params_baked).

    `fn` closes over (optionally folded) params so the exported artifact is
    self-contained; images are [B, imgsz, imgsz, 3] raw pixels NHWC.
    `prefolded=True` declares model.params already folded, skipping the
    redundant re-fold (folding is idempotent — the norm fold zeroes the
    input_subtract/divide buffers it consumed, tests/test_fold.py — this
    is purely a work skip for multi-bucket exports).
    """
    cfg = model.cfg
    nc = model.nc
    params = model.params
    if fuse and not prefolded:
        from ..models.yolov10.fold import fold_params

        params = fold_params(params)
    compute_dtype = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else jnp.float32
    use_nms = decode.lower() == "nms"

    def fn(images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        branch = "one2many" if use_nms else "one2one"
        # With folded params the input normalization lives in conv0.
        raw = model_apply(params, images.astype(compute_dtype), cfg, train=False, branches=(branch,), normalize=not fuse)
        feats = [f.astype(jnp.float32) for f in raw[branch]]
        boxes, cls_logits = _flatten_pyramid(feats, nc, cfg.strides)
        scores = jax.nn.sigmoid(cls_logits)  # [B, A, nc]
        b, a, _ = scores.shape

        if not use_nms:
            best_scores = jnp.max(scores, axis=-1)
            best_cls = jnp.argmax(scores, axis=-1).astype(jnp.float32)
            masked = jnp.where(best_scores >= conf, best_scores, -1.0)
            k = min(max_dets, a)
            top_vals, top_idx = topk_lastdim(masked, k)
            sel_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
            sel_scores = jnp.take_along_axis(best_scores, top_idx, axis=1)
            sel_cls = jnp.take_along_axis(best_cls, top_idx, axis=1)
            sel_boxes = jnp.clip(sel_boxes, 0.0, float(imgsz))
            # Parity note: like the reference wrapper (export.py:135,142),
            # scores are gathered UNMASKED — rows beyond num_dets carry real
            # sub-conf scores and clients must honor num_dets. The clamp
            # mirrors the reference's (equally inert for sigmoid scores).
            sel_scores = jnp.maximum(sel_scores, 0.0)
            dets = jnp.concatenate([sel_boxes, sel_scores[..., None], sel_cls[..., None]], axis=-1)
            if k < max_dets:
                dets = jnp.pad(dets, ((0, 0), (0, max_dets - k), (0, 0)))
            num = jnp.sum(sel_scores >= conf, axis=1).astype(jnp.int32)
            return dets, num

        k_pre = min(pre_topk, a * nc)
        flat = scores.reshape(b, a * nc)
        cand_scores, pre_idx = topk_lastdim(flat, k_pre)
        anc_idx = pre_idx // nc
        cand_cls = (pre_idx % nc).astype(jnp.float32)
        cand_boxes = jnp.take_along_axis(boxes, anc_idx[..., None], axis=1)
        nms = partial(
            _nms_single,
            iou_thresh=iou,
            conf_thresh=conf,
            max_det=max_dets,
            class_wise=True,
            # Same per-class offset as the in-framework decode_nms
            # (decode.py:300): it only needs to exceed the coordinate range
            # (imgsz <= 8192), and keeping the offset small keeps float32
            # precise — at the old imgsz*10*nc scaling, class-79 boxes sat
            # near 4e7 where f32 ulp is 4 px, quantizing the NMS IoU math.
            group_offset=8192.0 * 10.0,
        )
        dets, num = jax.vmap(nms)(cand_boxes, cand_scores, cand_cls)
        dets = dets.at[..., :4].set(jnp.clip(dets[..., :4], 0.0, float(imgsz)))
        return dets, num

    return fn, params


def export_serving(
    model: YOLOv10,
    out_path: str,
    *,
    imgsz: int = 640,
    decode: str = "topk",
    max_dets: int = 300,
    conf: float = 0.25,
    iou: float = 0.45,
    pre_topk: int = 1000,
    dtype: str = "float32",
    dynamic_batch: bool = True,
    fuse: bool = True,
    prefolded: bool = False,
) -> str:
    """Serialize the serving function to StableHLO bytes + JSON sidecar.

    Returns the artifact path (`.stablehlo`). With dynamic_batch, the batch
    dimension is symbolic (the ONNX export's dynamic axis, export.py:265-275).
    """
    fn, _ = build_serving_fn(
        model, imgsz=imgsz, decode=decode, max_dets=max_dets, conf=conf, iou=iou,
        pre_topk=pre_topk, dtype=dtype, fuse=fuse, prefolded=prefolded,
    )
    if dynamic_batch:
        (bdim,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((bdim, imgsz, imgsz, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(spec)
    blob = exported.serialize()

    if not out_path.endswith(".stablehlo"):
        out_path = out_path + ".stablehlo"
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)

    meta = {
        "leanyolo_version": __version__,
        "format": "stablehlo",
        "model_name": model.cfg.name,
        "class_names": model.class_names,
        "imgsz": imgsz,
        "decode": decode,
        "max_dets": max_dets,
        "conf": conf,
        "iou": iou,
        "pre_topk": pre_topk,
        "dtype": dtype,
        "dynamic_batch": dynamic_batch,
        "outputs": {"detections": [None if dynamic_batch else 1, max_dets, 6], "num_dets": [None if dynamic_batch else 1]},
        "input": {"images": [None if dynamic_batch else 1, imgsz, imgsz, 3], "layout": "NHWC", "range": "0-255 RGB"},
    }
    with open(out_path + ".json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    return out_path


def load_exported(path: str):
    """Deserialize a .stablehlo artifact into a callable."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    return exported.call


def export_serving_bucketed(
    model: YOLOv10,
    out_dir: str,
    *,
    sizes=(640, 960, 1280),
    decode: str = "topk",
    max_dets: int = 300,
    conf: float = 0.25,
    iou: float = 0.45,
    pre_topk: int = 1000,
    dtype: str = "float32",
    dynamic_batch: bool = True,
    fuse: bool = True,
) -> str:
    """Arbitrary-size serving: one StableHLO artifact per size bucket.

    jit needs static shapes, so "any image size" is served by a small set of
    stride-32 bucket programs (SURVEY §7 hard-parts note; the reference's
    ONNX export is likewise fixed-shape per `--imgsz`, tools/
    export_onnx.py:96-108): each request letterboxes into the smallest
    bucket that fits its long side and runs that program. Writes
    `<name>_<decode>_<size>.stablehlo(.json)` per bucket plus a
    `manifest.json`; returns the manifest path. Serve via BucketedServing.
    """
    sizes = sorted({int(s) for s in sizes})
    if any(s % 32 for s in sizes):
        raise ValueError(f"bucket sizes must be stride-32 divisible: {sizes}")
    prefolded = False
    if fuse:
        # Folding is size-independent; do it ONCE for all buckets.
        from ..models.yolov10.fold import fold_params

        model = YOLOv10(cfg=model.cfg, class_names=model.class_names, params=fold_params(model.params))
        prefolded = True
    buckets = {}
    for s in sizes:
        path = export_serving(
            model, os.path.join(out_dir, f"{model.cfg.name}_{decode}_{s}"),
            imgsz=s, decode=decode, max_dets=max_dets, conf=conf, iou=iou,
            pre_topk=pre_topk, dtype=dtype, dynamic_batch=dynamic_batch,
            fuse=fuse, prefolded=prefolded,
        )
        buckets[str(s)] = os.path.basename(path)
    manifest = {
        "leanyolo_version": __version__,
        "format": "stablehlo-bucketed",
        "model_name": model.cfg.name,
        "class_names": model.class_names,
        "decode": decode,
        "max_dets": max_dets,
        "conf": conf,
        "dynamic_batch": dynamic_batch,
        "buckets": buckets,
        "policy": "letterbox into the smallest bucket >= max(h, w); larger images downscale into the largest bucket",
    }
    mpath = os.path.join(out_dir, "manifest.json")
    with open(mpath, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    return mpath


class BucketedServing:
    """Serve images of ANY size from a bucketed export manifest.

    Per image: pick the bucket (ops.letterbox.choose_bucket over the
    manifest's sizes), cv2-letterbox into it, run that bucket's program on
    the batch of same-bucket images, and map boxes back to original-image
    coordinates — the fixed-shape analog of the reference's per-size ONNX
    sessions. Programs compile lazily, once per bucket.
    """

    def __init__(self, manifest_path: str):
        with open(manifest_path, "r", encoding="utf-8") as f:
            self.meta = json.load(f)
        base = os.path.dirname(os.path.abspath(manifest_path))
        self.sizes = sorted(int(s) for s in self.meta["buckets"])
        self._paths = {int(s): os.path.join(base, name) for s, name in self.meta["buckets"].items()}
        self._fns = {}

    def _fn(self, size: int):
        if size not in self._fns:
            self._fns[size] = load_exported(self._paths[size])
        return self._fns[size]

    def predict_images(self, images_rgb, *, apply_conf_filter: bool = True):
        """HWC RGB uint8 images of any sizes -> per-image [k, 6] arrays
        (x1, y1, x2, y2, score, cls) in original-image coordinates."""
        import numpy as np

        from ..models.yolov10.decode import postprocess_to_original
        from ..ops.letterbox import choose_bucket, letterbox

        images_rgb = list(images_rgb)
        conf = float(self.meta.get("conf", 0.25))
        decode_mode = self.meta.get("decode", "topk")
        # Static-batch artifacts accept exactly B=1; run them image-by-image.
        chunk = None if self.meta.get("dynamic_batch", True) else 1
        by_bucket = {}
        for i, img in enumerate(images_rgb):
            by_bucket.setdefault(choose_bucket(img.shape[:2], self.sizes, max(self.sizes)), []).append(i)

        groups = []
        for size, idxs in sorted(by_bucket.items()):
            groups += [(size, idxs)] if chunk is None else [(size, [i]) for i in idxs]

        out = [None] * len(images_rgb)
        for size, idxs in groups:
            lbs, metas = [], []
            for i in idxs:
                lb, gain, pad = letterbox(images_rgb[i], size)
                lbs.append(np.ascontiguousarray(lb, dtype=np.float32))
                metas.append((gain, pad, images_rgb[i].shape[:2]))
            dets, num = self._fn(size)(jnp.asarray(np.stack(lbs)))
            group_out = postprocess_to_original(
                dets, num, metas, decode=decode_mode, conf_thresh=conf,
                apply_conf_filter=apply_conf_filter,
            )
            for i, d in zip(idxs, group_out):
                out[i] = d
        return out
