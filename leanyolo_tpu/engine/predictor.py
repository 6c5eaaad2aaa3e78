"""Jitted end-to-end inference: batched images -> fixed-shape detections.

Replaces the reference's per-image eager pipeline
(reference: tools/infer.py:69-160) with one compiled program per
(batch, size) bucket: normalize -> backbone -> neck -> head -> decode runs
as a single XLA executable on device; only imread/letterbox/visualization
stay on host. Supports both decode paths:

- 'topk': official NMS-free two-stage top-k over the one2one branch;
- 'nms': confidence threshold + greedy (optionally class-wise) NMS over the
  one2many branch, fixed-shape with a num_dets count.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.yolov10.decode import decode_nms, decode_topk, detections_to_list
from ..models.yolov10.model import YOLOv10, model_apply
from ..ops.letterbox import letterbox


class Predictor:
    """Compiled detector over stride-bucketed fixed shapes.

    Args:
        model: a YOLOv10 wrapper (cfg + params).
        imgsz: square letterbox size (must be stride-32 divisible).
        decode: 'topk' | 'nms'.
        dtype: compute dtype ('float32' or 'bfloat16'); params stay fp32,
            activations are cast — conv accumulation is fp32 on the MXU.
    """

    def __init__(
        self,
        model: YOLOv10,
        *,
        imgsz: int = 640,
        decode: str = "topk",
        conf_thresh: float = 0.25,
        iou_thresh: float = 0.45,
        max_det: int = 300,
        class_wise_nms: bool = False,
        dtype: str = "float32",
        donate: bool = True,
        fuse: bool = False,
    ) -> None:
        if imgsz % 32:
            raise ValueError("imgsz must be divisible by 32")
        if fuse:
            from ..models.yolov10.fold import fold_params
            from ..models.yolov10.model import YOLOv10 as _Y

            model = _Y(cfg=model.cfg, class_names=model.class_names, params=fold_params(model.params))
        self.model = model
        self.imgsz = int(imgsz)
        self.decode = decode
        self.conf_thresh = float(conf_thresh)
        self.iou_thresh = float(iou_thresh)
        self.max_det = int(max_det)
        self.class_wise_nms = bool(class_wise_nms)
        self.dtype = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else jnp.float32

        cfg = model.cfg
        nc = model.nc

        def _fn(params, images):
            x = images.astype(self.dtype)
            branch = ("one2one",) if decode == "topk" else ("one2many",)
            raw = model_apply(params, x, cfg, train=False, branches=branch)
            feats = [f.astype(jnp.float32) for f in raw[branch[0]]]
            if decode == "topk":
                dets = decode_topk(feats, num_classes=nc, strides=cfg.strides, max_det=self.max_det)
                num = jnp.sum(dets[..., 4] > self.conf_thresh, axis=-1).astype(jnp.int32)
                return dets, num
            return decode_nms(
                feats,
                num_classes=nc,
                strides=cfg.strides,
                conf_thresh=self.conf_thresh,
                iou_thresh=self.iou_thresh,
                max_det=self.max_det,
                class_wise=self.class_wise_nms,
            )

        self._fn = jax.jit(_fn, donate_argnums=(1,) if donate else ())

    # -- device API ---------------------------------------------------------

    def run_batch(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: [B, S, S, 3] float raw pixels -> (dets [B, k, 6], num [B])."""
        return self._fn(self.model.params, images)

    # -- host convenience ---------------------------------------------------

    def predict_images(self, images_rgb: Sequence[np.ndarray], *, apply_conf_filter: bool = True) -> List[np.ndarray]:
        """Full pipeline for a list of HWC RGB uint8 images of any size.

        Letterboxes on host, runs the compiled program, and maps boxes back
        into each original image's coordinates.
        """
        from ..ops.boxes import unletterbox_coords

        lbs, metas = [], []
        for img in images_rgb:
            lb, gain, pad = letterbox(img, self.imgsz)
            lbs.append(lb.astype(np.float32))
            metas.append((gain, pad, img.shape[:2]))
        batch = jnp.asarray(np.stack(lbs))
        dets, num = self.run_batch(batch)
        dets = np.asarray(dets)
        num = np.asarray(num)

        out = []
        for i, (gain, pad, orig_hw) in enumerate(metas):
            d = dets[i]
            if self.decode == "topk":
                d = d[d[:, 4] > self.conf_thresh] if apply_conf_filter else d
            else:
                d = d[: int(num[i])]
            if len(d):
                boxes = np.asarray(unletterbox_coords(jnp.asarray(d[:, :4]), gain, pad, orig_hw))
                d = np.concatenate([boxes, d[:, 4:6]], axis=1)
            out.append(d)
        return out
