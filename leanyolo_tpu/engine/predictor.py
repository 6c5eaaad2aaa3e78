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
        dtype: compute dtype ('float32' or 'bfloat16'); params stay fp32
            and activations are cast — conv accumulation is fp32 on the
            MXU. With fuse=True + bfloat16 the folded weights are pre-cast
            once instead (bitwise-identical results, no per-call weight
            converts in the compiled program).
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
        mesh=None,
    ) -> None:
        if imgsz % 32:
            raise ValueError("imgsz must be divisible by 32")
        if fuse:
            from ..models.yolov10.fold import fold_params
            from ..models.yolov10.model import YOLOv10 as _Y

            # bf16 serving pre-casts the folded weights once (bitwise equal
            # to the per-call w.astype the apply fns do; see fold_params) so
            # the compiled program carries no weight-convert ops per call.
            cast = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else None
            model = _Y(cfg=model.cfg, class_names=model.class_names,
                       params=fold_params(model.params, dtype=cast))
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

        # With folded params (fuse=True), normalization lives in conv0's
        # weights; skipping the identity (x-0)/1 saves a full-res pass.
        self._normalize = not fuse

        # Spatial-partitioning hook: set below when the mesh has a `space`
        # axis (sharding re-anchors at the model's stage boundaries).
        self._constrain = None

        def _fn(params, images):
            x = images.astype(self.dtype)
            branch = ("one2one",) if decode == "topk" else ("one2many",)
            if decode == "topk":
                # Split head outputs: decode ranks per level; selections are
                # upcast inside decode_topk (bf16->f32 is monotonic, so the
                # selected set is identical to an all-f32 pipeline).
                raw = model_apply(
                    params, x, cfg, train=False, branches=branch,
                    normalize=self._normalize, concat_head=False,
                    constrain=self._constrain,
                )
                dets = decode_topk(raw[branch[0]], num_classes=nc, strides=cfg.strides, max_det=self.max_det)
                num = jnp.sum(dets[..., 4] > self.conf_thresh, axis=-1).astype(jnp.int32)
                return dets.astype(jnp.float32), num
            raw = model_apply(
                params, x, cfg, train=False, branches=branch,
                normalize=self._normalize, constrain=self._constrain,
            )
            feats = [f.astype(jnp.float32) for f in raw[branch[0]]]
            return decode_nms(
                feats,
                num_classes=nc,
                strides=cfg.strides,
                conf_thresh=self.conf_thresh,
                iou_thresh=self.iou_thresh,
                max_det=self.max_det,
                class_wise=self.class_wise_nms,
            )

        self._fn_raw = _fn  # unjitted: composable into larger programs (benchmarks, DP)

        def _fn_canvas(params, canvas, new_hw, pads, hw):
            from ..ops.letterbox import letterbox_batch_jax

            images = letterbox_batch_jax(canvas, new_hw, pads, hw, self.imgsz)
            return _fn(params, images)

        # Data-parallel inference: with a mesh, params replicate and the
        # batch shards over the data axis; GSPMD partitions the whole
        # forward+decode (a new capability vs the single-device reference,
        # SURVEY.md §2.3). Batch size must divide by the mesh size.
        self.mesh = mesh
        # Stage params on device once: folded params are host numpy arrays,
        # and re-feeding them per call re-uploads ~100 MB through the (slow,
        # tunneled) host link every batch.
        donate_kw = {"donate_argnums": (1,) if donate else ()}
        # The staged copy is private (self._params): resharding or
        # device_put-ing model.params in place would silently change the
        # placement seen by every OTHER Predictor/Trainer sharing the model
        # object (e.g. a TP predictor would leave the params model-sharded
        # under a DP predictor jitted with replicated in_shardings).
        self._param_sharding = None
        if mesh is None:
            self._params = jax.device_put(self.model.params)
        else:
            from ..parallel.mesh import (
                MODEL_AXIS,
                SPACE_AXIS,
                batch_sharded,
                image_sharded,
                replicated,
                rows_sharded,
                shard_params,
                tp_shard_params,
            )

            if MODEL_AXIS in mesh.axis_names:
                # Tensor (channel) parallelism: every layer's filters split
                # on output channels over `model`; each chip applies its
                # slice and GSPMD threads the channel sharding through the
                # network (psum on input-channel contractions).
                self._params, param_s = tp_shard_params(mesh, self.model.params)
            else:
                param_s = replicated(mesh)
                self._params = shard_params(mesh, self.model.params)
            self._param_sharding = param_s
            if SPACE_AXIS in mesh.axis_names or MODEL_AXIS in mesh.axis_names:
                # Batch shards over the data axes only; H shards over
                # `space` when present. Spatially-partitioned inference: the
                # `space` axis splits every conv's rows across chips with
                # GSPMD halo exchanges. Latency mode: a (1, n) mesh runs ONE
                # image across n chips.
                img_s, out_s = image_sharded(mesh), rows_sharded(mesh)
                if SPACE_AXIS in mesh.axis_names and mesh.shape[SPACE_AXIS] > 1:
                    # On a size-1 space axis the constraints are semantic
                    # no-ops; skip them (the experimental axon plugin is
                    # pathologically slow building constraint-annotated
                    # full-model programs).
                    self._constrain = lambda t: jax.lax.with_sharding_constraint(t, img_s)
            else:
                img_s = out_s = batch_sharded(mesh)
            self._fn = jax.jit(_fn, in_shardings=(param_s, img_s), out_shardings=(out_s, out_s), **donate_kw)
            self._fn_canvas = jax.jit(
                _fn_canvas,
                in_shardings=(param_s, img_s, out_s, out_s, out_s),
                out_shardings=(out_s, out_s),
                **donate_kw,
            )
        if mesh is None:
            self._fn = jax.jit(_fn, **donate_kw)
            # Device-side preprocessing: letterbox warp fused into the same
            # XLA program as the forward (north star: preprocess rides HBM
            # once). Compiles once per canvas bucket, not per image size.
            self._fn_canvas = jax.jit(_fn_canvas, **donate_kw)

    # -- device API ---------------------------------------------------------

    @property
    def params(self):
        """This predictor's device-staged (and mesh-sharded) parameters."""
        return self._params

    def update_params(self, params) -> None:
        """Refresh weights, keeping the compiled program: stages `params` on
        device with this predictor's sharding (per-epoch eval, distributed
        weight refresh). The caller's pytree is not mutated."""
        if not self._normalize:
            # The compiled program was built for FOLDED params (fuse=True:
            # normalization lives in conv0, BN is pre-multiplied into convs).
            # Staging ordinary unfolded weights would silently skip
            # normalization and double-count BN. fold_params is idempotent
            # (tests/test_fold.py), so already-folded input passes through
            # bit-identically. The dtype pre-cast must match __init__'s or
            # the new avals would force a retrace of the compiled program.
            from ..models.yolov10.fold import fold_params

            cast = self.dtype if self.dtype == jnp.bfloat16 else None
            params = fold_params(params, dtype=cast)
        if self._param_sharding is None:
            self._params = jax.device_put(params)
        else:
            self._params = jax.device_put(params, self._param_sharding)

    def run_batch(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: [B, S, S, 3] raw pixels (uint8 preferred — 4x fewer h2d bytes,
        cast on device; float accepted) -> (dets [B, k, 6], num [B])."""
        return self._fn(self._params, images)

    def run_canvas(self, canvas, new_hw, pads, hw) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Device-preprocess path: unletterboxed images on a fixed canvas.

        canvas [B, Hc, Wc, 3] with image i pasted at the top-left; geometry
        arrays as produced by `canvas_batch`. Letterbox happens on device.
        """
        return self._fn_canvas(self._params, jnp.asarray(canvas), new_hw, pads, hw)

    # -- host convenience ---------------------------------------------------

    def predict_images(
        self,
        images_rgb: Sequence[np.ndarray],
        *,
        apply_conf_filter: bool = True,
        preprocess: str = "host",
    ) -> List[np.ndarray]:
        """Full pipeline for a list of HWC RGB uint8 images of any size.

        preprocess='host': cv2 letterbox per image (reference-exact pixels).
        preprocess='device': paste onto a fixed canvas and letterbox on
        device inside the same XLA program as the forward (bucketed canvas
        sizes bound recompiles; parity with the host path is at the mAP
        level, not per-pixel — cv2 uses fixed-point interpolation).
        Boxes come back in original-image coordinates either way.
        """
        from ..models.yolov10.decode import postprocess_to_original

        if preprocess == "device":
            from ..ops.letterbox import canvas_batch

            canvas, new_hw, pads, hw, metas = canvas_batch(images_rgb, self.imgsz)
            dets, num = self.run_canvas(canvas, jnp.asarray(new_hw), jnp.asarray(pads), jnp.asarray(hw))
        else:
            lbs, metas = [], []
            for img in images_rgb:
                lb, gain, pad = letterbox(img, self.imgsz)
                lbs.append(np.ascontiguousarray(lb, dtype=np.uint8))  # 4x fewer h2d bytes; cast on device
                metas.append((gain, pad, img.shape[:2]))
            batch = jnp.asarray(np.stack(lbs))
            dets, num = self.run_batch(batch)
        return postprocess_to_original(
            dets, num, metas, decode=self.decode, conf_thresh=self.conf_thresh,
            apply_conf_filter=apply_conf_filter,
        )
