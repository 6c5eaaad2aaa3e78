"""Frozen round-4 SCALAR CocoEvaluator — the differential ORACLE for the
round-5 vectorized evaluator (leanyolo_tpu/utils/coco_eval.py). Kept verbatim
(class renamed) so the batched matcher can be fuzz-checked against the
implementation that the pycocotools-differential and hand-computed property
suites validated.

Original docstring:
COCO bbox mAP evaluation in pure numpy (pycocotools-compatible protocol).

pycocotools is not available in this environment, so this module implements
the COCOeval bbox protocol faithfully: 10 IoU thresholds 0.50:0.05:0.95,
101-point interpolated precision, greedy score-ordered matching with crowd
("ignore") handling, area ranges, and maxDets=100. Numbers are designed to
match `COCOeval.summarize()` stats[0..5] exactly given the same inputs
(reference usage: leanyolo tools/val.py:236-248).
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _iou_xywh(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """IoU matrix [D, G] for xywh boxes; crowd GTs use intersection/det-area."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    dx1, dy1 = dets[:, 0], dets[:, 1]
    dx2, dy2 = dets[:, 0] + dets[:, 2], dets[:, 1] + dets[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    ix1 = np.maximum(dx1[:, None], gx1[None])
    iy1 = np.maximum(dy1[:, None], gy1[None])
    ix2 = np.minimum(dx2[:, None], gx2[None])
    iy2 = np.minimum(dy2[:, None], gy2[None])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    d_area = (dets[:, 2] * dets[:, 3])[:, None]
    g_area = (gts[:, 2] * gts[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), d_area, d_area + g_area - inter)
    return inter / np.maximum(union, 1e-12)


class ScalarCocoEvaluator:
    """Accumulates detections against COCO-format ground truth.

    Args:
        gt: a loaded COCO annotation dict (keys: images, annotations,
            categories) or a path to the JSON.
    """

    def __init__(self, gt, *, max_dets: int = 100) -> None:
        if isinstance(gt, str):
            with open(gt, "r", encoding="utf-8") as f:
                gt = json.load(f)
        self.max_dets = max_dets
        self.img_ids = sorted(im["id"] for im in gt.get("images", []))
        self.cat_ids = sorted(c["id"] for c in gt.get("categories", []))
        self._gt = defaultdict(list)  # (img_id, cat_id) -> anns
        for a in gt.get("annotations", []):
            area = a.get("area", a["bbox"][2] * a["bbox"][3])
            self._gt[(a["image_id"], a["category_id"])].append(
                {
                    "bbox": np.asarray(a["bbox"], np.float64),
                    "iscrowd": int(a.get("iscrowd", 0)),
                    "area": float(area),
                }
            )
        self._dt = defaultdict(list)
        self._cache: Dict[tuple, tuple] = {}

    def add_detections(self, results: Sequence[dict]) -> None:
        """results: COCO result dicts {image_id, category_id, bbox xywh, score}."""
        self._cache.clear()  # cached score-sorts/IoUs are stale once dets change
        for r in results:
            self._dt[(r["image_id"], r["category_id"])].append(
                {"bbox": np.asarray(r["bbox"], np.float64), "score": float(r["score"])}
            )

    def _img_cat_base(self, img_id: int, cat_id: int) -> Optional[tuple]:
        """Area-independent work per (image, category), computed ONCE: the
        score sort, box stacks, crowd flags and the [D, G] IoU matrix are
        identical across the four area ranges — pycocotools likewise computes
        computeIoU once per (img, cat) and reuses it (a 4x eval-time cut on
        this single-core host)."""
        key = (img_id, cat_id)
        cached = self._cache.get(key)
        if cached is None:
            gts = self._gt.get(key, [])
            dts = sorted(self._dt.get(key, []), key=lambda d: -d["score"])[: self.max_dets]
            if not gts and not dts:
                return None
            d_boxes = np.stack([d["bbox"] for d in dts]) if dts else np.zeros((0, 4))
            g_boxes = np.stack([g["bbox"] for g in gts]) if gts else np.zeros((0, 4))
            g_crowd = np.array([g["iscrowd"] for g in gts], dtype=bool)
            ious = _iou_xywh(d_boxes, g_boxes, g_crowd)  # crowd rule is per-GT: order-independent
            scores = np.array([d["score"] for d in dts])
            d_area = d_boxes[:, 2] * d_boxes[:, 3]
            g_area = np.array([g["area"] for g in gts], np.float64)
            cached = (scores, d_area, g_area, g_crowd, ious)
            self._cache[key] = cached
        return cached

    def _evaluate_img(self, img_id: int, cat_id: int, area_rng) -> Optional[dict]:
        base = self._img_cat_base(img_id, cat_id)
        if base is None:
            return None
        scores, d_area, g_area, g_crowd, ious = base

        # pycocotools area gating is inclusive at BOTH ends: ignore iff
        # area < rng[0] or area > rng[1] (cocoeval.evaluateImg), so a GT of
        # exactly 32^2 px counts as both 'small' and 'medium'.
        g_ignore = g_crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])
        # Non-ignored GTs first (pycocotools sorts by the ignore flag); the
        # cached IoU matrix reorders by column permutation.
        g_order = np.argsort(g_ignore, kind="stable")
        g_ignore = g_ignore[g_order]
        g_crowd = g_crowd[g_order]
        ious = ious[:, g_order]

        T, D, G = len(IOU_THRS), len(scores), len(g_order)
        dt_m = np.zeros((T, D), dtype=np.int64)  # matched gt index + 1 (0 = none)
        dt_ig = np.zeros((T, D), dtype=bool)
        gt_m = np.zeros((T, G), dtype=np.int64)

        for ti, t in enumerate(IOU_THRS):
            for di in range(D):
                best_iou = min(t, 1 - 1e-10)
                best_g = -1
                for gi in range(G):
                    if gt_m[ti, gi] and not g_crowd[gi]:
                        continue
                    if best_g > -1 and not g_ignore[best_g] and g_ignore[gi]:
                        break  # remaining gts are all ignore; keep current match
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best_g = gi
                if best_g == -1:
                    continue
                dt_ig[ti, di] = g_ignore[best_g]
                dt_m[ti, di] = best_g + 1
                gt_m[ti, best_g] = di + 1

        # Unmatched dets outside the area range are ignored.
        d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
        dt_ig = dt_ig | ((dt_m == 0) & d_out[None])

        return {
            "scores": scores,
            "dt_matched": dt_m,
            "dt_ignore": dt_ig,
            "num_gt": int((~g_ignore).sum()),
        }

    def _accumulate_area(self, area: str) -> np.ndarray:
        """precision[T, R, K] for one area range; -1 where undefined."""
        T, R, K = len(IOU_THRS), len(REC_THRS), len(self.cat_ids)
        precision = -np.ones((T, R, K))
        rng = AREA_RNGS[area]
        for ki, cat_id in enumerate(self.cat_ids):
            evals = [self._evaluate_img(img_id, cat_id, rng) for img_id in self.img_ids]
            evals = [e for e in evals if e is not None]
            if not evals:
                continue
            num_gt = sum(e["num_gt"] for e in evals)
            if num_gt == 0:
                continue
            scores = np.concatenate([e["scores"] for e in evals])
            order = np.argsort(-scores, kind="mergesort")
            dt_m = np.concatenate([e["dt_matched"] for e in evals], axis=1)[:, order]
            dt_ig = np.concatenate([e["dt_ignore"] for e in evals], axis=1)[:, order]

            tps = (dt_m > 0) & ~dt_ig
            fps = (dt_m == 0) & ~dt_ig
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for ti in range(T):
                tp, fp = tp_sum[ti], fp_sum[ti]
                nd = len(tp)
                rc = tp / num_gt
                pr = tp / np.maximum(tp + fp, np.spacing(1))
                q = np.zeros(R)
                # Monotone precision envelope, then sample at recall thresholds.
                pr = pr.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(inds):
                    if pi < nd:
                        q[ri] = pr[pi]
                precision[ti, :, ki] = q
        return precision

    def evaluate(self) -> Dict[str, float]:
        """Returns the COCOeval headline stats for bbox."""
        p_all = self._accumulate_area("all")

        def _mean(p):
            valid = p[p > -1]
            return float(valid.mean()) if valid.size else 0.0

        stats = {
            "map_50_95": _mean(p_all),
            "map_50": _mean(p_all[0]),
            "map_75": _mean(p_all[5]),
        }
        for area in ("small", "medium", "large"):
            stats[f"map_{area}"] = _mean(self._accumulate_area(area))
        return stats
