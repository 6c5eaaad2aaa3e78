"""Randomized differential validation of CocoEvaluator.

Every mAP number the framework reports flows through
leanyolo_tpu/utils/coco_eval.py, so it is cross-checked here against a
SECOND, independently written evaluator (`PycocoLiteral` below) that
transcribes pycocotools' cocoeval.py `evaluateImg` + `accumulate` +
`summarize` literally, structure-for-structure (annotation ids in the match
matrices, per-image eval dicts keyed (cat, area, img), python loops — no
shortcuts shared with the production implementation).

Scenes cover: crowds, area-range boundaries (exactly 32^2 / 96^2 px), score
ties, duplicate detections, >maxDets detections per image/category, empty
images, categories with no GT, and detections with no GT anywhere.
(Reference protocol: leanyolo tools/val.py:236-248.)
"""

from __future__ import annotations

import numpy as np
import pytest

from leanyolo_tpu.utils.coco_eval import CocoEvaluator

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA = {
    "all": [0.0, 1e10],
    "small": [0.0, 32.0**2],
    "medium": [32.0**2, 96.0**2],
    "large": [96.0**2, 1e10],
}


class PycocoLiteral:
    """Line-by-line transcription of pycocotools.cocoeval for bbox."""

    def __init__(self, gt: dict, results: list, max_dets: int = 100):
        self.img_ids = sorted({im["id"] for im in gt["images"]})
        self.cat_ids = sorted({c["id"] for c in gt["categories"]})
        self.max_dets = max_dets
        self._gts = {(i, c): [] for i in self.img_ids for c in self.cat_ids}
        self._dts = {(i, c): [] for i in self.img_ids for c in self.cat_ids}
        next_id = 1
        for a in gt["annotations"]:
            g = dict(a)
            g.setdefault("area", a["bbox"][2] * a["bbox"][3])
            g.setdefault("iscrowd", 0)
            g["ignore"] = g.get("ignore", 0) or g["iscrowd"]
            g["id"] = next_id
            next_id += 1
            self._gts[(a["image_id"], a["category_id"])].append(g)
        for r in results:
            d = dict(r)
            d["area"] = r["bbox"][2] * r["bbox"][3]
            d["id"] = next_id
            next_id += 1
            self._dts[(r["image_id"], r["category_id"])].append(d)

    @staticmethod
    def _iou(d, g, iscrowd):
        # maskUtils.iou semantics for bbox: crowd -> intersection / det area.
        ious = np.zeros((len(d), len(g)))
        for di, db in enumerate(d):
            dx, dy, dw, dh = db
            da = dw * dh
            for gi, gb in enumerate(g):
                gx, gy, gw, gh = gb
                iw = min(dx + dw, gx + gw) - max(dx, gx)
                ih = min(dy + dh, gy + gh) - max(dy, gy)
                if iw <= 0 or ih <= 0:
                    continue
                inter = iw * ih
                union = da if iscrowd[gi] else da + gw * gh - inter
                ious[di, gi] = inter / union
        return ious

    def evaluate_img(self, img_id, cat_id, a_rng):
        gt = self._gts[(img_id, cat_id)]
        dt = self._dts[(img_id, cat_id)]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < a_rng[0] or g["area"] > a_rng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[: self.max_dets]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        ious = self._iou([d["bbox"] for d in dt], [g["bbox"] for g in gt], iscrowd)

        T, G, D = len(IOU_THRS), len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if G and D:
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min(t, 1 - 1e-10)
                    m = -1
                    for gind in range(G):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]).reshape((1, D))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def accumulate(self, area: str):
        a_rng = AREA[area]
        T, R, K = len(IOU_THRS), len(REC_THRS), len(self.cat_ids)
        precision = -np.ones((T, R, K))
        for k, cat_id in enumerate(self.cat_ids):
            E = [self.evaluate_img(i, cat_id, a_rng) for i in self.img_ids]
            E = [e for e in E if e is not None]
            if len(E) == 0:
                continue
            dtScores = np.concatenate([e["dtScores"] for e in E])
            inds = np.argsort(-dtScores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
            dtIg = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
            gtIg = np.concatenate([e["gtIgnore"] for e in E])
            npig = np.count_nonzero(gtIg == 0)
            if npig == 0:
                continue
            tps = np.logical_and(dtm, np.logical_not(dtIg))
            fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
            tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
            for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros((R,))
                pr = pr.tolist()
                q = q.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds2 = np.searchsorted(rc, REC_THRS, side="left")
                try:
                    for ri, pi in enumerate(inds2):
                        q[ri] = pr[pi]
                except Exception:
                    pass
                precision[t, :, k] = np.array(q)
        return precision

    def summarize(self):
        def mean(p):
            valid = p[p > -1]
            return float(np.mean(valid)) if valid.size else 0.0  # COCOeval yields -1; val.py clamps

        p = self.accumulate("all")
        out = {"map_50_95": mean(p), "map_50": mean(p[0]), "map_75": mean(p[5])}
        for area in ("small", "medium", "large"):
            out[f"map_{area}"] = mean(self.accumulate(area))
        return out


# ---------------------------------------------------------------------------


def _random_scene(rng: np.random.RandomState, *, n_imgs, n_cats, hard=False):
    imgs = [{"id": 10 + i, "width": 640, "height": 640} for i in range(n_imgs)]
    cats = [{"id": 3 * c + 1} for c in range(n_cats)]
    anns = []
    boundary_sizes = [31.9, 32.0, 32.1, 95.9, 96.0, 96.1]
    for im in imgs:
        for _ in range(rng.randint(0, 7)):
            if hard and rng.rand() < 0.5:
                s = boundary_sizes[rng.randint(len(boundary_sizes))]
                w = h = float(s)  # area exactly at 32^2 / 96^2 boundaries
            else:
                w, h = rng.uniform(4, 300, 2)
            anns.append(
                {
                    "image_id": im["id"],
                    "category_id": cats[rng.randint(n_cats)]["id"],
                    "bbox": [float(rng.uniform(0, 340)), float(rng.uniform(0, 340)), float(w), float(h)],
                    "iscrowd": int(rng.rand() < (0.25 if hard else 0.1)),
                    "area": float(w * h),
                }
            )
    gt = {"images": imgs, "annotations": anns, "categories": cats}

    results = []
    for im in imgs:
        n_det = rng.randint(0, 140 if hard else 12)  # sometimes >maxDets
        for _ in range(n_det):
            if anns and rng.rand() < 0.6:
                a = anns[rng.randint(len(anns))]
                jitter = rng.uniform(-12, 12, 4)
                bb = [a["bbox"][0] + jitter[0], a["bbox"][1] + jitter[1],
                      max(2.0, a["bbox"][2] + jitter[2]), max(2.0, a["bbox"][3] + jitter[3])]
                cat = a["category_id"] if rng.rand() < 0.8 else cats[rng.randint(n_cats)]["id"]
            else:
                bb = [float(v) for v in [*rng.uniform(0, 400, 2), *rng.uniform(4, 200, 2)]]
                cat = cats[rng.randint(n_cats)]["id"]
            score = round(float(rng.rand()), 2 if hard else 6)  # 2 decimals -> many ties
            results.append(
                {"image_id": im["id"], "category_id": int(cat), "bbox": [float(v) for v in bb], "score": score}
            )
            if hard and rng.rand() < 0.15:  # exact duplicate detection
                results.append(dict(results[-1]))
    return gt, results


def _assert_equal_stats(gt, results, label):
    ours = CocoEvaluator(gt)
    ours.add_detections(results)
    got = ours.evaluate()
    want = PycocoLiteral(gt, results).summarize()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), f"{label}: {k}: {got[k]} != {want[k]}"


@pytest.mark.parametrize("seed", range(20))
def test_differential_random_scenes(seed):
    rng = np.random.RandomState(seed)
    gt, results = _random_scene(rng, n_imgs=4, n_cats=3, hard=False)
    _assert_equal_stats(gt, results, f"seed{seed}")


@pytest.mark.parametrize("seed", range(20, 32))
def test_differential_adversarial_scenes(seed):
    """Crowd-heavy, tie-heavy, boundary-area, >maxDets scenes."""
    rng = np.random.RandomState(seed)
    gt, results = _random_scene(rng, n_imgs=3, n_cats=2, hard=True)
    _assert_equal_stats(gt, results, f"hard{seed}")


def test_crowd_absorbs_multiple_detections():
    """Several detections may match one crowd GT (gtm check skipped for
    crowds) and all become ignored, not FPs."""
    gt = {
        "images": [{"id": 1}],
        "categories": [{"id": 1}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100], "iscrowd": 1, "area": 10000.0},
            {"image_id": 1, "category_id": 1, "bbox": [200, 200, 50, 50], "iscrowd": 0, "area": 2500.0},
        ],
    }
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 100], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 0, 50, 100], "score": 0.8},
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 50, 50], "score": 0.7},
    ]
    _assert_equal_stats(gt, results, "crowd")
    got = CocoEvaluator(gt)
    got.add_detections(results)
    assert got.evaluate()["map_50_95"] == pytest.approx(1.0)


def test_ignore_ordering_break_branch():
    """A det overlapping an ignored GT more than a real GT must still prefer
    the real GT when it clears the threshold (the `break` on the sorted
    ignore boundary), and take the ignored one otherwise."""
    gt = {
        "images": [{"id": 1}],
        "categories": [{"id": 1}],
        # tiny GT (area < 32^2 -> ignored in 'medium'/'large', real in 'small'/'all')
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20], "iscrowd": 0, "area": 400.0},
            {"image_id": 1, "category_id": 1, "bbox": [100, 100, 200, 200], "iscrowd": 0, "area": 40000.0},
        ],
    }
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [2, 2, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [98, 98, 200, 200], "score": 0.5},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 19, 21], "score": 0.4},
    ]
    _assert_equal_stats(gt, results, "ignore-order")


def test_unmatched_det_outside_area_range_is_ignored():
    gt = {
        "images": [{"id": 1}],
        "categories": [{"id": 1}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [50, 50, 40, 40], "iscrowd": 0, "area": 1600.0}
        ],
    }
    results = [
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 40, 40], "score": 0.9},
        # big unmatched det: FP for 'all', ignored for 'small'
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 200, 200], "score": 0.8},
    ]
    _assert_equal_stats(gt, results, "area-ignore")


def test_empty_detections_and_empty_gt():
    gt = {
        "images": [{"id": 1}, {"id": 2}],
        "categories": [{"id": 1}, {"id": 2}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50], "iscrowd": 0, "area": 2500.0}
        ],
    }
    _assert_equal_stats(gt, [], "no-dets")
    results = [{"image_id": 2, "category_id": 2, "bbox": [0, 0, 10, 10], "score": 0.5}]
    _assert_equal_stats(gt, results, "det-without-gt")
