"""Differential: round-5 vectorized CocoEvaluator vs the frozen round-4
scalar implementation (tests/_scalar_coco_eval.py).

The scalar evaluator is the implementation that the pycocotools-differential
suite (frozen real-COCOeval outputs) and the hand-computed property suite
validated; the vectorized batched matcher must reproduce it bit-for-bit on
random scenes stressing every branch: crowd GTs, area-range edges (exactly
32^2 px), score ties, maxDets truncation, GT-only / det-only images, and
detections for images missing from the GT list. Incremental per-batch
scoring (score_images) must equal one-shot scoring regardless of arrival
order.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _scalar_coco_eval import ScalarCocoEvaluator

from leanyolo_tpu.utils.coco_eval import CocoEvaluator


def _random_scene(seed: int, n_imgs: int = 12, n_cats: int = 6, crowd_p: float = 0.15):
    rng = np.random.RandomState(seed)
    images = [{"id": 100 + i} for i in range(n_imgs)]
    cats = [{"id": 1 + c, "name": f"c{c}"} for c in range(n_cats)]
    anns, results = [], []
    aid = 0
    for im in images:
        # Some images GT-only, some det-only, some both, some empty.
        role = rng.randint(4)
        if role != 1:  # has GT
            for _ in range(rng.randint(0, 6)):
                # Sizes spanning the area ranges, incl. the exact 32x32 edge.
                if rng.rand() < 0.2:
                    w = h = 32.0
                else:
                    w, h = rng.uniform(4, 200, 2)
                x, y = rng.uniform(0, 400, 2)
                anns.append(
                    {
                        "id": aid,
                        "image_id": im["id"],
                        "category_id": int(rng.randint(1, n_cats + 1)),
                        "bbox": [float(x), float(y), float(w), float(h)],
                        "area": float(w * h),
                        "iscrowd": int(rng.rand() < crowd_p),
                    }
                )
                aid += 1
        if role != 2:  # has detections
            for _ in range(rng.randint(0, 18)):
                w, h = rng.uniform(4, 200, 2)
                x, y = rng.uniform(0, 400, 2)
                # Quantized scores -> frequent exact ties across images.
                score = round(float(rng.uniform(0.05, 1.0)), 2)
                results.append(
                    {
                        "image_id": im["id"],
                        "category_id": int(rng.randint(1, n_cats + 1)),
                        "bbox": [float(x), float(y), float(w), float(h)],
                        "score": score,
                    }
                )
    # Some detections near GT boxes so real matching happens.
    for a in anns[::2]:
        x, y, w, h = a["bbox"]
        jit = rng.uniform(-4, 4, 4)
        results.append(
            {
                "image_id": a["image_id"],
                "category_id": a["category_id"],
                "bbox": [x + jit[0], y + jit[1], max(4.0, w + jit[2]), max(4.0, h + jit[3])],
                "score": round(float(rng.uniform(0.3, 1.0)), 2),
            }
        )
    # A detection for an image id not in the GT list (must be ignored).
    results.append({"image_id": 999999, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9})
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, results


def test_vectorized_matches_scalar_fuzz():
    for seed in range(8):
        gt, results = _random_scene(seed)
        want = ScalarCocoEvaluator(gt)
        want.add_detections(results)
        w = want.evaluate()

        got = CocoEvaluator(gt)
        got.add_detections(results)
        g = got.evaluate()
        assert set(g) == set(w)
        for k in w:
            assert g[k] == w[k], (seed, k, g[k], w[k])


def test_vectorized_matches_scalar_maxdets():
    gt, results = _random_scene(99, n_imgs=4, n_cats=2)
    # Flood one (img, cat) far past maxDets to exercise truncation.
    rng = np.random.RandomState(7)
    for _ in range(150):
        x, y, w, h = rng.uniform(0, 300, 2).tolist() + rng.uniform(5, 80, 2).tolist()
        results.append(
            {"image_id": 100, "category_id": 1, "bbox": [x, y, w, h], "score": round(float(rng.rand()), 2)}
        )
    for md in (3, 100):
        want = ScalarCocoEvaluator(gt, max_dets=md)
        want.add_detections(results)
        got = CocoEvaluator(gt, max_dets=md)
        got.add_detections(results)
        w, g = want.evaluate(), got.evaluate()
        for k in w:
            assert g[k] == w[k], (md, k)


def test_incremental_equals_one_shot():
    """score_images per batch (any arrival order) == one add + evaluate."""
    gt, results = _random_scene(3, n_imgs=16)
    base = CocoEvaluator(gt)
    base.add_detections(results)
    want = base.evaluate()

    by_img = {}
    for r in results:
        by_img.setdefault(r["image_id"], []).append(r)
    img_ids = list(by_img)
    # Reverse arrival order + uneven batches, scoring after each batch.
    inc = CocoEvaluator(gt)
    order = img_ids[::-1]
    for s in range(0, len(order), 3):
        batch = order[s : s + 3]
        rows = [r for i in batch for r in by_img[i]]
        inc.add_detections(rows)
        inc.score_images(batch)
    got = inc.evaluate()
    for k in want:
        assert got[k] == want[k], k

    # Columnar feed path must agree with the dict path too.
    cols = CocoEvaluator(gt)
    n = len(results)
    cols.add_detections_arrays(
        np.array([r["image_id"] for r in results], np.int64),
        np.array([r["category_id"] for r in results], np.int64),
        np.array([r["bbox"] for r in results], np.float64),
        np.array([r["score"] for r in results], np.float64),
    )
    got2 = cols.evaluate()
    for k in want:
        assert got2[k] == want[k], k


def test_late_add_after_scoring_falls_back():
    """Adding detections for an already-scored image rescans everything."""
    gt, results = _random_scene(5, n_imgs=8)
    ev = CocoEvaluator(gt)
    half = len(results) // 2
    ev.add_detections(results[:half])
    ev.score_images([im["id"] for im in gt["images"]])
    ev.add_detections(results[half:])  # late — invalidates incremental state
    got = ev.evaluate()

    want_ev = ScalarCocoEvaluator(gt)
    want_ev.add_detections(results)
    want = want_ev.evaluate()
    for k in want:
        assert got[k] == want[k], k
