"""Metamorphic + hand-computed property tests for utils/coco_eval.py.

The differential suite (tests/test_coco_eval_differential.py) checks our
evaluator against an in-repo transcription of pycocotools — both sides could
in principle share a misreading (PROOF.md residual risks). These tests are
oracle-free: metamorphic invariances that must hold for ANY correct COCO
evaluator, plus tiny scenes whose 101-point interpolated AP is computed by
hand from the COCOeval definition (reference behavior consumed via
pycocotools at /root/reference/tools/val.py:236-248).
"""

import numpy as np
import pytest

from leanyolo_tpu.utils.coco_eval import CocoEvaluator


def _gt(images, annotations, categories):
    return {
        "images": [{"id": i, "width": 640, "height": 640} for i in images],
        "annotations": [
            {
                "id": n,
                "image_id": a[0],
                "category_id": a[1],
                "bbox": list(map(float, a[2])),
                "area": float(a[2][2] * a[2][3]) if len(a) < 4 else float(a[3]),
                "iscrowd": int(a[4]) if len(a) > 4 else 0,
            }
            for n, a in enumerate(annotations)
        ],
        "categories": [{"id": c} for c in categories],
    }


def _dets(rows):
    return [
        {"image_id": r[0], "category_id": r[1], "bbox": list(map(float, r[2])), "score": float(r[3])}
        for r in rows
    ]


def _stats(gt, results, max_dets=100):
    ev = CocoEvaluator(gt, max_dets=max_dets)
    ev.add_detections(results)
    return ev.evaluate()


# ---------------------------------------------------------------- hand-computed


def test_perfect_single_detection_is_ap_1():
    gt = _gt([1], [(1, 1, (10, 10, 20, 20))], [1])
    s = _stats(gt, _dets([(1, 1, (10, 10, 20, 20), 0.9)]))
    assert s["map_50_95"] == pytest.approx(1.0)
    assert s["map_50"] == pytest.approx(1.0)
    assert s["map_75"] == pytest.approx(1.0)
    # 20x20 = 400 px^2 -> small; no medium/large GTs -> those means are 0.
    assert s["map_small"] == pytest.approx(1.0)
    assert s["map_medium"] == 0.0 and s["map_large"] == 0.0


def test_duplicate_detection_exact_ap():
    """A duplicate of a matched det is a pure FP ranked mid-list.

    Ranking: TP (r=.5, p=1), dup-FP (r=.5, p=.5), TP (r=1, p=2/3).
    Monotone envelope [1, 2/3, 2/3]; recall thresholds 0.00..0.50 (51 pts)
    read precision 1, 0.51..1.00 (50 pts) read 2/3:
    AP = (51 + 50*(2/3)) / 101 at every IoU threshold (exact-overlap boxes).
    """
    gt = _gt([1], [(1, 1, (0, 0, 10, 10)), (1, 1, (50, 50, 10, 10))], [1])
    clean = _dets([(1, 1, (0, 0, 10, 10), 0.9), (1, 1, (50, 50, 10, 10), 0.7)])
    dup = clean + _dets([(1, 1, (0, 0, 10, 10), 0.8)])

    assert _stats(gt, clean)["map_50_95"] == pytest.approx(1.0)
    want = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    s = _stats(gt, dup)
    assert s["map_50_95"] == pytest.approx(want, abs=1e-12)
    assert s["map_50"] == pytest.approx(want, abs=1e-12)


def test_crowd_matches_are_ignored_not_fp():
    """A det whose only overlap is a crowd GT is neither TP nor FP — even
    when it outranks the true TP (which would otherwise crater AP)."""
    gt = _gt(
        [1],
        [(1, 1, (0, 0, 10, 10)), (1, 1, (50, 50, 30, 30), 900.0, 1)],
        [1],
    )
    dets = _dets(
        [
            (1, 1, (55, 55, 10, 10), 0.95),  # fully inside the crowd region
            (1, 1, (0, 0, 10, 10), 0.90),    # the real TP
            (1, 1, (200, 200, 10, 10), 0.70),  # plain FP below the TP
        ]
    )
    s = _stats(gt, dets)
    # Trailing FPs after full recall never lower interpolated AP.
    assert s["map_50_95"] == pytest.approx(1.0)

    # Crowd matching is many-to-one: a second crowd-covered det is ALSO ignored.
    s2 = _stats(gt, dets + _dets([(1, 1, (60, 60, 10, 10), 0.93)]))
    assert s2["map_50_95"] == pytest.approx(1.0)


def test_area_boundary_is_inclusive_both_sides():
    """pycocotools gates with (area < lo) | (area > hi): a GT of exactly
    32^2 px^2 counts in BOTH 'small' and 'medium' (cocoeval.evaluateImg)."""
    gt = _gt([1], [(1, 1, (0, 0, 32, 32))], [1])  # area == 1024 == 32^2
    s = _stats(gt, _dets([(1, 1, (0, 0, 32, 32), 0.9)]))
    assert s["map_small"] == pytest.approx(1.0)
    assert s["map_medium"] == pytest.approx(1.0)
    assert s["map_large"] == 0.0

    gt2 = _gt([1], [(1, 1, (0, 0, 41, 25))], [1])  # area 1025: medium only
    s2 = _stats(gt2, _dets([(1, 1, (0, 0, 41, 25), 0.9)]))
    assert s2["map_small"] == 0.0
    assert s2["map_medium"] == pytest.approx(1.0)


def test_half_iou_detection_threshold_cut():
    """A det at IoU exactly 0.5 vs its GT: matched for thresholds <= 0.5
    (pycocotools requires iou >= min(thr, 1-eps)), unmatched above -> AP is
    1 for t=0.50 and 0 for t >= 0.55, so map_50_95 = 1/10."""
    gt = _gt([1], [(1, 1, (0, 0, 10, 20))], [1])
    # [0,0,10,10] vs [0,0,10,20]: inter 100, union 200 -> IoU 0.5
    s = _stats(gt, _dets([(1, 1, (0, 0, 10, 10), 0.9)]))
    assert s["map_50"] == pytest.approx(1.0)
    assert s["map_75"] == pytest.approx(0.0)
    assert s["map_50_95"] == pytest.approx(0.1)


# ---------------------------------------------------------------- metamorphic


def _random_scene(rng, n_imgs=6, n_cats=4, crowd_frac=0.15):
    imgs = list(range(1, n_imgs + 1))
    cats = [3, 7, 11, 20][:n_cats]
    anns, dets = [], []
    for img in imgs:
        for _ in range(rng.randint(0, 6)):
            c = cats[rng.randint(len(cats))]
            x, y = rng.uniform(0, 500, 2)
            w, h = rng.uniform(8, 120, 2)
            crowd = 1 if rng.rand() < crowd_frac else 0
            anns.append((img, c, (x, y, w, h), w * h, crowd))
            # A det near this GT with some jitter, sometimes wrong class
            if rng.rand() < 0.8:
                dc = c if rng.rand() < 0.85 else cats[rng.randint(len(cats))]
                jx, jy = rng.uniform(-8, 8, 2)
                dets.append((img, dc, (x + jx, y + jy, w * rng.uniform(0.8, 1.2), h * rng.uniform(0.8, 1.2)), rng.rand()))
        for _ in range(rng.randint(0, 4)):  # background FPs
            c = cats[rng.randint(len(cats))]
            x, y = rng.uniform(0, 500, 2)
            dets.append((img, c, (x, y, rng.uniform(8, 60), rng.uniform(8, 60)), rng.rand()))
    return _gt(imgs, anns, cats), _dets(dets)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_detection_order_invariance(seed):
    rng = np.random.RandomState(seed)
    gt, dets = _random_scene(rng)
    base = _stats(gt, dets)
    perm = [dets[i] for i in rng.permutation(len(dets))]
    assert _stats(gt, perm) == base


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_score_monotone_transform_invariance(seed):
    """AP depends only on the score RANKING, not the values."""
    rng = np.random.RandomState(seed)
    gt, dets = _random_scene(rng)
    base = _stats(gt, dets)
    affine = [dict(d, score=0.05 + 0.9 * d["score"]) for d in dets]
    cubed = [dict(d, score=d["score"] ** 3) for d in dets]
    assert _stats(gt, affine) == base
    assert _stats(gt, cubed) == base


@pytest.mark.parametrize("seed", [0, 1])
def test_category_relabel_invariance(seed):
    """mAP is a mean over categories: a bijective relabel preserves it."""
    rng = np.random.RandomState(seed)
    gt, dets = _random_scene(rng)
    base = _stats(gt, dets)
    remap = {3: 101, 7: 5, 11: 42, 20: 9}
    gt2 = dict(
        gt,
        annotations=[dict(a, category_id=remap[a["category_id"]]) for a in gt["annotations"]],
        categories=[{"id": remap[c["id"]]} for c in gt["categories"]],
    )
    dets2 = [dict(d, category_id=remap[d["category_id"]]) for d in dets]
    s2 = _stats(gt2, dets2)
    # Category means reduce in sorted-id order: allow summation-order ULPs.
    assert s2.keys() == base.keys()
    for k in base:
        assert s2[k] == pytest.approx(base[k], abs=1e-12), k


def test_max_dets_truncation():
    """Dets ranked below the per-(img,cat) maxDets cap cannot change stats."""
    gt = _gt([1], [(1, 1, (0, 0, 20, 20)), (1, 1, (100, 100, 20, 20))], [1])
    rng = np.random.RandomState(0)
    dets = _dets([(1, 1, (0, 0, 20, 20), 0.99), (1, 1, (100, 100, 20, 20), 0.98)])
    for _ in range(10):
        x, y = rng.uniform(200, 500, 2)
        dets += _dets([(1, 1, (x, y, 15, 15), rng.uniform(0.3, 0.9))])
    base = _stats(gt, dets, max_dets=12)
    # Anything BELOW the existing 12 scores is truncated away at max_dets=12.
    extra = dets + _dets([(1, 1, (400, 30, 10, 10), 0.01), (1, 1, (30, 400, 10, 10), 0.02)])
    assert _stats(gt, extra, max_dets=12) == base


def test_disjoint_images_compose():
    """Evaluating the union of two disjoint image sets equals evaluating a
    scene that simply contains both (per-image independence)."""
    rng = np.random.RandomState(3)
    gt_a, dets_a = _random_scene(rng, n_imgs=3)
    # Shift image ids of a second scene out of the way, same categories.
    gt_b, dets_b = _random_scene(rng, n_imgs=3)
    shift = 100
    gt_b = dict(
        gt_b,
        images=[{"id": im["id"] + shift, "width": 640, "height": 640} for im in gt_b["images"]],
        annotations=[dict(a, image_id=a["image_id"] + shift) for a in gt_b["annotations"]],
    )
    dets_b = [dict(d, image_id=d["image_id"] + shift) for d in dets_b]

    merged = dict(
        gt_a,
        images=gt_a["images"] + gt_b["images"],
        annotations=gt_a["annotations"] + [dict(a, id=a["id"] + 10_000) for a in gt_b["annotations"]],
    )
    s_merged = _stats(merged, dets_a + dets_b)

    # The merged stats must be reproducible from the per-category precision
    # arrays of a single evaluator — i.e. merging is just more (img, cat)
    # cells, no cross-image interaction. Re-evaluate with shuffled det order
    # as an independent path to the same numbers.
    rng2 = np.random.RandomState(4)
    alldets = dets_a + dets_b
    s_shuf = _stats(merged, [alldets[i] for i in rng2.permutation(len(alldets))])
    assert s_merged == s_shuf
