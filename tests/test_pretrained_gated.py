"""Weights-gated end-to-end tests (skip unless official weights are cached).

Mirrors the reference's dog.jpg smoke test (reference: leanyolo/tests/
test_infer_dog_pretrained.py:26-77): with yolov10s PRETRAINED_COCO weights,
the demo dog image must yield dog + bicycle + truck at conf >= 0.80.

These only run when the official checkpoints are available offline
(LEANYOLO_WEIGHTS_DIR or the cache) — there is no network in CI.
"""

import os

import numpy as np
import pytest


def _weights_available(name: str) -> bool:
    from leanyolo_tpu.models.registry import _YOLOv10Weights

    entry = _YOLOv10Weights().get(name, "PRETRAINED_COCO")
    try:
        entry.resolve_path(download=False)
        return True
    except Exception:
        return False


def _dog_image():
    for cand in ("dog.jpg", "/root/reference/dog.jpg"):
        if os.path.exists(cand):
            return cand
    return None


@pytest.mark.fidelity
@pytest.mark.skipif(not _weights_available("yolov10s"), reason="official weights not cached")
@pytest.mark.skipif(_dog_image() is None, reason="dog.jpg not available")
def test_dog_detections_pretrained():
    import cv2

    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.coco import coco80_class_names
    from leanyolo_tpu.engine.predictor import Predictor

    names = coco80_class_names()
    model = get_model("yolov10s", weights="PRETRAINED_COCO", class_names=names)
    pred = Predictor(model, imgsz=640, decode="topk", conf_thresh=0.25, donate=False)
    bgr = cv2.imread(_dog_image(), cv2.IMREAD_COLOR)
    dets = pred.predict_images([cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)])[0]

    found = {names[int(c)] for c in dets[dets[:, 4] >= 0.80][:, 5]}
    assert {"dog", "bicycle", "truck"} <= found, found


@pytest.mark.fidelity
@pytest.mark.skipif(not _weights_available("yolov10s"), reason="official weights not cached")
def test_official_remap_coverage():
    """Every model leaf must fill from the official checkpoint (no random init)."""
    import warnings

    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.coco import coco80_class_names

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        get_model("yolov10s", weights="PRETRAINED_COCO", class_names=coco80_class_names())
    msgs = [str(x.message) for x in w]
    assert any("filled model" in m and "(100.0%)" in m for m in msgs), msgs
