"""Decode parity + fidelity against the CAPTURED official-weight tensors.

The reference ships 39 MB of component tensors captured from the OFFICIAL
ultralytics YOLOv10 running PRETRAINED_COCO weights on the seed-0 320px
input (reference: leanyolo/tests/fidelity/generate_references.py:80-152,
saved under leanyolo/tests/data/refs/<variant>/). head_p{3,4,5}.pt are the
raw one2many head pyramids — REAL official-weight activation statistics,
usable offline with no network:

- decode tests (offline, always run): feed the captured head tensors through
  our `decode_topk` / `decode_nms` and require agreement with the torch
  reference decode (leanyolo/models/yolov10/postprocess.py:48-261) and the
  export wrapper's class-wise NMS (models/yolov10/export.py:145-198) on the
  SAME tensors. Previous parity suites used seeded-random logits; official
  activations have very different score/box statistics (sparse confident
  detections, saturated sigmoids), so this closes a real gap.
- fidelity test (weights-gated, skips offline): run OUR model under official
  weights on the captured input.pt and compare backbone_c3..head_p5 against
  the captured tensors within the reference rubric (rtol/atol 1e-4,
  max_abs 5e-4 — leanyolo/tests/fidelity/rubric.py:28-45). Unlike the
  re-run torch oracle (tools/fidelity_report.py) this also catches
  torch-version drift: the captures are frozen artifacts.
"""

import json
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

REFS_DIR = os.path.join(REFERENCE_ROOT, "leanyolo", "tests", "data", "refs")
VARIANTS = ("yolov10n", "yolov10s", "yolov10m", "yolov10b", "yolov10l", "yolov10x")

pytestmark = pytest.mark.skipif(
    not (reference_available() and os.path.isdir(REFS_DIR)),
    reason="reference repo / captured refs not mounted",
)


def _load_captured(variant: str, keys):
    import torch

    d = os.path.join(REFS_DIR, variant)
    if not os.path.isdir(d):
        pytest.skip(f"no captured refs for {variant}")
    out = []
    for k in keys:
        p = os.path.join(d, f"{k}.pt")
        if not os.path.exists(p):
            pytest.skip(f"missing captured tensor {variant}/{k}")
        out.append(torch.load(p, map_location="cpu", weights_only=True))
    return out


def _captured_heads(variant: str):
    """[B, 4R+nc, H, W] one2many pyramids (NCHW float32) for one variant."""
    return _load_captured(variant, ("head_p3", "head_p4", "head_p5"))


def _meta(variant: str) -> dict:
    with open(os.path.join(REFS_DIR, variant, "meta.json"), encoding="utf-8") as f:
        return json.load(f)


@pytest.mark.parametrize("variant", VARIANTS)
def test_captured_topk_decode_parity(variant):
    """Official NMS-free top-k decode matches the reference row-for-row."""
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.models.yolov10.postprocess import decode_v10_official_topk

    from leanyolo_tpu.models.yolov10.decode import decode_topk

    heads = _captured_heads(variant)
    with torch.no_grad():
        want = decode_v10_official_topk(heads, num_classes=80, strides=(8, 16, 32), max_det=300)

    j_preds = [jnp.asarray(h.numpy().transpose(0, 2, 3, 1)) for h in heads]
    got = np.asarray(decode_topk(j_preds, num_classes=80, strides=(8, 16, 32), max_det=300))

    w = want[0][0].numpy()
    g = got[0]
    assert g.shape == w.shape, (g.shape, w.shape)
    # Row-for-row (same two-stage selection incl. tie order).
    np.testing.assert_allclose(g[:, 4], w[:, 4], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(g[:, 5], w[:, 5])
    np.testing.assert_allclose(g[:, :4], w[:, :4], rtol=1e-4, atol=5e-3)


@pytest.mark.parametrize("variant", VARIANTS)
def test_captured_nms_decode_parity(variant):
    """Greedy NMS decode keep-set matches the reference on official stats."""
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.models.yolov10.postprocess import decode_v10_predictions

    from leanyolo_tpu.models.yolov10.decode import decode_nms

    conf, iou = 0.25, 0.45
    heads = _captured_heads(variant)
    with torch.no_grad():
        ref = decode_v10_predictions(
            heads, num_classes=80, strides=(8, 16, 32),
            conf_thresh=conf, iou_thresh=iou, max_det=300,
        )

    j_preds = [jnp.asarray(h.numpy().transpose(0, 2, 3, 1)) for h in heads]
    dets, num = decode_nms(
        j_preds, num_classes=80, strides=(8, 16, 32),
        conf_thresh=conf, iou_thresh=iou, max_det=300,
        pre_topk=1000, class_wise=False, multi_label=False,
    )
    dets, num = np.asarray(dets), np.asarray(num)

    want = ref[0][0].numpy()
    got = dets[0][: num[0]]
    assert got.shape == want.shape, (got.shape, want.shape)
    order_w = np.argsort(-want[:, 4])
    order_g = np.argsort(-got[:, 4])
    np.testing.assert_allclose(got[order_g][:, 4], want[order_w][:, 4], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got[order_g][:, 5], want[order_w][:, 5])
    np.testing.assert_allclose(got[order_g][:, :4], want[order_w][:, :4], rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("variant", VARIANTS)
def test_captured_classwise_export_parity(variant):
    """Class-wise NMS (export-wrapper semantics) matches on official stats."""
    from test_export_wrapper_parity import _ours, _ref_wrapper

    heads = [h.numpy() for h in _captured_heads(variant)]
    imgsz = int(_meta(variant).get("img", 320))
    kw = dict(imgsz=imgsz, decode="nms", conf=0.25, iou=0.45, max_dets=300, pre_topk=1000)
    want_dets, want_num = _ref_wrapper(heads, 80, **kw)
    got_dets, got_num = _ours(heads, 80, **kw)

    np.testing.assert_array_equal(got_num, want_num)
    n = int(want_num[0])
    np.testing.assert_allclose(got_dets[0][:n, 4], want_dets[0][:n, 4], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got_dets[0][:n, 5], want_dets[0][:n, 5])
    np.testing.assert_allclose(got_dets[0][:n, :4], want_dets[0][:n, :4], rtol=1e-3, atol=1e-2)


def _weights_available(name: str) -> bool:
    from leanyolo_tpu.models.registry import _YOLOv10Weights

    entry = _YOLOv10Weights().get(name, "PRETRAINED_COCO")
    try:
        entry.resolve_path(download=False)
        return True
    except Exception:
        return False


RUBRIC = {"rtol": 1e-4, "atol": 1e-4, "max_abs": 5e-4}  # reference rubric.py:28-45


@pytest.mark.fidelity
@pytest.mark.parametrize("variant", VARIANTS)
def test_captured_fidelity_official_weights(variant):
    """OUR model vs the frozen official captures (weights day; skips offline)."""
    if not _weights_available(variant):
        pytest.skip("official weights not cached")
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.models.registry import get_model
    from leanyolo_tpu.models.yolov10.model import backbone_apply, head_apply, neck_apply

    captured = _load_captured(
        variant,
        ("input", "backbone_c3", "backbone_c4", "backbone_c5",
         "neck_p3", "neck_p4", "neck_p5", "head_p3", "head_p4", "head_p5"),
    )
    x = captured[0].numpy()  # [1, 3, H, W]; fed raw (captures skip normalization)
    model = get_model(variant, weights="PRETRAINED_COCO", class_names=[f"c{i}" for i in range(80)])
    cfg = model.cfg

    @jax.jit
    def fwd(p, xx):
        hp = jax.lax.Precision.HIGHEST
        c3, c4, c5 = backbone_apply(p["backbone"], xx, cfg, precision=hp)
        p3, p4, p5 = neck_apply(p["neck"], c3, c4, c5, cfg, precision=hp)
        head = head_apply(p["head"], (p3, p4, p5), branch="one2many", precision=hp)
        return (c3, c4, c5), (p3, p4, p5), head

    (c3, c4, c5), (p3, p4, p5), head = fwd(model.params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = [c3, c4, c5, p3, p4, p5, *head]
    for name, want_t, got in zip(
        ("backbone_c3", "backbone_c4", "backbone_c5", "neck_p3", "neck_p4", "neck_p5",
         "head_p3", "head_p4", "head_p5"),
        captured[1:],
        ours,
    ):
        want = want_t.numpy().transpose(0, 2, 3, 1)
        got = np.asarray(got, np.float32)
        assert got.shape == want.shape, (name, got.shape, want.shape)
        max_abs = float(np.abs(got - want).max())
        ok = np.allclose(got, want, rtol=RUBRIC["rtol"], atol=RUBRIC["atol"]) and max_abs <= RUBRIC["max_abs"]
        assert ok, f"{variant}/{name}: max_abs={max_abs:.2e} exceeds rubric {RUBRIC}"
