"""Serving-export decode parity vs the reference ONNX export wrapper.

The reference's `YOLOv10ONNXExport.forward` (export.py:32-198) is the
behavioral spec for the fixed-shape serving contract. These tests run that
torch module directly (no onnx) on synthetic head outputs against our
serving decode built from the same weights.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


class _FakeTorchModel:
    """Mimics the reference model interface the export wrapper expects."""

    def __init__(self, outputs_nchw, nc):
        import torch

        from leanyolo.models.yolov10.head import V10Detect

        self._outputs = [torch.from_numpy(o) for o in outputs_nchw]
        self.class_names = [f"c{i}" for i in range(nc)]
        self.head = V10Detect(nc=nc, ch=(16, 16, 16), reg_max=16)  # wrapper reads nc/reg_max only

    def eval(self):
        return self

    def __call__(self, x):
        self._eval_branches = {"one2one": self._outputs, "one2many": self._outputs}
        return self._outputs

    def modules(self):
        return []

    def parameters(self):
        import torch

        return iter([torch.zeros(1)])


def _mk_outputs(seed=0, b=2, nc=5, reg_max=16, shapes=((8, 8), (4, 4), (2, 2))):
    rng = np.random.RandomState(seed)
    return [2.0 * rng.randn(b, 4 * reg_max + nc, h, w).astype(np.float32) for h, w in shapes]


def _ref_wrapper(outputs, nc, *, imgsz, decode, conf, iou, max_dets, pre_topk):
    sys.path.insert(0, REFERENCE_ROOT)
    import torch

    import leanyolo.models.yolov10.export as ref_export
    from leanyolo.models.yolov10.export import YOLOv10ONNXExport

    if ref_export._tv_nms is None:  # torchvision absent: use the repo's own greedy NMS
        from leanyolo.utils.box_ops import nms as greedy_nms

        ref_export._tv_nms = lambda b, s, t: greedy_nms(b, s, float(t))

    model = _FakeTorchModel(outputs, nc)
    wrapper = YOLOv10ONNXExport(
        model, imgsz=imgsz, max_dets=max_dets, conf=conf, nms=(decode == "nms"), iou=iou, pre_topk=pre_topk
    )
    wrapper.strides = (8, 16, 32)
    with torch.no_grad():
        x = torch.zeros(outputs[0].shape[0], 3, imgsz, imgsz)
        dets, num = wrapper(x)
    return dets.numpy(), num.numpy()


def _ours(outputs, nc, *, imgsz, decode, conf, iou, max_dets, pre_topk):
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.decode import _flatten_pyramid, _nms_single
    from functools import partial

    feats = [jnp.asarray(o.transpose(0, 2, 3, 1)) for o in outputs]
    boxes, cls_logits = _flatten_pyramid(feats, nc, (8, 16, 32))
    scores = jax.nn.sigmoid(cls_logits)
    b, a, _ = scores.shape

    if decode == "topk":
        best_scores = jnp.max(scores, axis=-1)
        best_cls = jnp.argmax(scores, axis=-1).astype(jnp.float32)
        masked = jnp.where(best_scores >= conf, best_scores, -1.0)
        k = min(max_dets, a)
        top_vals, top_idx = jax.lax.top_k(masked, k)
        sel_boxes = jnp.clip(jnp.take_along_axis(boxes, top_idx[..., None], axis=1), 0, imgsz)
        sel_scores = jnp.maximum(jnp.take_along_axis(best_scores, top_idx, axis=1), 0.0)
        sel_cls = jnp.take_along_axis(best_cls, top_idx, axis=1)
        dets = jnp.concatenate([sel_boxes, sel_scores[..., None], sel_cls[..., None]], axis=-1)
        num = jnp.sum(sel_scores >= conf, axis=1).astype(jnp.int32)
        return np.asarray(dets), np.asarray(num)

    k_pre = min(pre_topk, a * nc)
    flat = scores.reshape(b, a * nc)
    cand_scores, pre_idx = jax.lax.top_k(flat, k_pre)
    anc_idx = pre_idx // nc
    cand_cls = (pre_idx % nc).astype(jnp.float32)
    cand_boxes = jnp.take_along_axis(boxes, anc_idx[..., None], axis=1)
    fn = partial(
        _nms_single, iou_thresh=iou, conf_thresh=conf, max_det=max_dets, class_wise=True,
        group_offset=float(imgsz) * 10.0 * nc,
    )
    dets, num = jax.vmap(fn)(cand_boxes, cand_scores, cand_cls)
    dets = dets.at[..., :4].set(jnp.clip(dets[..., :4], 0, imgsz))
    return np.asarray(dets), np.asarray(num)


def test_topk_serving_contract_parity():
    nc = 5
    outputs = _mk_outputs(nc=nc)
    kw = dict(imgsz=64, decode="topk", conf=0.4, iou=0.45, max_dets=50, pre_topk=200)
    want_dets, want_num = _ref_wrapper(outputs, nc, **kw)
    got_dets, got_num = _ours(outputs, nc, **kw)
    assert got_dets.shape == want_dets.shape
    np.testing.assert_array_equal(got_num, want_num)
    np.testing.assert_allclose(got_dets[..., 4], want_dets[..., 4], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_dets[..., :4], want_dets[..., :4], rtol=1e-3, atol=2e-3)
    np.testing.assert_array_equal(got_dets[..., 5], want_dets[..., 5])


def test_nms_serving_contract_parity():
    nc = 5
    outputs = _mk_outputs(seed=3, nc=nc)
    kw = dict(imgsz=64, decode="nms", conf=0.35, iou=0.5, max_dets=40, pre_topk=200)
    want_dets, want_num = _ref_wrapper(outputs, nc, **kw)
    got_dets, got_num = _ours(outputs, nc, **kw)
    np.testing.assert_array_equal(got_num, want_num)
    # compare valid rows, score-sorted
    for i in range(got_dets.shape[0]):
        n = int(want_num[i])
        w = want_dets[i][:n]
        g = got_dets[i][:n]
        ow, og = np.argsort(-w[:, 4]), np.argsort(-g[:, 4])
        np.testing.assert_allclose(g[og][:, 4], w[ow][:, 4], rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(g[og][:, 5], w[ow][:, 5])
        np.testing.assert_allclose(g[og][:, :4], w[ow][:, :4], rtol=1e-3, atol=2e-3)
