"""NMS decode parity vs the reference on synthetic head outputs."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _synth_preds(seed=0, b=2, nc=6, reg_max=16, shapes=((16, 16), (8, 8), (4, 4))):
    rng = np.random.RandomState(seed)
    # Scale logits up a bit so several anchors clear the conf threshold.
    return [2.5 * rng.randn(b, 4 * reg_max + nc, h, w).astype(np.float32) for h, w in shapes]


def test_decode_nms_parity_with_reference():
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.models.yolov10.postprocess import decode_v10_predictions

    from leanyolo_tpu.models.yolov10.decode import decode_nms

    nc = 6
    preds = _synth_preds(nc=nc)
    conf, iou = 0.25, 0.45

    with torch.no_grad():
        ref = decode_v10_predictions(
            [torch.from_numpy(p) for p in preds],
            num_classes=nc,
            strides=(8, 16, 32),
            conf_thresh=conf,
            iou_thresh=iou,
            max_det=50,
        )

    j_preds = [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in preds]
    dets, num = decode_nms(
        j_preds,
        num_classes=nc,
        strides=(8, 16, 32),
        conf_thresh=conf,
        iou_thresh=iou,
        max_det=50,
        pre_topk=1000,
        class_wise=False,
        multi_label=False,
    )
    dets = np.asarray(dets)
    num = np.asarray(num)

    for i in range(len(ref)):
        want = ref[i][0].numpy()
        got = dets[i][: num[i]]
        # The reference keeps all conf-passing candidates per anchor (best
        # class only via max) — exactly our multi_label=False mode.
        assert got.shape == want.shape, (got.shape, want.shape)
        order_w = np.argsort(-want[:, 4])
        order_g = np.argsort(-got[:, 4])
        np.testing.assert_allclose(got[order_g][:, 4], want[order_w][:, 4], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[order_g][:, :4], want[order_w][:, :4], rtol=1e-3, atol=1e-2)
        np.testing.assert_array_equal(got[order_g][:, 5], want[order_w][:, 5])


def test_decode_direct_layout():
    """Legacy 4+nc direct-offset layout decodes and respects conf filtering."""
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.decode import decode_direct_nms

    rng = np.random.RandomState(0)
    nc = 3
    preds = [jnp.asarray(rng.randn(1, h, w, 4 + nc).astype(np.float32)) for h, w in ((8, 8), (4, 4), (2, 2))]
    dets, num = decode_direct_nms(preds, num_classes=nc, strides=(8, 16, 32), conf_thresh=0.3, max_det=20)
    dets, num = np.asarray(dets), np.asarray(num)
    assert dets.shape == (1, 20, 6)
    n = int(num[0])
    assert (dets[0, :n, 4] > 0.3).all()
    assert (dets[0, n:, 4] == 0).all()
    # boxes are valid xyxy
    assert (dets[0, :n, 2] >= dets[0, :n, 0]).all()
    assert (dets[0, :n, 3] >= dets[0, :n, 1]).all()
