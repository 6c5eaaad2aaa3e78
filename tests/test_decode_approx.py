"""approx_max_k decode mode: same shape contract, near-identical selections."""

import numpy as np


def test_decode_topk_approx_close_to_exact():
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.decode import decode_topk

    rng = np.random.RandomState(0)
    nc, reg_max = 80, 16
    preds = [jnp.asarray(rng.randn(2, h, w, 4 * reg_max + nc).astype(np.float32)) for h, w in ((16, 16), (8, 8), (4, 4))]

    exact = np.asarray(decode_topk(preds, num_classes=nc, strides=(8, 16, 32), max_det=100, approx=False))
    approx = np.asarray(decode_topk(preds, num_classes=nc, strides=(8, 16, 32), max_det=100, approx=True))
    assert exact.shape == approx.shape == (2, 100, 6)

    # On CPU approx_max_k falls back to exact; on TPU the top selections must
    # overlap heavily (ties only at the tail of the list).
    for i in range(2):
        ex = {tuple(np.round(r[:4], 2)) for r in exact[i][:50]}
        ap = {tuple(np.round(r[:4], 2)) for r in approx[i][:50]}
        assert len(ex & ap) >= 45


def test_predictor_bf16_mode():
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    p32 = Predictor(model, imgsz=64, decode="topk", dtype="float32", donate=False)
    pbf = Predictor(model, imgsz=64, decode="topk", dtype="bf16", donate=False)
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    d32, _ = p32.run_batch(x)
    dbf, _ = pbf.run_batch(x)
    assert d32.shape == dbf.shape
    # scores agree to bf16 tolerance for the top detections
    np.testing.assert_allclose(np.asarray(d32)[0, :5, 4], np.asarray(dbf)[0, :5, 4], atol=0.05)
