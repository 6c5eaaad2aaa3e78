"""Serving export: fixed-shape contract + StableHLO round trip."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model():
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    return YOLOv10.create("yolov10n", class_names=["a", "b", "c"], seed=0)


def test_serving_fn_contract_topk(tiny_model):
    import jax.numpy as jnp

    from leanyolo_tpu.export.serving import build_serving_fn

    fn, _ = build_serving_fn(tiny_model, imgsz=64, decode="topk", max_dets=100, conf=0.25)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dets, num = fn(x)
    assert dets.shape == (2, 100, 6)
    assert num.shape == (2,) and num.dtype == jnp.int32
    d = np.asarray(dets)
    assert (d[..., :4] >= 0).all() and (d[..., :4] <= 64).all()


def test_serving_fn_contract_nms(tiny_model):
    import jax.numpy as jnp

    from leanyolo_tpu.export.serving import build_serving_fn

    fn, _ = build_serving_fn(tiny_model, imgsz=64, decode="nms", max_dets=50, conf=0.01, pre_topk=200)
    x = jnp.full((1, 64, 64, 3), 128.0, jnp.float32)
    dets, num = fn(x)
    assert dets.shape == (1, 50, 6)
    n = int(np.asarray(num)[0])
    d = np.asarray(dets)[0]
    assert (d[:n, 4] >= 0.01).all()
    assert (d[n:] == 0).all()


def test_stablehlo_roundtrip(tiny_model, tmp_path):
    import jax.numpy as jnp

    from leanyolo_tpu.export.serving import build_serving_fn, export_serving, load_exported

    out = str(tmp_path / "m")
    path = export_serving(tiny_model, out, imgsz=64, decode="topk", max_dets=20, dynamic_batch=False)
    assert os.path.exists(path)
    meta = json.loads(open(path + ".json").read())
    assert meta["model_name"] == "yolov10n"
    assert meta["outputs"]["detections"] == [1, 20, 6]

    fn, _ = build_serving_fn(tiny_model, imgsz=64, decode="topk", max_dets=20)
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    ref_dets, ref_num = fn(x)
    got_dets, got_num = load_exported(path)(x)
    np.testing.assert_allclose(np.asarray(got_dets), np.asarray(ref_dets), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_num), np.asarray(ref_num))


def test_stablehlo_dynamic_batch(tiny_model, tmp_path):
    import jax.numpy as jnp

    from leanyolo_tpu.export.serving import export_serving, load_exported

    path = export_serving(tiny_model, str(tmp_path / "dyn"), imgsz=64, decode="topk", max_dets=10, dynamic_batch=True)
    call = load_exported(path)
    for b in (1, 3):
        dets, num = call(jnp.zeros((b, 64, 64, 3), jnp.float32))
        assert dets.shape == (b, 10, 6)
        assert num.shape == (b,)


def test_bucketed_export_and_serving(tiny_model, tmp_path):
    """Arbitrary-size serving: mixed-size images route to the right bucket
    program and come back in original-image coordinates."""
    import jax.numpy as jnp

    from leanyolo_tpu.export.serving import (
        BucketedServing,
        build_serving_fn,
        export_serving_bucketed,
    )

    mpath = export_serving_bucketed(
        tiny_model, str(tmp_path / "buck"), sizes=(96, 64), decode="topk",
        max_dets=10, conf=0.0,
    )
    meta = json.loads(open(mpath).read())
    assert sorted(meta["buckets"]) == ["64", "96"]
    for name in meta["buckets"].values():
        assert os.path.exists(os.path.join(str(tmp_path / "buck"), name))

    srv = BucketedServing(mpath)
    rs = np.random.RandomState(0)
    imgs = [
        rs.randint(0, 256, (48, 40, 3), np.uint8),    # -> 64 bucket
        rs.randint(0, 256, (80, 90, 3), np.uint8),    # -> 96 bucket
        rs.randint(0, 256, (200, 150, 3), np.uint8),  # larger than all -> 96 (downscale)
    ]
    dets = srv.predict_images(imgs, apply_conf_filter=False)
    assert len(dets) == 3
    for d, img in zip(dets, imgs):
        assert d.shape == (10, 6)
        h, w = img.shape[:2]
        assert (d[:, 0] >= -1e-3).all() and (d[:, 2] <= w + 1e-3).all()
        assert (d[:, 1] >= -1e-3).all() and (d[:, 3] <= h + 1e-3).all()

    # An exact-bucket-size image must match the plain single-size program.
    from leanyolo_tpu.ops.letterbox import letterbox

    img64 = rs.randint(0, 256, (64, 64, 3), np.uint8)
    lb, _, _ = letterbox(img64, 64)
    fn, _ = build_serving_fn(tiny_model, imgsz=64, decode="topk", max_dets=10, conf=0.0)
    ref_dets, _ = fn(jnp.asarray(lb[None].astype(np.float32)))
    got = srv.predict_images([img64], apply_conf_filter=False)[0]
    np.testing.assert_allclose(got, np.asarray(ref_dets)[0], rtol=1e-4, atol=1e-4)


def test_bucketed_serving_nms_mode(tiny_model, tmp_path):
    """nms-mode bucketed serving truncates per-image results to num_dets."""
    from leanyolo_tpu.export.serving import BucketedServing, export_serving_bucketed

    mpath = export_serving_bucketed(
        tiny_model, str(tmp_path / "bnms"), sizes=(64,), decode="nms",
        max_dets=15, conf=0.01, pre_topk=100,
    )
    srv = BucketedServing(mpath)
    rs = np.random.RandomState(1)
    imgs = [rs.randint(0, 256, (50, 60, 3), np.uint8), rs.randint(0, 256, (64, 64, 3), np.uint8)]
    dets = srv.predict_images(imgs)
    for d, img in zip(dets, imgs):
        assert d.shape[1] == 6 and d.shape[0] <= 15
        assert (d[:, 4] >= 0.01).all()  # nms mode truncates to num_dets rows
        h, w = img.shape[:2]
        assert (d[:, 2] <= w + 1e-3).all() and (d[:, 3] <= h + 1e-3).all()
