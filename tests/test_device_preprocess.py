"""Device-side letterbox (fixed-canvas bilinear warp) tests.

The device path must (a) reproduce host-cv2 letterbox pixels closely on
generic images (cv2 uses fixed-point interpolation, so parity is approximate)
and exactly on pad regions/geometry, and (b) yield the same mAP as the host
path on synthetic COCO (mAP-level parity is the acceptance criterion —
SURVEY.md §7 hard parts; reference letterbox.py:9-91).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def _warp_one(img, target):
    import jax.numpy as jnp

    from leanyolo_tpu.ops.letterbox import canvas_batch, letterbox_batch_jax

    canvas, new_hw, pads, hw, metas = canvas_batch([img], target)
    out = letterbox_batch_jax(canvas, jnp.asarray(new_hw), jnp.asarray(pads), jnp.asarray(hw), target)
    return np.asarray(out)[0], metas[0]


@pytest.mark.parametrize("shape", [(64, 96), (96, 64), (100, 100), (37, 53)])
def test_warp_matches_host_letterbox(shape):
    from leanyolo_tpu.ops.letterbox import letterbox

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (*shape, 3), np.uint8)
    target = 64

    want, (gw, gh), (px, py) = letterbox(img, target)
    got, ((gw2, gh2), (px2, py2), _) = _warp_one(img, target)

    assert (gw2, gh2) == (gw, gh) and (px2, py2) == (px, py)
    # Pad region must be exactly 114.
    pad_mask = np.all(want == 114, axis=-1)
    assert np.all(got[pad_mask] == 114.0)
    # Interpolated pixels: cv2 INTER_LINEAR is fixed-point (1/2048 steps);
    # allow ~2 LSB of uint8.
    diff = np.abs(got.astype(np.float32) - want.astype(np.float32))
    assert diff.max() <= 2.0, diff.max()
    assert diff.mean() < 0.3


def test_warp_identity_when_size_matches():
    """target == image size: the warp must be an exact copy."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    got, _ = _warp_one(img, 64)
    np.testing.assert_array_equal(got, img.astype(np.float32))


def test_canvas_batch_mixed_sizes_single_program():
    """Different original sizes share one canvas shape (no recompiles)."""
    import jax.numpy as jnp

    from leanyolo_tpu.ops.letterbox import canvas_batch, letterbox_batch_jax

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (h, w, 3), np.uint8) for h, w in [(48, 80), (80, 48), (64, 64)]]
    canvas, new_hw, pads, hw, _ = canvas_batch(imgs, 64)
    assert canvas.shape[1] == canvas.shape[2] >= 80
    out = letterbox_batch_jax(canvas, jnp.asarray(new_hw), jnp.asarray(pads), jnp.asarray(hw), 64)
    assert out.shape == (3, 64, 64, 3)
    from leanyolo_tpu.ops.letterbox import letterbox

    for i, img in enumerate(imgs):
        want, _, _ = letterbox(img, 64)
        diff = np.abs(np.asarray(out)[i] - want.astype(np.float32))
        assert diff.max() <= 2.0


def test_validate_coco_device_preprocess_map_parity(tmp_path):
    """--preprocess device must reproduce the host path's mAP on synth COCO."""
    from synth_coco import make_synth_coco

    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=4)
    model = get_model("yolov10n", weights=None, class_names=["a", "b", "c"], seed=7)
    kw = dict(images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=2, workers=2)
    s_host = validate_coco(model, preprocess="host", **kw)
    s_dev = validate_coco(model, preprocess="device", **kw)
    assert s_dev["n_images"] == s_host["n_images"] == 4
    # Random weights produce near-uniform logits; mAP values must agree
    # closely (pixel LSB differences only).
    assert s_dev["map_50_95"] == pytest.approx(s_host["map_50_95"], abs=2e-2)


def test_predict_images_device_preprocess():
    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    model = YOLOv10.create("yolov10n", class_names=["a"], seed=0)
    pred = Predictor(model, imgsz=64, decode="topk", conf_thresh=0.0, donate=False)
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 255, (48, 80, 3), np.uint8), rng.randint(0, 255, (80, 48, 3), np.uint8)]
    out_host = pred.predict_images(imgs, apply_conf_filter=False)
    out_dev = pred.predict_images(imgs, apply_conf_filter=False, preprocess="device")
    for dh, dd in zip(out_host, out_dev):
        assert dh.shape == dd.shape
        # Boxes in original coords; random-weight logits shift slightly with
        # LSB pixel changes, so compare scores loosely and shapes strictly.
        np.testing.assert_allclose(dh[:, 4], dd[:, 4], atol=5e-3)


def test_canvas_batch_fits_oversize_images():
    """Images larger than choose_bucket's max_size must still fit the canvas
    (the device warp downscales like the host path) instead of raising
    'exceeds canvas'; oversize canvases round to a coarse 256 step."""
    from leanyolo_tpu.ops.letterbox import canvas_batch, choose_bucket, letterbox, letterbox_batch_jax

    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    big = rng.randint(0, 255, (1400, 900, 3), np.uint8)
    assert choose_bucket((1400, 1400)) < 1400  # the old cap that crashed
    canvas, new_hw, pads, hw, _ = canvas_batch([big], 64)
    assert canvas.shape[1] >= 1400 and canvas.shape[1] % 256 == 0
    out = letterbox_batch_jax(canvas, jnp.asarray(new_hw), jnp.asarray(pads), jnp.asarray(hw), 64)
    want, _, _ = letterbox(big, 64)
    assert np.abs(np.asarray(out)[0] - want.astype(np.float32)).max() <= 2.0


# ---- train-path device letterbox (round-2 verdict #7: device preprocessing
# ---- everywhere it's claimed; reference letterbox.py:9-91 is the spec) ----


def test_train_device_box_transform_matches_host(tmp_path):
    """The affine GT-box map the train step applies on device (x' = x*gain +
    pad, from DeviceBatch.gainpad) must reproduce the host dataset's
    letterbox-space boxes exactly."""
    from synth_coco import make_synth_coco

    from leanyolo_tpu.data.dataset import CocoDetection, collate, collate_device

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=4, size=(96, 128))
    ds_h = CocoDetection(img_dir, ann, img_size=64)
    ds_d = CocoDetection(img_dir, ann, img_size=64, preprocess="device")
    bh = collate([ds_h[i] for i in range(4)], max_boxes=8)
    bd = collate_device([ds_d[i] for i in range(4)], 8, ds_d.canvas_size)

    mult = bd.gainpad[:, None, [0, 1, 0, 1]]
    add = bd.gainpad[:, None, [2, 3, 2, 3]]
    # Only real boxes: padding rows are zeros, which the affine map shifts by
    # `pad` — harmless downstream because every consumer masks by gt_mask.
    m = bh.gt_mask
    np.testing.assert_allclose((bd.gt_boxes * mult + add)[m], bh.gt_boxes[m], atol=1e-4)
    np.testing.assert_array_equal(bd.gt_mask, bh.gt_mask)
    np.testing.assert_array_equal(bd.gt_labels, bh.gt_labels)


def test_train_step_device_preprocess_loss_parity_identity(tmp_path):
    """Images exactly at img_size: the device warp is an identity copy, so a
    train step under device preprocessing must match the host-path step
    numerically (same pixels, same GT, same PRNG key)."""
    import jax

    from synth_coco import make_synth_coco

    from leanyolo_tpu.data.dataset import CocoDetection, DataLoader
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=2, size=(64, 64))
    common = dict(epochs=1, steps_per_epoch=1, augment=False, lr=1e-3)

    losses = {}
    params = {}
    for mode in ("host", "device"):
        ds = CocoDetection(img_dir, ann, img_size=64, preprocess=mode)
        dl = DataLoader(ds, batch_size=2, shuffle=False, max_boxes=8, workers=0)
        batch = next(iter(dl))
        model = YOLOv10.create("yolov10n", class_names=["a", "b", "c"], seed=0)
        tr = Trainer(model, TrainConfig(device_preprocess=(mode == "device"), imgsz=64, **common))
        losses[mode] = tr.train_step(batch, jax.random.PRNGKey(0))
        params[mode] = model.params

    assert losses["device"]["total"] == pytest.approx(losses["host"]["total"], rel=1e-5)
    leaves_h = jax.tree_util.tree_leaves(params["host"])
    leaves_d = jax.tree_util.tree_leaves(params["device"])
    for lh, ld in zip(leaves_h, leaves_d):
        np.testing.assert_allclose(np.asarray(ld), np.asarray(lh), rtol=1e-4, atol=1e-5)


def test_train_step_device_preprocess_resized_converges(tmp_path):
    """Mixed-size images through the device path: loss must be finite, close
    to the host path's (pixel-LSB differences only), and decrease over steps."""
    import jax

    from synth_coco import make_synth_coco

    from leanyolo_tpu.data.dataset import CocoDetection, DataLoader
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=2, size=(96, 128))
    common = dict(epochs=1, steps_per_epoch=1, augment=False, lr=1e-3)

    first = {}
    for mode in ("host", "device"):
        ds = CocoDetection(img_dir, ann, img_size=64, preprocess=mode)
        dl = DataLoader(ds, batch_size=2, shuffle=False, max_boxes=8, workers=0)
        batch = next(iter(dl))
        model = YOLOv10.create("yolov10n", class_names=["a", "b", "c"], seed=0)
        tr = Trainer(model, TrainConfig(device_preprocess=(mode == "device"), imgsz=64, **common))
        ls = [tr.train_step(batch, jax.random.PRNGKey(s))["total"] for s in range(3)]
        assert all(np.isfinite(v) for v in ls)
        assert ls[-1] < ls[0]
        first[mode] = ls[0]
    assert first["device"] == pytest.approx(first["host"], rel=2e-2)


def test_trainer_batch_mode_mismatch_raises():
    import jax

    from leanyolo_tpu.data.dataset import Batch
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    model = YOLOv10.create("yolov10n", class_names=["a"], seed=0)
    tr = Trainer(model, TrainConfig(epochs=1, steps_per_epoch=1, device_preprocess=True, imgsz=64))
    host_batch = Batch(
        np.zeros((1, 64, 64, 3), np.uint8),
        np.zeros((1, 4), np.int32),
        np.zeros((1, 4, 4), np.float32),
        np.zeros((1, 4), bool),
        [None],
    )
    with pytest.raises(ValueError, match="batch/preprocess mismatch"):
        tr.train_step(host_batch, jax.random.PRNGKey(0))


def test_dataset_canvas_size_missing_dims_raises():
    from leanyolo_tpu.ops.letterbox import dataset_canvas_size

    with pytest.raises(ValueError, match="lack height/width"):
        dataset_canvas_size([{"id": 1, "file_name": "x.jpg"}], 64)
    assert dataset_canvas_size([{"height": 100, "width": 200}], 64) >= 200


def test_validate_coco_device_preprocess_viz(tmp_path):
    """Device preprocessing + viz: letterboxed pixels never reach the host,
    so viz renders on the ORIGINAL images with unletterboxed boxes (this
    combination used to raise)."""
    import os

    from synth_coco import make_synth_coco

    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=2)
    model = get_model("yolov10n", weights=None, class_names=["a", "b", "c"], seed=7)
    viz = str(tmp_path / "viz")
    validate_coco(
        model, images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=2,
        workers=0, preprocess="device", viz_dir=viz, viz_conf=0.0,
    )
    names = sorted(os.listdir(viz))
    assert names == ["img_0000.jpg", "img_0001.jpg"]
    import cv2

    # Rendered on the ORIGINAL image: original (96, 128) shape, not 64x64.
    out = cv2.imread(os.path.join(viz, names[0]))
    assert out.shape[:2] == (96, 128)
