"""End-to-end pipeline tests on synthetic data (val, train CLI, infer CLI).

Mirrors the reference CLI-in-process test style (reference: leanyolo/tests/
test_tools_train_cli.py:46-64, test_eval_synthetic.py:11-41).
"""

import os
import sys

import numpy as np
import pytest

from synth_coco import make_synth_coco


def test_validate_coco_synthetic(tmp_path):
    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco

    img_dir, ann = make_synth_coco(str(tmp_path))
    model = get_model("yolov10n", weights=None, class_names=["class0", "class1", "class2"])
    viz_dir = str(tmp_path / "viz")
    stats = validate_coco(
        model, images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=2, decode="topk", workers=2,
        viz_dir=viz_dir, viz_conf=0.0, viz_name_mode="id",
    )
    assert 0.0 <= stats["map_50_95"] <= 1.0
    assert stats["n_images"] == 4
    assert sorted(os.listdir(viz_dir)) == ["1.jpg", "2.jpg", "3.jpg", "4.jpg"]


def test_validate_nms_decode_synthetic(tmp_path):
    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco

    img_dir, ann = make_synth_coco(str(tmp_path))
    model = get_model("yolov10n", weights=None, class_names=["class0", "class1", "class2"])
    stats = validate_coco(
        model, images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=4, decode="nms",
        conf_thresh=0.05, iou_thresh=0.5, workers=2,
    )
    assert 0.0 <= stats["map_50_95"] <= 1.0


def test_train_cli_synthetic(tmp_path, monkeypatch, capsys):
    img_dir, ann = make_synth_coco(str(tmp_path), n_images=4)
    out_dir = tmp_path / "run"
    argv = [
        "train.py",
        "--model", "yolov10n",
        "--train-images", img_dir,
        "--train-ann", ann,
        "--val-images", img_dir,
        "--val-ann", ann,
        "--imgsz", "64",
        "--epochs", "1",
        "--batch-size", "2",
        "--max-boxes", "8",
        "--workers", "2",
        "--out-dir", str(out_dir),
    ]
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    monkeypatch.setattr(sys, "argv", argv)
    import importlib

    train_mod = importlib.import_module("train")
    train_mod.main()
    assert (out_dir / "ckpt.npz").exists()
    assert (out_dir / "epoch001.npz").exists()
    out = capsys.readouterr().out
    assert "mAP50-95" in out


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from leanyolo_tpu import get_model
    from leanyolo_tpu.models.registry import load_checkpoint_into, load_checkpoint_meta, save_checkpoint

    model = get_model("yolov10n", weights=None, class_names=["a", "b"], seed=3)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(model, path)
    meta = load_checkpoint_meta(path)
    assert meta["model_name"] == "yolov10n"
    assert meta["class_names"] == ["a", "b"]
    assert meta["leanyolo_version"]

    model2 = get_model("yolov10n", weights=None, class_names=["a", "b"], seed=9)
    before = np.asarray(model2.params["backbone"]["cv0"]["conv"]["w"]).copy()
    load_checkpoint_into(model2, path)
    after = np.asarray(model2.params["backbone"]["cv0"]["conv"]["w"])
    want = np.asarray(model.params["backbone"]["cv0"]["conv"]["w"])
    assert not np.allclose(before, after)
    np.testing.assert_array_equal(after, want)

    # get_model with a local path loads strictly
    model3 = get_model("yolov10n", weights=path, class_names=["a", "b"], seed=11)
    np.testing.assert_array_equal(np.asarray(model3.params["backbone"]["cv0"]["conv"]["w"]), want)


def test_checkpoint_strict_mismatch(tmp_path):
    from leanyolo_tpu import get_model
    from leanyolo_tpu.models.registry import save_checkpoint

    model = get_model("yolov10n", weights=None, class_names=["a", "b"])
    path = str(tmp_path / "ck.npz")
    save_checkpoint(model, path)
    with pytest.raises(ValueError):
        get_model("yolov10s", weights=path, class_names=["a", "b"])  # shape mismatch
    with pytest.raises(ValueError):
        get_model("yolov10n", weights=path, class_names=["a", "b", "c"])  # nc mismatch


def test_infer_cli_synthetic(tmp_path, monkeypatch, capsys):
    img_dir, _ = make_synth_coco(str(tmp_path), n_images=1)
    save_dir = tmp_path / "viz"
    argv = [
        "infer.py",
        "--source", img_dir,
        "--model", "yolov10n",
        "--weights", "none",
        "--imgsz", "64",
        "--decode", "nms",
        "--conf", "0.01",
        "--save-dir", str(save_dir),
        "--class-names", "a,b,c",
    ]
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    monkeypatch.setattr(sys, "argv", argv)
    import importlib

    infer_mod = importlib.import_module("infer")
    infer_mod.main()
    assert (save_dir / "img_0000.jpg").exists()
    assert "saved:" in capsys.readouterr().out

    # --preprocess device: same CLI contract, letterbox runs inside the
    # compiled program (round-2 verdict #7a).
    save_dev = tmp_path / "viz_dev"
    monkeypatch.setattr(sys, "argv", argv[:-4] + ["--save-dir", str(save_dev),
                                                  "--class-names", "a,b,c",
                                                  "--preprocess", "device"])
    infer_mod.main()
    assert (save_dev / "img_0000.jpg").exists()
    assert "saved:" in capsys.readouterr().out


import pytest


@pytest.mark.parametrize("preprocess", ["host", "device"])
def test_transfer_cli_viz_interval(tmp_path, monkeypatch, preprocess):
    """Single-process transfer run with --viz-interval: a snapshot per step,
    filtered at --viz-conf (its own knob — eval-conf stays at the mAP
    convention 0.001 while viz defaults to the reference's 0.25). Under
    --preprocess device the snapshot renders from the RAW first image via
    the predictor's full pipeline (letterboxed pixels stay on device)."""
    img_dir, ann = make_synth_coco(str(tmp_path), n_images=4)
    out_dir = tmp_path / "run"
    argv = [
        "transfer_learn.py",
        "--model", "yolov10n",
        "--weights", "none",
        "--train-images", img_dir,
        "--train-ann", ann,
        "--val-images", img_dir,
        "--val-ann", ann,
        "--imgsz", "64",
        "--epochs", "1",
        "--batch-size", "2",
        "--max-boxes", "8",
        "--workers", "2",
        "--no-amp",
        "--viz-interval", "1",
        "--viz-conf", "0.25",
        "--preprocess", preprocess,
        "--out-dir", str(out_dir),
    ]
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    monkeypatch.setattr(sys, "argv", argv)
    import importlib

    mod = importlib.import_module("transfer_learn")
    mod.main()
    assert (out_dir / "ckpt.npz").exists()
    viz = sorted((out_dir / "viz").glob("step*.jpg"))
    assert len(viz) == 2, f"expected one snapshot per step (2), got {[p.name for p in viz]}"


def test_measure_fps_chained_protocol():
    """measure_fps must return a finite positive rate from ONE chained jitted
    program (bench.py protocol — no per-iteration block_until_ready)."""
    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.engine.validator import measure_fps
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    model = YOLOv10.create("yolov10n", class_names=["a"], seed=0)
    pred = Predictor(model, imgsz=64, decode="topk", donate=False)
    fps = measure_fps(pred, batch_size=2, warmup=1, iters=3)
    assert np.isfinite(fps) and fps > 0


def test_dataloader_propagates_decode_errors(tmp_path):
    """A decode failure (missing/corrupt file) must raise in the CONSUMER,
    not kill the producer thread silently and hang the train loop on q.get."""
    from synth_coco import make_synth_coco

    from leanyolo_tpu.data.dataset import CocoDetection, DataLoader

    img_dir, ann = make_synth_coco(str(tmp_path), n_images=4)
    ds = CocoDetection(img_dir, ann, img_size=64)
    # Remove an image file AFTER indexing so only decode fails.
    victim = os.path.join(img_dir, sorted(os.listdir(img_dir))[2])
    os.remove(victim)
    loader = DataLoader(ds, batch_size=2, workers=2, shuffle=False)
    with pytest.raises(Exception) as ei:
        for _ in loader:
            pass
    assert not isinstance(ei.value, TimeoutError)


def test_dataloader_abandoned_iterator_does_not_leak_producer(tmp_path):
    """Breaking out of the batch loop early must let the producer exit (it
    would otherwise park forever on q.put with a full prefetch queue)."""
    import threading
    import time as _time

    from synth_coco import make_synth_coco

    from leanyolo_tpu.data.dataset import CocoDetection, DataLoader

    img_dir, ann = make_synth_coco(str(tmp_path), n_images=4)
    ds = CocoDetection(img_dir, ann, img_size=64)
    loader = DataLoader(ds, batch_size=1, workers=2, shuffle=False, prefetch=1)
    before = threading.active_count()
    for _ in loader:
        break  # abandon mid-epoch
    deadline = _time.time() + 10.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before, "producer thread leaked"


def test_checkpoint_transfer_lenient_load(tmp_path):
    """load_checkpoint_transfer fills every shape-matched leaf across a class-
    count change and keeps fresh init for the nc-dependent head leaves —
    the reference's COCO(80)->Aquarium(7) transfer-load semantics
    (reference tools/transfer_learn_aquarium.py:394-402 via registry.py:312-354)."""
    from leanyolo_tpu import get_model
    from leanyolo_tpu.models.registry import load_checkpoint_transfer, save_checkpoint

    src = get_model("yolov10n", weights=None, class_names=[f"c{i}" for i in range(6)], seed=3)
    path = str(tmp_path / "pre.npz")
    save_checkpoint(src, path)

    dst = get_model("yolov10n", weights=None, class_names=["x", "y", "z"], seed=9)
    fresh_head = np.asarray(
        dst.params["head"]["one2one_cv3"][0]["2"]["w"]
    ).copy()
    with pytest.warns(RuntimeWarning, match="Transfer load"):
        stats = load_checkpoint_transfer(dst, path)

    # Backbone transferred exactly.
    np.testing.assert_array_equal(
        np.asarray(dst.params["backbone"]["cv0"]["conv"]["w"]),
        np.asarray(src.params["backbone"]["cv0"]["conv"]["w"]),
    )
    # nc-dependent cls-branch leaves kept fresh init.
    np.testing.assert_array_equal(
        np.asarray(dst.params["head"]["one2one_cv3"][0]["2"]["w"]), fresh_head
    )
    assert stats["loaded"] > 0 and stats["skipped"], stats
    assert all("cv3" in k or "dfl" in k for k in stats["skipped"]), stats["skipped"]
