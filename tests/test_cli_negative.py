"""Negative CLI tests: bad args and paths fail fast with clear errors.

Mirrors the reference negative tier (reference: leanyolo/tests/
test_tools_train_cli_negative.py:35-131).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _run(mod_name, argv, monkeypatch):
    import importlib

    monkeypatch.setattr(sys, "argv", argv)
    mod = importlib.import_module(mod_name)
    mod.main()


def test_infer_unknown_model(monkeypatch, tmp_path):
    with pytest.raises(ValueError, match="Unknown model"):
        _run("infer", ["infer.py", "--source", str(tmp_path), "--model", "yolov11", "--weights", "none"], monkeypatch)


def test_infer_missing_source(monkeypatch):
    with pytest.raises(FileNotFoundError):
        _run("infer", ["infer.py", "--source", "/nope/missing", "--model", "yolov10n", "--weights", "none"], monkeypatch)


def test_infer_bad_imgsz(monkeypatch, tmp_path):
    import numpy as np
    import cv2

    img = tmp_path / "x.jpg"
    cv2.imwrite(str(img), np.zeros((32, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="divisible by 32"):
        _run("infer", ["infer.py", "--source", str(img), "--model", "yolov10n", "--weights", "none", "--imgsz", "50"], monkeypatch)


def test_train_missing_ann(monkeypatch, tmp_path):
    with pytest.raises(FileNotFoundError):
        _run(
            "train",
            ["train.py", "--train-images", str(tmp_path), "--train-ann", str(tmp_path / "missing.json"), "--epochs", "1"],
            monkeypatch,
        )


def test_val_bad_weights_path(monkeypatch, tmp_path):
    (tmp_path / "bad.npz").write_bytes(b"not a real npz")
    import json

    ann = {"images": [], "annotations": [], "categories": [{"id": 1, "name": "a"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    with pytest.raises((ValueError, Exception)):
        _run(
            "val",
            [
                "val.py", "--model", "yolov10n", "--weights", str(tmp_path / "bad.npz"),
                "--images-dir", str(tmp_path), "--ann-json", str(ann_path), "--imgsz", "64",
            ],
            monkeypatch,
        )


def test_sqa_runner_agent_mode_requires_cmd(monkeypatch, tmp_path):
    plan = tmp_path / "plan.yaml"
    plan.write_text("tests:\n  - id: T1\n    name: t\n    steps: ['true']\n")
    with pytest.raises(SystemExit, match="agent-cmd"):
        _run("sqa_runner", ["sqa_runner.py", "--plan", str(plan), "--mode", "agent", "--out-dir", str(tmp_path / "o")], monkeypatch)


def test_val_data_parallel_batch_mismatch(monkeypatch, tmp_path):
    import json

    ann = {"images": [], "annotations": [], "categories": [{"id": 1, "name": "a"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    with pytest.raises(SystemExit, match="divisible"):
        _run(
            "val",
            [
                "val.py", "--model", "yolov10n", "--weights", "none",
                "--images-dir", str(tmp_path), "--ann-json", str(ann_path),
                "--imgsz", "64", "--batch-size", "3", "--data-parallel", "2",
            ],
            monkeypatch,
        )


def test_val_viz_with_device_preprocess_renders_originals(monkeypatch, tmp_path):
    """Round 2 REFUSED viz under device preprocessing (letterboxed pixels
    stay on device); round 3 lifted it — viz renders on the ORIGINAL images
    with unletterboxed boxes. This was a negative test; now it asserts the
    positive contract: the run succeeds and writes one viz file per image."""
    import json

    import cv2
    import numpy as np

    (tmp_path / "x.jpg").parent.mkdir(exist_ok=True, parents=True)
    cv2.imwrite(str(tmp_path / "x.jpg"), np.random.RandomState(0).randint(0, 255, (32, 48, 3)).astype(np.uint8))
    ann = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 48, "height": 32}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [4, 4, 16, 12], "area": 192, "iscrowd": 0}
        ],
        "categories": [{"id": 1, "name": "a"}],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    viz_dir = tmp_path / "viz"
    _run(
        "val",
        [
            "val.py", "--model", "yolov10n", "--weights", "none",
            "--images-dir", str(tmp_path), "--ann-json", str(ann_path),
            "--imgsz", "64", "--preprocess", "device", "--viz-dir", str(viz_dir),
        ],
        monkeypatch,
    )
    out = list(viz_dir.glob("*.jpg")) + list(viz_dir.glob("*.png"))
    assert len(out) == 1, f"expected one viz image, got {out}"


def test_train_resume_without_state(monkeypatch, tmp_path):
    import json

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    ann = {"images": [], "annotations": [], "categories": [{"id": 1, "name": "a"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    with pytest.raises(SystemExit, match="resume"):
        _run(
            "train",
            [
                "train.py", "--train-images", str(img_dir), "--train-ann", str(ann_path),
                "--epochs", "1", "--out-dir", str(tmp_path / "out"), "--resume", "--imgsz", "64",
            ],
            monkeypatch,
        )


def test_export_bad_decode_choice(monkeypatch):
    with pytest.raises(SystemExit):
        _run(
            "export_serving",
            ["export_serving.py", "--model", "yolov10n", "--weights", "none", "--decode", "bogus"],
            monkeypatch,
        )


def test_convert_missing_local_pt(monkeypatch, tmp_path):
    with pytest.raises((FileNotFoundError, Exception)):
        _run(
            "convert_official_weights",
            ["convert_official_weights.py", "--model", "yolov10n", "--local-pt", str(tmp_path / "nope.pt")],
            monkeypatch,
        )


def test_prepare_aquarium_requires_source(monkeypatch, tmp_path):
    with pytest.raises(SystemExit, match="--zip or --src"):
        _run("prepare_aquarium", ["prepare_aquarium.py", "--out", str(tmp_path / "o")], monkeypatch)


def test_prepare_aquarium_missing_split(monkeypatch, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    with pytest.raises(FileNotFoundError, match="train"):
        _run(
            "prepare_aquarium",
            ["prepare_aquarium.py", "--src", str(src), "--out", str(tmp_path / "o")],
            monkeypatch,
        )
