"""Rehearse the ONE-COMMAND weights-day gate (tools/weights_day.py) offline.

test_official_fulldress.py proves each production stage individually; this
suite proves the ORCHESTRATION: run_weights_day() chains download -> SHA ->
remap -> (fidelity) -> COCO val -> mAP gate -> report artifact over the
local HTTP weight fake and a synthetic COCO val set, so on the real weights
day the single command has already been executed end to end.

Reference protocol being orchestrated: tools/check_map_parity.py:35 +
README.md:154-159 (the published parity table) + the captured-tensor
fidelity rubric (leanyolo/tests/fidelity/rubric.py:28-45).
"""

import json
import os
import sys
from pathlib import Path

import pytest

from conftest import reference_available

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


@pytest.fixture()
def served_yolov10n(tmp_path, monkeypatch):
    """Official-format fused yolov10n over the HTTP fake; returns its oracle."""
    from test_official_fulldress import (
        _emit_official_ckpt,
        _fuse_repvggdw_keys,
        _http_server_ctx,
        _official_sd_from_reference,
        _patch_registry,
    )
    from test_parity_reference import _build_reference_model

    ref = _build_reference_model("yolov10n", seed=11)
    sd, _ = _fuse_repvggdw_keys(_official_sd_from_reference(ref))
    with _http_server_ctx(tmp_path) as (serve_dir, url):
        sha = _emit_official_ckpt(sd, serve_dir / "yolov10n.pt")
        _patch_registry(monkeypatch, tmp_path, "yolov10n", f"{url}/yolov10n.pt", sha)
        yield ref


def test_weights_day_end_to_end(served_yolov10n, tmp_path):
    """The drill runs download->...->val->gate->report in one call; the gate
    fires correctly in both directions on the same measured mAP."""
    import weights_day
    from synth_coco import make_synth_coco

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=4, n_classes=80)
    out = tmp_path / "report"
    report = weights_day.run_weights_day(
        ["yolov10n"], images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=2,
        tolerance=1.0, check_captured=False, out_dir=str(out),
    )
    assert report["ok"], report
    row = report["variants"]["yolov10n"]
    assert row["stages"]["download_remap_load"]["ok"]
    assert row["stages"]["coco_val"]["ok"]
    assert 0.0 <= row["map_50_95"] <= 1.0 and row["gate_ok"]

    on_disk = json.loads((out / "weights_day.json").read_text())
    assert on_disk["variants"]["yolov10n"]["map_50_95"] == row["map_50_95"]
    md = (out / "weights_day.md").read_text()
    assert "PASS" in md and "yolov10n" in md

    # Same pipeline, gate centered exactly on the measured value -> PASS;
    # centered far away -> FAIL (proves the delta gate, not just plumbing).
    ok = weights_day.run_weights_day(
        ["yolov10n"], images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=2,
        tolerance=0.005, official_map={"yolov10n": row["map_50_95"]},
        check_captured=False, out_dir=str(tmp_path / "r2"),
    )
    assert ok["ok"] and ok["variants"]["yolov10n"]["gate_ok"]
    bad = weights_day.run_weights_day(
        ["yolov10n"], images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=2,
        tolerance=0.005, official_map={"yolov10n": row["map_50_95"] + 0.5},
        check_captured=False, out_dir=str(tmp_path / "r3"),
    )
    assert not bad["ok"] and not bad["variants"]["yolov10n"]["gate_ok"]
    assert "FAIL" in (tmp_path / "r3" / "weights_day.md").read_text()


def test_captured_fidelity_detects_wrong_weights(served_yolov10n):
    """The fidelity stage must FAIL when the loaded weights are not the
    official ones (here: seeded-random fulldress weights vs the frozen
    official captures) — the negative that proves the rubric has teeth."""
    import weights_day

    refs = os.path.join(weights_day.REFERENCE_ROOT, "leanyolo", "tests", "data", "refs", "yolov10n")
    if not os.path.isdir(refs):
        pytest.skip("captured refs not mounted")
    from leanyolo_tpu import get_model

    model = get_model("yolov10n", weights="PRETRAINED_COCO",
                      class_names=[f"c{i}" for i in range(80)],
                      input_norm_subtract=[0.0], input_norm_divide=[1.0])
    fid = weights_day.captured_fidelity("yolov10n", model)
    assert not fid["skipped"]
    assert not fid["ok"]
    assert any(isinstance(v, float) and v > weights_day.RUBRIC["max_abs"]
               for v in fid["components"].values()), fid


def test_captured_fidelity_skips_without_refs(served_yolov10n, monkeypatch, tmp_path):
    import weights_day

    from leanyolo_tpu import get_model

    model = get_model("yolov10n", weights="PRETRAINED_COCO",
                      class_names=[f"c{i}" for i in range(80)])
    monkeypatch.setattr(weights_day, "REFERENCE_ROOT", str(tmp_path / "nowhere"))
    fid = weights_day.captured_fidelity("yolov10n", model)
    assert fid["skipped"] and fid["ok"]
