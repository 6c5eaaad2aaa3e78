"""Negative + positive tests of the perf regression comparator
(tools/bench_regression.py), round-2 verdict next-step #3: the gate itself
must be proven to fail on an intentional regression, or it guards nothing.

Pure-JSON tests — no device work; the real measurements come from
tools/bench_matrix.py in sqa.yaml PT-001.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from bench_regression import compare, main  # noqa: E402


def _matrix(**ips):
    return {"imgsz": 640, "cells": {
        name: {"images_per_sec_per_chip": v, "batch_size": 128, "per_bs": {"128": v}}
        for name, v in ips.items()
    }}


BASE = _matrix(**{"yolov10s/infer": 3565.66, "yolov10s/train": 603.62})


def test_within_threshold_passes():
    cur = _matrix(**{"yolov10s/infer": 3400.0, "yolov10s/train": 600.0})  # -4.6%, -0.6%
    rows, failures = compare(BASE, cur, 0.05)
    assert failures == []
    assert all(r["status"] == "ok" for r in rows)


def test_intentional_regression_fails():
    cur = _matrix(**{"yolov10s/infer": 3200.0, "yolov10s/train": 603.62})  # -10.3%
    rows, failures = compare(BASE, cur, 0.05)
    assert len(failures) == 1 and "yolov10s/infer" in failures[0]
    assert [r["status"] for r in rows] == ["REGRESSION", "ok"]


def test_missing_cell_fails():
    cur = _matrix(**{"yolov10s/infer": 3600.0})
    _, failures = compare(BASE, cur, 0.05)
    assert any("yolov10s/train" in f and "missing" in f for f in failures)


def test_cells_subset_narrows_comparison():
    cur = _matrix(**{"yolov10s/infer": 3600.0})
    _, failures = compare(BASE, cur, 0.05, cells=["yolov10s/infer"])
    assert failures == []


def test_improvement_is_not_a_failure():
    cur = _matrix(**{"yolov10s/infer": 4200.0, "yolov10s/train": 700.0})
    _, failures = compare(BASE, cur, 0.05)
    assert failures == []


def test_cli_exit_codes(tmp_path, capsys):
    b = tmp_path / "base.json"
    b.write_text(json.dumps(BASE), encoding="utf-8")
    good = tmp_path / "good.json"
    good.write_text(json.dumps(_matrix(**{"yolov10s/infer": 3565.0, "yolov10s/train": 604.0})),
                    encoding="utf-8")
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(_matrix(**{"yolov10s/infer": 3000.0, "yolov10s/train": 604.0})),
                   encoding="utf-8")

    assert main(["--baseline", str(b), "--current", str(good)]) == 0
    assert "perf gate PASSED" in capsys.readouterr().out
    assert main(["--baseline", str(b), "--current", str(bad)]) == 1
    assert "PERF REGRESSION GATE FAILED" in capsys.readouterr().out


def test_tracked_baseline_compares_clean_against_itself():
    """The committed baseline must stay loadable and self-consistent (the
    PT-001 gate compares fresh runs against exactly this file)."""
    path = REPO / "reports" / "bench_matrix_r3.json"
    base = json.loads(path.read_text(encoding="utf-8"))
    rows, failures = compare(base, base, 0.05)
    assert failures == [] and len(rows) == 12


def test_r3_baseline_within_gate_of_r2():
    """Continuity check across rounds: the refreshed r3 baseline must itself
    pass the 5% gate against the retained r2 baseline — a baseline refresh
    must never be a vehicle for sneaking in a regression."""
    r2 = json.loads((REPO / "reports" / "bench_matrix_r2final.json").read_text(encoding="utf-8"))
    r3 = json.loads((REPO / "reports" / "bench_matrix_r3.json").read_text(encoding="utf-8"))
    rows, failures = compare(r2, r3, 0.05)
    assert failures == [] and len(rows) == 12


def test_r4_baseline_within_gate_of_r3():
    """Same continuity for the round-4 refresh: every r3 cell must be met or
    beaten (within gate) by r4 — the refresh carries +26% on m and +5% on x,
    plus six NEW class-wise-NMS cells that r3 had no baseline for (they are
    gated from r4 onward)."""
    r3 = json.loads((REPO / "reports" / "bench_matrix_r3.json").read_text(encoding="utf-8"))
    r4 = json.loads((REPO / "reports" / "bench_matrix_r4.json").read_text(encoding="utf-8"))
    rows, failures = compare(r3, r4, 0.05)
    assert failures == [] and len(rows) == 12
    nms_cells = [k for k in r4["cells"] if k.endswith("/nms")]
    assert len(nms_cells) == 6


def test_r5_baseline_within_gate_of_r4():
    """Round-5 refresh continuity: every r4 cell met or beaten (within gate)
    by r5 — the refresh carries the full-128-lane-tile re-sweep (+30% on
    yolov10x infer/nms at bs128, +17.6% on yolov10m train at bs128; PERF.md
    round-5 late section); b/l/x train pins are unchanged (bs128 is
    compile-infra-blocked for b/l and a measured regression for x)."""
    r4 = json.loads((REPO / "reports" / "bench_matrix_r4.json").read_text(encoding="utf-8"))
    r5 = json.loads((REPO / "reports" / "bench_matrix_r5.json").read_text(encoding="utf-8"))
    rows, failures = compare(r4, r5, 0.05)
    assert failures == [] and len(rows) == 18
    assert r5["cells"]["yolov10x/infer"]["batch_size"] == 128
    assert r5["cells"]["yolov10m/train"]["batch_size"] == 128


def test_r5_multisize_baseline_loads_and_self_compares():
    """Round-5 multi-size cells (s/x at 320/960/1280, topk + class-wise NMS,
    best measured batch size — s cells pinned at bs128 per the sub-128-batch
    emitter-flip root cause, PERF.md round 5). PT-002 spot-checks live cells
    against exactly this file."""
    path = REPO / "reports" / "bench_matrix_r5_sizes.json"
    base = json.loads(path.read_text(encoding="utf-8"))
    rows, failures = compare(base, base, 0.05)
    assert failures == [] and len(rows) == 12
    assert {k.split("@")[0] for k in base["cells"]} == {"yolov10s", "yolov10x"}
    assert {k.split("@")[1].split("/")[0] for k in base["cells"]} == {"320", "960", "1280"}
    # The root-cause pin: every yolov10s multi-size cell runs at bs128.
    for k, cell in base["cells"].items():
        if k.startswith("yolov10s"):
            assert cell["batch_size"] == 128, k
