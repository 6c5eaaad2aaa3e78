"""QA-tool unit tests: SQA runner internals, prepare_aquarium positive path,
augmentation semantics.

Mirrors reference tiers that had no direct counterpart here yet:
test_sqa_runner.py (status inference, report rollup, --failed-missing),
test_prepare_aquarium.py (synthetic Kaggle zip -> split dirs with basename
rewrite), and the transfer trainer's augmentation contract
(transfer_learn_aquarium.py:326-353 ranges/box mirroring).
"""

import json
import os
import sys
import zipfile

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


# ------------------------------------------------------------- sqa_runner
def test_sqa_infer_status():
    from sqa_runner import infer_status

    assert infer_status("blah\nTEST STATUS: PASSED\n", 1) == "PASSED"
    assert infer_status("TEST STATUS: passed", 1) == "PASSED"
    # the LAST explicit marker wins
    assert infer_status("TEST STATUS: PASSED\nretry...\nTEST STATUS: FAILED", 0) == "FAILED"
    # pytest summary hint
    assert infer_status("== 2 failed, 3 passed ==", 0) == "FAILED"
    assert infer_status("== 5 passed ==", 0) == "PASSED"
    # exit-code fallback
    assert infer_status("no markers here", 0) == "PASSED"
    assert infer_status("no markers here", 2) == "FAILED"


def _write_plan(path, tests):
    import yaml

    plan = {"settings": {"workdir": str(path.parent), "env": {"SQA_MARK": "1"}}, "tests": tests}
    path.write_text(yaml.safe_dump(plan), encoding="utf-8")


def _run_sqa(argv, monkeypatch):
    import importlib

    monkeypatch.setattr(sys, "argv", argv)
    mod = importlib.import_module("sqa_runner")
    mod.main()


def test_sqa_runner_shell_report_and_failed_missing(monkeypatch, tmp_path):
    plan = tmp_path / "plan.yaml"
    out = tmp_path / "report"
    _write_plan(
        plan,
        [
            {"id": "T-OK", "name": "passes", "steps": ["test \"$SQA_MARK\" = 1"]},
            {"id": "T-BAD", "name": "fails", "steps": ["echo first step ok", "exit 3"]},
        ],
    )
    with pytest.raises(SystemExit):
        _run_sqa(["sqa_runner.py", "--plan", str(plan), "--out-dir", str(out)], monkeypatch)

    report = json.loads((out / "report.json").read_text())
    assert report["total"] == 2 and report["passed"] == 1 and report["failed"] == 1
    assert (out / "T-OK" / "status.txt").read_text().strip() == "PASSED"
    assert (out / "T-BAD" / "status.txt").read_text().strip() == "FAILED"
    # failing step's output and the failure marker are both preserved
    log = (out / "T-BAD" / "stdout.log").read_text()
    assert "first step ok" in log and "[step failed with exit 3]" in log
    assert "T-OK" in (out / "report.md").read_text()

    # --failed-missing: only T-BAD reruns (T-OK's artifacts stay untouched)
    ok_mtime = (out / "T-OK" / "meta.json").stat().st_mtime_ns
    _write_plan(
        plan,
        [
            {"id": "T-OK", "name": "passes", "steps": ["exit 1"]},  # would fail if rerun
            {"id": "T-BAD", "name": "fixed now", "steps": ["true"]},
        ],
    )
    _run_sqa(["sqa_runner.py", "--plan", str(plan), "--out-dir", str(out), "--failed-missing"], monkeypatch)
    assert (out / "T-BAD" / "status.txt").read_text().strip() == "PASSED"
    assert (out / "T-OK" / "status.txt").read_text().strip() == "PASSED"
    assert (out / "T-OK" / "meta.json").stat().st_mtime_ns == ok_mtime
    report = json.loads((out / "report.json").read_text())
    assert report["total"] == 1 and report["passed"] == 1


def test_sqa_ids_filter(monkeypatch, tmp_path):
    plan = tmp_path / "plan.yaml"
    out = tmp_path / "report"
    _write_plan(
        plan,
        [
            {"id": "A", "steps": ["true"]},
            {"id": "B", "steps": ["exit 1"]},
        ],
    )
    _run_sqa(["sqa_runner.py", "--plan", str(plan), "--out-dir", str(out), "--ids", "A"], monkeypatch)
    assert (out / "A" / "status.txt").exists() and not (out / "B").exists()


# -------------------------------------------------------- prepare_aquarium
def _fake_jpg(path):
    import cv2

    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), np.full((8, 8, 3), 127, np.uint8))


def _ann(images, n_cats=2):
    return {
        "images": [{"id": i, "file_name": fn, "height": 8, "width": 8} for i, fn in enumerate(images)],
        "annotations": [
            {"id": i, "image_id": i, "category_id": 1, "bbox": [1, 1, 4, 4], "area": 16, "iscrowd": 0}
            for i in range(len(images))
        ],
        "categories": [{"id": c + 1, "name": f"fish{c}"} for c in range(n_cats)],
    }


def test_prepare_aquarium_zip_end_to_end(monkeypatch, tmp_path):
    """Synthetic Kaggle-style archive: nested split dirs, 'valid' alias,
    file_name entries with subdir prefixes that must be basename-rewritten."""
    src = tmp_path / "Aquarium Combined"
    # train: file_name carries a bogus subdir prefix; the image actually
    # lives in a nested folder -> rglob fallback + basename rewrite.
    _fake_jpg(src / "train" / "images" / "a.jpg")
    _fake_jpg(src / "train" / "b.jpg")
    (src / "train" / "_annotations.coco.json").write_text(
        json.dumps(_ann(["stuff/a.jpg", "b.jpg"])), encoding="utf-8"
    )
    _fake_jpg(src / "validation" / "c.jpg")  # alias for 'valid'
    (src / "validation" / "_annotations.coco.json").write_text(json.dumps(_ann(["c.jpg"])), encoding="utf-8")

    zpath = tmp_path / "aquarium.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(src.rglob("*")):
            if p.is_file():
                z.write(p, p.relative_to(tmp_path))

    out = tmp_path / "out"
    import importlib

    monkeypatch.setattr(sys, "argv", ["prepare_aquarium.py", "--zip", str(zpath), "--out", str(out)])
    importlib.import_module("prepare_aquarium").main()

    for split, names in (("train", {"a.jpg", "b.jpg"}), ("valid", {"c.jpg"})):
        ann = json.loads((out / split / "_annotations.coco.json").read_text())
        assert {im["file_name"] for im in ann["images"]} == names  # basenames only
        for n in names:
            assert (out / split / n).exists()


def test_prepare_aquarium_missing_image_fails(monkeypatch, tmp_path):
    src = tmp_path / "root"
    _fake_jpg(src / "train" / "a.jpg")
    (src / "train" / "_annotations.coco.json").write_text(
        json.dumps(_ann(["a.jpg", "ghost.jpg"])), encoding="utf-8"
    )
    _fake_jpg(src / "valid" / "c.jpg")
    (src / "valid" / "_annotations.coco.json").write_text(json.dumps(_ann(["c.jpg"])), encoding="utf-8")
    import importlib

    monkeypatch.setattr(sys, "argv", ["prepare_aquarium.py", "--src", str(src), "--out", str(tmp_path / "o")])
    with pytest.raises(SystemExit, match="missing"):
        importlib.import_module("prepare_aquarium").main()


# ------------------------------------------------------------ augmentation
def test_augment_semantics():
    """Forced-decision checks of the reference augmentation contract
    (transfer_learn_aquarium.py:326-353): hflip mirrors boxes in letterbox
    space; brightness/contrast is clip(alpha*x + beta, 0, 255) with
    alpha in [0.8, 1.2], beta in [-16, 16]."""
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.engine.trainer import augment_batch

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 16, 16, 3), np.uint8))
    boxes = jnp.asarray(np.array([[[2.0, 3.0, 10.0, 12.0]]] * 4, np.float32))

    # flip always, jitter never
    out, b = augment_batch(jax.random.PRNGKey(0), imgs, boxes, p_hflip=1.0, p_bc=0.0, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs)[:, :, ::-1, :].astype(np.float32))
    np.testing.assert_allclose(np.asarray(b), [[[16 - 10.0, 3.0, 16 - 2.0, 12.0]]] * 4)
    assert np.all(np.asarray(b)[..., 2] >= np.asarray(b)[..., 0])

    # jitter always, flip never: bounds + formula inversion
    for seed in range(4):
        out, b2 = augment_batch(jax.random.PRNGKey(seed), imgs, boxes, p_hflip=0.0, p_bc=1.0, dtype=jnp.float32)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 255.0
        np.testing.assert_array_equal(np.asarray(b2), np.asarray(boxes))  # boxes untouched
        # recover alpha/beta per image from two unclipped pixels; both must
        # land in the reference ranges
        x = np.asarray(imgs, np.float64)
        for i in range(4):
            interior = (o[i] > 0.5) & (o[i] < 254.5)
            xi, oi = x[i][interior], o[i][interior]
            a_fit, b_fit = np.polyfit(xi, oi, 1)
            assert 0.8 - 1e-3 <= a_fit <= 1.2 + 1e-3, a_fit
            assert -16 - 1e-2 <= b_fit <= 16 + 1e-2, b_fit


# ---------------------------------------------------------- compile cache
def test_compile_cache_host_scoping(monkeypatch, tmp_path):
    """The persistent cache must be scoped by the host fingerprint: axon AOT
    artifacts loaded across a host change execute with wrong numerics (the
    QT-001 2026-08-19 incident), so a changed fingerprint must change the
    directory, and an already-configured cache (the test suite's) must win."""
    from leanyolo_tpu.utils import compile_cache as cc

    fp = cc.host_fingerprint()
    assert len(fp) == 16 and int(fp, 16) >= 0
    assert cc.host_fingerprint() == fp  # stable within a host

    # Already configured (by conftest) -> no-op.
    assert cc.enable_persistent_compile_cache(str(tmp_path / "x")) is None

    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        d = cc.enable_persistent_compile_cache(str(tmp_path / "base"))
        assert d == str(tmp_path / "base" / fp)
        import os

        assert os.path.isdir(d)
        # disabled via env
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv(cc.ENV_VAR, "0")
        assert cc.enable_persistent_compile_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_sqa_per_test_env_override(monkeypatch, tmp_path):
    """A test's own env block overrides the plan env; an EMPTY value UNSETS
    the variable (how QT-001 escapes the plan-wide CPU pin)."""
    import yaml

    plan = tmp_path / "plan.yaml"
    out = tmp_path / "report"
    plan.write_text(
        yaml.safe_dump(
            {
                "settings": {"workdir": str(tmp_path), "env": {"PINNED": "cpu", "KEEP": "yes"}},
                "tests": [
                    {"id": "PLAN-ENV", "steps": ['test "$PINNED" = cpu && test "$KEEP" = yes']},
                    {
                        "id": "OVERRIDE",
                        "env": {"PINNED": "", "EXTRA": "1"},
                        "steps": ['test -z "$PINNED" && test "$KEEP" = yes && test "$EXTRA" = 1'],
                    },
                ],
            }
        ),
        encoding="utf-8",
    )
    _run_sqa(["sqa_runner.py", "--plan", str(plan), "--out-dir", str(out)], monkeypatch)
    assert (out / "PLAN-ENV" / "status.txt").read_text().strip() == "PASSED"
    assert (out / "OVERRIDE" / "status.txt").read_text().strip() == "PASSED"


def test_sqa_plan_lint():
    """The tracked sqa.yaml stays well-formed: unique ids, non-empty steps,
    an expected line per test, and every `python tools/X.py` it references
    exists (guards matrix edits against typos)."""
    import re

    import yaml

    root = os.path.join(os.path.dirname(__file__), "..")
    plan = yaml.safe_load(open(os.path.join(root, "sqa.yaml"), encoding="utf-8"))
    tests = plan["tests"]
    ids = [t["id"] for t in tests]
    assert len(ids) == len(set(ids)), "duplicate test ids"
    assert len(ids) >= 20  # the matrix only grows
    for t in tests:
        assert t.get("steps"), f"{t['id']}: no steps"
        assert t.get("expected"), f"{t['id']}: no expected line"
        for step in t["steps"]:
            for m in re.finditer(r"tools/(\w+)\.py", step):
                path = os.path.join(root, "tools", m.group(1) + ".py")
                assert os.path.exists(path), f"{t['id']}: missing {path}"
        for k, v in (t.get("env") or {}).items():
            assert isinstance(k, str) and v is not None, f"{t['id']}: bad env entry {k!r}"


# ------------------------------------------------------- convergence_gate


def _hist(losses):
    return [{"epoch": i + 1, "loss_total": v} for i, v in enumerate(losses)]


def test_convergence_gate_two_arms():
    """Loss arm is backend-insensitive; mAP arm enforces only on the chip.
    Thresholds are calibrated on the matched CPU/chip 30-epoch runs
    (reports/convergence-r3-backends.md: ratios 0.030 / 0.021)."""
    from convergence_gate import evaluate

    healthy = _hist([750.0 * (0.88 ** i) for i in range(30)])

    # Healthy curve + good mAP passes everywhere.
    for backend in ("cpu", "tpu", "axon"):
        _, fails = evaluate(healthy, 0.5, backend=backend)
        assert fails == [], (backend, fails)

    # Chip-level mAP miss: fails on chip backends, informational on CPU
    # (the 2026-08-19 incident scenario: CPU lands at 0.077).
    _, fails = evaluate(healthy, 0.077, backend="axon")
    assert len(fails) == 1 and "mAP50" in fails[0]
    _, fails = evaluate(healthy, 0.077, backend="cpu")
    assert fails == []

    # Flat curve fails the loss arm on every backend, even with great mAP.
    flat = _hist([100.0 - 0.01 * i for i in range(30)])
    _, fails = evaluate(flat, 0.9, backend="cpu")
    assert any("did not learn" in f for f in fails)

    # Noisy non-descending curve fails the monotonicity check.
    noisy = _hist([100.0, 5.0] + [5.0 + (i % 2) for i in range(28)])
    _, fails = evaluate(noisy, None, backend="cpu")
    assert any("not descending" in f for f in fails)


def test_convergence_gate_cli(tmp_path):
    from convergence_gate import main as gate_main

    hist = tmp_path / "history.jsonl"
    hist.write_text("".join(json.dumps(r) + "\n" for r in _hist([750.0 * (0.75 ** i) for i in range(12)])))
    csvp = tmp_path / "val.csv"
    csvp.write_text("map_50,map_75\n0.42,0.3\n")
    assert gate_main(["--history", str(hist), "--val-csv", str(csvp), "--backend", "tpu"]) == 0
    assert gate_main(["--history", str(hist), "--val-csv", str(csvp), "--backend", "tpu", "--map50-min", "0.6"]) == 1
    hist.write_text("".join(json.dumps(r) + "\n" for r in _hist([100.0, 99.0, 98.5, 98.4, 98.4])))
    assert gate_main(["--history", str(hist), "--backend", "cpu"]) == 1
