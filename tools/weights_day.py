#!/usr/bin/env python
"""Weights-day one-command gate: download -> SHA-256 -> remap -> captured-
tensor fidelity -> full COCO val -> mAP-delta gate, for all six variants,
written into ONE report.

Counterpart of the reference's weights-day protocol — the README parity
table (reference README.md:154-159) produced by tools/check_map_parity.py:35
plus the captured-tensor fidelity harness
(reference leanyolo/tests/fidelity/generate_references.py:80-152,
rubric.py:28-45) — chained so the whole drill is one command when the
network/weights finally exist:

    python tools/weights_day.py --data-root datasets/coco --out runs/weights_day

Every stage that can run offline is rehearsed offline: the SQA tier drives
run_weights_day() end-to-end against the local HTTP weight fake + synthetic
COCO val (tests/test_weights_day_rehearsal.py), so the only risk left for
the real day is the URL/SHA table itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REFERENCE_ROOT = os.environ.get("LEANYOLO_REFERENCE_ROOT", "/root/reference")
ALL_VARIANTS = ("yolov10n", "yolov10s", "yolov10m", "yolov10b", "yolov10l", "yolov10x")

# Official THU-MIG COCO val2017 mAP50-95 (reference README.md:154-159).
OFFICIAL_MAP = {
    "yolov10n": 0.38480,
    "yolov10s": 0.45866,
    "yolov10m": 0.50999,
    "yolov10b": 0.52303,
    "yolov10l": 0.53018,
    "yolov10x": 0.54231,
}

RUBRIC = {"rtol": 1e-4, "atol": 1e-4, "max_abs": 5e-4}  # reference rubric.py:28-45


def captured_fidelity(variant: str, model) -> dict:
    """Compare OUR model under the loaded weights against the FROZEN official
    captures (reference leanyolo/tests/data/refs/<variant>/), rubric-gated.

    Returns {"ok": bool, "components": {name: max_abs}, ...}; raises only on
    unexpected errors (missing refs -> skipped=True).
    """
    refs_dir = os.path.join(REFERENCE_ROOT, "leanyolo", "tests", "data", "refs", variant)
    names = (
        "backbone_c3", "backbone_c4", "backbone_c5",
        "neck_p3", "neck_p4", "neck_p5", "head_p3", "head_p4", "head_p5",
    )
    if not all(os.path.exists(os.path.join(refs_dir, f"{n}.pt")) for n in ("input",) + names):
        return {"ok": True, "skipped": True, "reason": f"no captured refs under {refs_dir}"}

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from leanyolo_tpu.models.yolov10.model import backbone_apply, head_apply, neck_apply

    load = lambda n: torch.load(os.path.join(refs_dir, f"{n}.pt"), map_location="cpu", weights_only=True)
    x = load("input").numpy()  # [1, 3, H, W], already normalized as captured
    cfg = model.cfg

    @jax.jit
    def fwd(p, xx):
        hp = jax.lax.Precision.HIGHEST
        c3, c4, c5 = backbone_apply(p["backbone"], xx, cfg, precision=hp)
        p3, p4, p5 = neck_apply(p["neck"], c3, c4, c5, cfg, precision=hp)
        return (c3, c4, c5), (p3, p4, p5), head_apply(p["head"], (p3, p4, p5), branch="one2many", precision=hp)

    (c3, c4, c5), (p3, p4, p5), head = fwd(model.params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = [c3, c4, c5, p3, p4, p5, *head]
    comps, ok = {}, True
    for name, got in zip(names, ours):
        want = load(name).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(got, np.float32)
        if got.shape != want.shape:
            comps[name] = f"shape {got.shape} != {want.shape}"
            ok = False
            continue
        max_abs = float(np.abs(got - want).max())
        comps[name] = max_abs
        if not (np.allclose(got, want, rtol=RUBRIC["rtol"], atol=RUBRIC["atol"]) and max_abs <= RUBRIC["max_abs"]):
            ok = False
    return {"ok": ok, "skipped": False, "rubric": RUBRIC, "components": comps}


def run_weights_day(
    variants=ALL_VARIANTS,
    *,
    images_dir: str,
    ann_json: str,
    imgsz: int = 640,
    batch_size: int = 16,
    max_images=None,
    tolerance: float = 0.01,
    official_map=None,
    check_captured: bool = True,
    out_dir: str = "runs/weights_day",
) -> dict:
    """Run the full weights-day drill; returns the report dict (also written
    to <out_dir>/weights_day.{json,md}). report["ok"] is the overall gate."""
    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco

    official_map = {**OFFICIAL_MAP, **(official_map or {})}
    with open(ann_json, "r", encoding="utf-8") as f:
        cats = json.load(f)["categories"]
    class_names = [c["name"] for c in sorted(cats, key=lambda c: c["id"])]

    report = {"imgsz": imgsz, "tolerance": tolerance, "variants": {}, "ok": True}
    for name in variants:
        row: dict = {"stages": {}}
        report["variants"][name] = row
        t0 = time.time()
        try:
            # download -> SHA-256 -> stub-unpickle -> keymap remap -> strict load
            # (reference production path: leanyolo/models/registry.py:312-354).
            model = get_model(name, weights="PRETRAINED_COCO", class_names=class_names)
            row["stages"]["download_remap_load"] = {"ok": True, "s": round(time.time() - t0, 1)}
        except Exception as e:
            row["stages"]["download_remap_load"] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            report["ok"] = False
            continue

        if check_captured:
            try:
                fid = captured_fidelity(name, model)
            except Exception as e:  # unexpected harness failure, not a fidelity miss
                fid = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            row["stages"]["captured_fidelity"] = fid
            if not fid["ok"]:
                report["ok"] = False

        t0 = time.time()
        os.makedirs(out_dir, exist_ok=True)
        det_path = os.path.join(out_dir, f"{name}_detections.json")
        try:
            stats = validate_coco(
                model, images_dir=images_dir, ann_json=ann_json, imgsz=imgsz,
                batch_size=batch_size, decode="topk", conf_thresh=0.001,
                iou_thresh=0.65, max_images=max_images, save_detections=det_path,
            )
        except Exception as e:
            row["stages"]["coco_val"] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            report["ok"] = False
            continue

        # External-oracle cross-check: if pycocotools exists in THIS
        # environment (it cannot in the offline build env), score the same
        # detections with the real COCOeval and gate on exact protocol
        # agreement with the self-authored evaluator.
        from leanyolo_tpu.engine.validator import _load_gt
        from leanyolo_tpu.utils.coco_eval import pycocotools_stats

        with open(det_path, "r", encoding="utf-8") as f:
            det_dicts = json.load(f)
        py = pycocotools_stats(_load_gt(ann_json, max_images), det_dicts)
        if py is None:
            row["stages"]["pycocotools_crosscheck"] = {"skipped": True, "reason": "pycocotools not installed"}
        else:
            delta = abs(py["map_50_95"] - stats["map_50_95"])
            ok = delta <= 1e-6
            row["stages"]["pycocotools_crosscheck"] = {
                "ok": ok, "map_50_95_pycocotools": round(py["map_50_95"], 6), "delta": delta,
            }
            if not ok:
                report["ok"] = False
        official = official_map[name]
        diff = abs(stats["map_50_95"] - official)
        gate_ok = diff <= tolerance
        row["stages"]["coco_val"] = {"ok": True, "s": round(time.time() - t0, 1)}
        row["map_50_95"] = round(stats["map_50_95"], 5)
        row["map_50"] = round(stats.get("map_50", float("nan")), 5)
        row["official"] = official
        row["diff"] = round(diff, 5)
        row["gate_ok"] = gate_ok
        if not gate_ok:
            report["ok"] = False
        print(f"{name}: ours={row['map_50_95']} official={official} diff={row['diff']} "
              f"{'OK' if gate_ok else 'FAIL'}", flush=True)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "weights_day.json"), "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    lines = [
        "# Weights day report", "",
        f"Overall: {'PASS' if report['ok'] else 'FAIL'} (tolerance {tolerance})", "",
        "| Variant | mAP50-95 (ours) | official | diff | fidelity | gate |",
        "|---|---|---|---|---|---|",
    ]
    for name, row in report["variants"].items():
        fid = row.get("stages", {}).get("captured_fidelity", {})
        fid_s = "skip" if fid.get("skipped") else ("ok" if fid.get("ok") else ("FAIL" if fid else "-"))
        lines.append(
            f"| {name} | {row.get('map_50_95', '-')} | {row.get('official', '-')} | "
            f"{row.get('diff', '-')} | {fid_s} | "
            f"{'OK' if row.get('gate_ok') else ('FAIL' if 'gate_ok' in row else 'ERROR')} |"
        )
    with open(os.path.join(out_dir, "weights_day.md"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_dir}/weights_day.{{json,md}}", flush=True)
    return report


def main() -> None:
    p = argparse.ArgumentParser(description="one-command weights-day gate")
    p.add_argument("--variants", default=",".join(ALL_VARIANTS))
    p.add_argument("--data-root", default="datasets/coco")
    p.add_argument("--images-dir", default=None)
    p.add_argument("--ann-json", default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--tolerance", type=float, default=0.01)
    p.add_argument("--no-captured-fidelity", action="store_true",
                   help="skip the frozen-captures fidelity stage")
    p.add_argument("--out", default="runs/weights_day")
    args = p.parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    if args.images_dir and args.ann_json:
        images_dir, ann_json = args.images_dir, args.ann_json
    else:
        from leanyolo_tpu.data.coco import ensure_coco_val

        images_dir, ann_json = ensure_coco_val(args.data_root)

    report = run_weights_day(
        [v.strip() for v in args.variants.split(",") if v.strip()],
        images_dir=images_dir, ann_json=ann_json, imgsz=args.imgsz,
        batch_size=args.batch_size, max_images=args.max_images,
        tolerance=args.tolerance, check_captured=not args.no_captured_fidelity,
        out_dir=args.out,
    )
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
