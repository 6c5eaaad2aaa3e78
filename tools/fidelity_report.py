#!/usr/bin/env python
"""Per-component fidelity report: JAX model vs the torch reference oracle.

Counterpart of the reference fidelity harness (reference: leanyolo/tests/
fidelity/common.py, rubric.py, run_and_report.py): builds each variant in
BOTH implementations with identical weights, compares backbone C3-C5, neck
P3-P5, and head P3-P5 tensors on the seed-0 input, and writes a JSON report
per model plus a consolidated summary.

Without official checkpoints (offline), weights come from the torch model's
seeded random init, pushed through our converter — which checks the same
property (identical math given identical parameters). With
LEANYOLO_WEIGHTS_DIR set, pass --weights PRETRAINED_COCO to compare under
official weights instead.

Usage:
    python tools/fidelity_report.py --models yolov10n,yolov10s --out tests/reports
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

RUBRIC = {"rtol": 1e-4, "atol": 1e-4, "max_abs": 5e-4}  # reference rubric.py:28-31


def run_model(name: str, weights: str, reference_root: str, imgsz: int):
    import numpy as np

    sys.path.insert(0, reference_root)
    import torch

    from leanyolo.models import get_model as ref_get_model

    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.config import VARIANTS
    from leanyolo_tpu.models.yolov10.model import backbone_apply, head_apply, model_init, neck_apply
    from leanyolo_tpu.models.yolov10.remap import torch_sd_to_params

    torch.manual_seed(0)
    class_names = [f"c{i}" for i in range(80)]
    ref = ref_get_model(
        name,
        weights=None if weights in ("none", "random") else weights,
        class_names=class_names,
        input_norm_subtract=[0.0],
        input_norm_divide=[1.0],
    )
    ref.eval()

    sd = {k: v for k, v in ref.state_dict().items() if k != "head.dfl.bins"}
    cfg = VARIANTS[name]
    template = model_init(jax.random.PRNGKey(0), cfg, 80)
    params, stats = torch_sd_to_params(sd, template, official=False, strict=True)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, imgsz, imgsz).astype(np.float32)

    with torch.no_grad():
        tc3, tc4, tc5 = ref.backbone(torch.from_numpy(x))
        tp3, tp4, tp5 = ref.neck(tc3, tc4, tc5)
        thead = ref.head.forward_feat((tp3, tp4, tp5), ref.head.cv2, ref.head.cv3)

    @jax.jit
    def fwd(p, xx):
        hp = jax.lax.Precision.HIGHEST
        c3, c4, c5 = backbone_apply(p["backbone"], xx, cfg, precision=hp)
        p3, p4, p5 = neck_apply(p["neck"], c3, c4, c5, cfg, precision=hp)
        head = head_apply(p["head"], (p3, p4, p5), branch="one2many", precision=hp)
        return (c3, c4, c5), (p3, p4, p5), head

    (jc3, jc4, jc5), (jp3, jp4, jp5), jhead = fwd(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    comps = {
        "backbone_c3": (tc3, jc3), "backbone_c4": (tc4, jc4), "backbone_c5": (tc5, jc5),
        "neck_p3": (tp3, jp3), "neck_p4": (tp4, jp4), "neck_p5": (tp5, jp5),
        "head_p3": (thead[0], jhead[0]), "head_p4": (thead[1], jhead[1]), "head_p5": (thead[2], jhead[2]),
    }
    results = {}
    ok = True
    for comp, (t, j) in comps.items():
        want = t.numpy()
        got = np.asarray(j).transpose(0, 3, 1, 2)
        max_abs = float(np.abs(got - want).max())
        passed = max_abs <= RUBRIC["max_abs"]
        ok &= passed
        results[comp] = {"shape": list(want.shape), "max_abs_err": max_abs, "pass": passed}
    return {
        "model": name,
        "img": imgsz,
        "weights": weights,
        "rubric": RUBRIC,
        "components": results,
        "converter": {"matched": len(stats["matched"]), "missing": len(stats["missing"])},
        "pass": ok,
    }


def main() -> None:
    p = argparse.ArgumentParser(description="fidelity report generator")
    p.add_argument("--models", default="yolov10n,yolov10s")
    p.add_argument("--weights", default="random", help="'random' (seeded torch init) or 'PRETRAINED_COCO'")
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--reference-root", default="/root/reference")
    p.add_argument("--out", default="tests/reports")
    args = p.parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    ts = time.strftime("%Y%m%d-%H%M%S")
    summary = []
    for name in args.models.split(","):
        print(f"== {name}")
        rep = run_model(name.strip(), args.weights, args.reference_root, args.imgsz)
        path = out_dir / f"{name}-{ts}.json"
        path.write_text(json.dumps(rep, indent=2), encoding="utf-8")
        worst = max(c["max_abs_err"] for c in rep["components"].values())
        print(f"   {'PASS' if rep['pass'] else 'FAIL'} worst max_abs_err={worst:.2e} -> {path}")
        summary.append({"model": name, "pass": rep["pass"], "worst_max_abs_err": worst})
    (out_dir / f"summary-{ts}.json").write_text(json.dumps(summary, indent=2), encoding="utf-8")
    if not all(s["pass"] for s in summary):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
