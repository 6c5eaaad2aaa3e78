"""Full per-variant benchmark matrix: inference + train throughput.

Runs bench.bench_variant and bench_train.bench_train for every requested
variant at its known-best batch size and emits one JSON line per cell plus
a markdown table — the artifact PERF.md's per-variant tables are refreshed
from, so cross-round regressions are detectable from a single command.

The reference has no benchmark tooling (it logs FPS into the val CSV only,
reference tools/val.py:271-307); on TPU the throughput matrix is a
first-class deliverable.

Example:
    python tools/bench_matrix.py --out runs/bench_matrix.json
    python tools/bench_matrix.py --variants yolov10n,yolov10s --modes infer
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Best measured batch size per variant (PERF.md per-variant tables). A full
# sweep costs ~1 compile per (variant, bs); the matrix pins the known
# sweet spots and --batch-sizes overrides when re-sweeping is wanted.
# "nms" is the class-wise greedy-NMS decode path (BASELINE config 3,
# behavioral spec reference leanyolo/models/yolov10/export.py:145-198);
# same forward as "infer", so the same batch sizes apply.
# Round-5 re-sweep under the full-128-lane-tile rule: yolov10x infer/nms
# move 32 -> 128 (+30%; 96/160 are worse — the full tile is what matters)
# and yolov10m train 64 -> 128 (+17.6%). yolov10b/l train at bs128 are
# compile-infra-blocked (axon remote-compile helper exits 1, twice);
# yolov10x train bs64 REGRESSES (94.2 vs 119.4) — both stay pinned.
BEST_BS = {
    "infer": {"yolov10n": 128, "yolov10s": 128, "yolov10m": 128, "yolov10b": 128, "yolov10l": 128, "yolov10x": 128},
    "nms": {"yolov10n": 128, "yolov10s": 128, "yolov10m": 128, "yolov10b": 128, "yolov10l": 128, "yolov10x": 128},
    "train": {"yolov10n": 128, "yolov10s": 128, "yolov10m": 128, "yolov10b": 64, "yolov10l": 64, "yolov10x": 32},
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--variants", default="yolov10n,yolov10s,yolov10m,yolov10b,yolov10l,yolov10x")
    p.add_argument("--modes", default="infer,train", help="comma subset of infer,nms,train")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-sizes", default=None, help="override: comma list used for every cell")
    p.add_argument("--out", default=None, help="also write the table as JSON here")
    p.add_argument("--imgsz-in-key", action="store_true",
                   help="emit cells keyed 'variant@imgsz/mode' (the multi-size "
                        "baseline format, reports/bench_matrix_r5_sizes.json)")
    args = p.parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from bench import bench_variant
    from bench_train import bench_train

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    override = tuple(int(b) for b in args.batch_sizes.split(",")) if args.batch_sizes else None

    table: dict = {"imgsz": args.imgsz, "cells": {}}
    for variant in variants:
        for mode in modes:
            bss = override or (BEST_BS[mode].get(variant, 32),)
            if mode == "infer":
                r = bench_variant(variant, args.imgsz, batch_sizes=bss)
            elif mode == "nms":
                r = bench_variant(variant, args.imgsz, batch_sizes=bss, decode="nms")
            else:
                r = bench_train(variant, args.imgsz, batch_sizes=bss)
            if not r["per_bs"]:
                # bench_* swallow per-bs failures (OOM at a pinned size);
                # an empty result must be a loud error, not a 0.0 row in
                # the regression table.
                raise RuntimeError(f"{variant}/{mode}: no batch size in {bss} produced a measurement")
            cell = {
                "images_per_sec_per_chip": round(r["best_ips"], 2),
                "batch_size": r["best_bs"],
                "per_bs": {str(k): round(v, 2) for k, v in r["per_bs"].items()},
            }
            key = f"{variant}@{args.imgsz}/{mode}" if args.imgsz_in_key else f"{variant}/{mode}"
            table["cells"][key] = cell
            print(json.dumps({
                "metric": f"{variant}_{args.imgsz}_bf16_{mode}_images_per_sec_per_chip",
                "value": cell["images_per_sec_per_chip"],
                "unit": "images/sec/chip",
                "batch_size": cell["batch_size"],
            }), flush=True)

    print("\n| Variant | " + " | ".join(modes) + " |")
    print("|---" * (len(modes) + 1) + "|")
    for variant in variants:
        row = [variant]
        for mode in modes:
            c = table["cells"].get(
                f"{variant}@{args.imgsz}/{mode}" if args.imgsz_in_key else f"{variant}/{mode}")
            row.append(f"{c['images_per_sec_per_chip']} (bs{c['batch_size']})" if c else "-")
        print("| " + " | ".join(row) + " |")

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(table, f, indent=2)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
