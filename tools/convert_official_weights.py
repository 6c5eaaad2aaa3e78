#!/usr/bin/env python
"""Convert official THU-MIG checkpoints into native strict-loadable .npz.

Counterpart of reference tools/convert_official_weights.py:31-71: loads
weights='PRETRAINED_COCO' through the remap pipeline and saves a plain
checkpoint that `get_model(weights=<path>)` loads strictly.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="convert official weights to native npz")
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--out", default=None, help="default: <model>_coco.npz")
    p.add_argument("--local-pt", default=None, help="path to an official .pt instead of cache/download")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from leanyolo_tpu import get_model
    from leanyolo_tpu.data.coco import coco80_class_names
    from leanyolo_tpu.models.registry import save_checkpoint

    if args.local_pt:
        from leanyolo_tpu.models.yolov10.remap import torch_sd_to_params
        from leanyolo_tpu.utils.torch_reader import load_torch_checkpoint

        model = get_model(args.model, weights=None, class_names=coco80_class_names())
        sd = load_torch_checkpoint(args.local_pt)
        model.params, stats = torch_sd_to_params(sd, model.params, official=True)
        print(f"mapped {len(stats['matched'])} tensors, synthesized {len(stats['synthesized'])}, missing {len(stats['missing'])}")
    else:
        model = get_model(args.model, weights="PRETRAINED_COCO", class_names=coco80_class_names())

    out = args.out or f"{args.model}_coco.npz"
    save_checkpoint(model, out)
    print(f"saved: {out}")


if __name__ == "__main__":
    main()
