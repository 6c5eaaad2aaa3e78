"""Create a synthetic official-format YOLOv10 checkpoint for offline SQA.

Takes our own randomly initialized model, converts its params to a torch
state dict (HWIO -> OIHW), renames lean module prefixes back to official
`model.{idx}.` numbering (the inverse of models/yolov10/keymap.py), and
torch-saves it — producing a file shaped like a THU-MIG checkpoint that
`tools/convert_official_weights.py --local-pt` must ingest byte-exactly.

Usage: python tests/make_official_ckpt.py <out.pt> [variant]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_LEAN_TO_OFFICIAL = {
    "backbone.cv0": 0, "backbone.cv1": 1, "backbone.c2": 2, "backbone.cv3": 3,
    "backbone.c4": 4, "backbone.sc5": 5, "backbone.c6": 6, "backbone.sc7": 7,
    "backbone.c8": 8, "backbone.sppf9": 9, "backbone.psa10": 10,
    "neck.p5_p4_c2f": 13, "neck.p4_p3_c2f": 16, "neck.p3_down": 17,
    "neck.p3_p4_c2f": 19, "neck.p4_down": 20, "neck.p4_p5_c2f": 22,
    "head": 23,
}


def make_official_ckpt(out_path: str, variant: str = "yolov10n", seed: int = 0) -> str:
    import torch

    from leanyolo_tpu import get_model
    from leanyolo_tpu.models.yolov10.remap import params_to_torch_sd

    model = get_model(variant, weights=None, class_names=[f"c{i}" for i in range(80)], seed=seed)
    sd = {}
    for k, v in params_to_torch_sd(model.params).items():
        for prefix, idx in _LEAN_TO_OFFICIAL.items():
            if k.startswith(prefix + "."):
                sd[f"model.{idx}." + k[len(prefix) + 1:]] = torch.from_numpy(v.copy())
                break
    torch.save({"state_dict": sd}, out_path)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "runs/sqa/official_fake.pt"
    variant = sys.argv[2] if len(sys.argv) > 2 else "yolov10n"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    print("saved:", make_official_ckpt(out, variant))
