#!/usr/bin/env python
"""Prepare COCO val2017 (download) and optional small sanity subsets.

Counterpart of reference tools/prepare_coco.py:47-106: downloads val2017,
then builds an N-image subset with filtered annotations under
<root>/sanity_<N>/ (symlink images when possible, copy otherwise).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="prepare COCO val2017 + sanity subset")
    p.add_argument("--root", default="datasets/coco")
    p.add_argument("--subset", type=int, default=0, help="build an N-image sanity subset")
    p.add_argument("--images-dir", default=None, help="existing images dir (skip download)")
    p.add_argument("--ann-json", default=None, help="existing annotation json (skip download)")
    return p.parse_args()


def build_subset(images_dir: str, ann_json: str, out_root: str, n: int) -> None:
    with open(ann_json, "r", encoding="utf-8") as f:
        ann = json.load(f)
    images = sorted(ann["images"], key=lambda im: im["id"])[:n]
    keep = {im["id"] for im in images}
    subset = {
        "images": images,
        "annotations": [a for a in ann["annotations"] if a["image_id"] in keep],
        "categories": ann["categories"],
    }
    out_imgs = os.path.join(out_root, "images")
    os.makedirs(out_imgs, exist_ok=True)
    for im in images:
        src = os.path.join(images_dir, im["file_name"])
        dst = os.path.join(out_imgs, im["file_name"])
        if os.path.exists(dst):
            continue
        try:
            os.symlink(os.path.abspath(src), dst)
        except OSError:
            shutil.copyfile(src, dst)
    with open(os.path.join(out_root, "annotations.json"), "w", encoding="utf-8") as f:
        json.dump(subset, f)
    print(f"subset: {out_root} ({len(images)} images, {len(subset['annotations'])} annotations)")


def main() -> None:
    args = parse_args()
    if args.images_dir and args.ann_json:
        images_dir, ann_json = args.images_dir, args.ann_json
    else:
        from leanyolo_tpu.data.coco import ensure_coco_val

        images_dir, ann_json = ensure_coco_val(args.root)
        print(f"val2017 ready: {images_dir} / {ann_json}")
    if args.subset:
        build_subset(images_dir, ann_json, os.path.join(args.root, f"sanity_{args.subset}"), args.subset)


if __name__ == "__main__":
    main()
