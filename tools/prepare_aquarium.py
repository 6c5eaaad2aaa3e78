#!/usr/bin/env python
"""Prepare the Kaggle Aquarium dataset (COCO format) for transfer learning.

Counterpart of reference tools/prepare_aquarium.py:46-200: unzip the Kaggle
archive, locate train/valid splits heuristically, find
`_annotations.coco.json` per split, copy images, rewrite `file_name` entries
to basenames, and verify all referenced files exist.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SPLIT_ALIASES = {"train": ("train",), "valid": ("valid", "val", "validation"), "test": ("test",)}


def find_split_dir(root: Path, split: str) -> Path:
    names = SPLIT_ALIASES[split]
    for cand in sorted(root.rglob("*")):
        if cand.is_dir() and cand.name.lower() in names:
            return cand
    raise FileNotFoundError(f"no '{split}' directory under {root}")


def find_ann(split_dir: Path) -> Path:
    for cand in sorted(split_dir.rglob("*.json")):
        if "annotations" in cand.name.lower() and "coco" in cand.name.lower():
            return cand
    jsons = sorted(split_dir.rglob("*.json"))
    if jsons:
        return jsons[0]
    raise FileNotFoundError(f"no annotation json under {split_dir}")


def prepare_split(src_dir: Path, out_dir: Path) -> None:
    ann_path = find_ann(src_dir)
    with open(ann_path, "r", encoding="utf-8") as f:
        ann = json.load(f)
    out_dir.mkdir(parents=True, exist_ok=True)
    missing = []
    for im in ann.get("images", []):
        base = Path(im["file_name"]).name
        src = src_dir / Path(im["file_name"])
        if not src.exists():
            matches = list(src_dir.rglob(base))
            if not matches:
                missing.append(im["file_name"])
                continue
            src = matches[0]
        im["file_name"] = base
        dst = out_dir / base
        if not dst.exists():
            shutil.copyfile(src, dst)
    if missing:
        raise SystemExit(f"{len(missing)} referenced images missing, e.g. {missing[:3]}")
    with open(out_dir / "_annotations.coco.json", "w", encoding="utf-8") as f:
        json.dump(ann, f)
    print(f"{out_dir}: {len(ann.get('images', []))} images, {len(ann.get('annotations', []))} annotations")


def main() -> None:
    p = argparse.ArgumentParser(description="prepare Aquarium dataset")
    p.add_argument("--zip", default=None, help="path to the Kaggle archive")
    p.add_argument("--src", default=None, help="already-extracted directory")
    p.add_argument("--out", default="datasets/aquarium")
    args = p.parse_args()

    out_root = Path(args.out)
    if args.zip:
        extract_dir = out_root / "_extracted"
        extract_dir.mkdir(parents=True, exist_ok=True)
        with zipfile.ZipFile(args.zip) as z:
            z.extractall(extract_dir)
        src_root = extract_dir
    elif args.src:
        src_root = Path(args.src)
    else:
        raise SystemExit("provide --zip or --src")

    for split in ("train", "valid"):
        prepare_split(find_split_dir(src_root, split), out_root / split)
    try:
        prepare_split(find_split_dir(src_root, "test"), out_root / "test")
    except FileNotFoundError:
        pass
    print(f"done: {out_root}")


if __name__ == "__main__":
    main()
