#!/usr/bin/env python
"""Download (and hash-verify) all six official YOLOv10 weights into the cache.

Counterpart of reference tools/download_all_pretrained.py:36-84.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(description="download all pretrained weights")
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--models", default=None, help="comma-separated subset")
    p.add_argument(
        "--no-download",
        action="store_true",
        help="only resolve from LEANYOLO_WEIGHTS_DIR / cache; never hit the network",
    )
    args = p.parse_args()

    from leanyolo_tpu.models.registry import _YOLOv10Weights, list_models

    resolver = _YOLOv10Weights()
    names = args.models.split(",") if args.models else list(list_models())
    failed = []
    for name in names:
        try:
            entry = resolver.get(name, "PRETRAINED_COCO")
            path = entry.resolve_path(cache_dir=args.cache_dir, download=not args.no_download)
            print(f"{name}: OK {path}")
        except Exception as e:
            failed.append(name)
            print(f"{name}: FAILED {e}")
    if failed:
        raise SystemExit(f"failed: {failed}")


if __name__ == "__main__":
    main()
