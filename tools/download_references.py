#!/usr/bin/env python
"""Download YOLO-family paper sources and the official THU-MIG repo.

Counterpart of reference tools/download_references.py:1-102 (same layout:
references/<name>/<arxiv_id>/data for papers, references/official/yolov10
for the upstream repo clone). Network-gated; verifies what already exists
when offline.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tarfile
from pathlib import Path
from urllib.request import urlretrieve

PAPERS = {
    "yolov10": "2405.14458",
    "yolov9": "2402.13616",
    "yolov8-rtdetr": "2304.08069",
    "yolov7": "2207.02696",
    "yolov6": "2209.02976",
    "yolov5-v4-v3": "2004.10934",
    "yolo-v1": "1506.02640",
}
OFFICIAL_REPO = "https://github.com/THU-MIG/yolov10.git"


def main() -> None:
    p = argparse.ArgumentParser(description="download reference papers + official repo")
    p.add_argument("--out", default="references")
    p.add_argument("--verify-only", action="store_true", help="only report what exists")
    args = p.parse_args()

    root = Path(args.out)
    status = {}
    for name, arxiv_id in PAPERS.items():
        data_dir = root / name / arxiv_id / "data"
        if args.verify_only:
            status[name] = data_dir.exists()
            continue
        data_dir.mkdir(parents=True, exist_ok=True)
        tar_path = data_dir / f"{arxiv_id}.tar.gz"
        try:
            if not tar_path.exists():
                urlretrieve(f"https://arxiv.org/e-print/{arxiv_id}", str(tar_path))
            with tarfile.open(tar_path) as t:
                t.extractall(data_dir, filter="data")
            status[name] = True
        except Exception as e:
            print(f"{name} ({arxiv_id}): FAILED {e}")
            status[name] = False

    official = root / "official" / "yolov10"
    if args.verify_only:
        status["official-repo"] = (official / ".git").exists()
    elif not official.exists():
        try:
            subprocess.run(["git", "clone", "--depth", "1", OFFICIAL_REPO, str(official)], check=True)
            status["official-repo"] = True
        except Exception as e:
            print(f"official repo clone FAILED: {e}")
            status["official-repo"] = False

    for k, ok in sorted(status.items()):
        print(f"{'OK ' if ok else 'MISS'} {k}")
    if not all(status.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
