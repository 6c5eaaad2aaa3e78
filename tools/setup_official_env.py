#!/usr/bin/env python
"""Create an isolated venv for the cloned official THU-MIG yolov10 repo.

Counterpart of reference tools/setup_official_env.py:41-74. Used when
regenerating golden fidelity tensors against the official implementation.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser(description="set up official yolov10 venv")
    p.add_argument("--official", default="references/official/yolov10")
    p.add_argument("--venv", default="references/official/.venv")
    args = p.parse_args()

    official = Path(args.official)
    if not official.exists():
        raise SystemExit(f"official repo not found at {official}; run tools/download_references.py first")

    venv = Path(args.venv)
    if not (venv / "bin" / "python").exists():
        subprocess.run([sys.executable, "-m", "venv", str(venv)], check=True)
    pip = str(venv / "bin" / "pip")
    subprocess.run([pip, "install", "--upgrade", "pip"], check=True)
    subprocess.run([pip, "install", "-e", str(official)], check=True)
    print(f"venv ready: {venv}")


if __name__ == "__main__":
    main()
