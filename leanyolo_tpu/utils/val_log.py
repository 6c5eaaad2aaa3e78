"""Append-only CSV validation run log with the reference's 27-column schema.

Parity: leanyolo/utils/val_log.py:13-132 — same canonical columns (the
`runtime` column gains a 'jax' value), header migration when the schema
changes, and env capture; device_name comes from jax.devices().
"""

from __future__ import annotations

import csv
import platform
import socket
import subprocess
from datetime import UTC, datetime
from pathlib import Path
from typing import Dict, Iterable, List, Mapping

COLUMNS: List[str] = [
    "timestamp",
    "run_id",
    "commit",
    "host",
    "runtime",  # jax | torch | onnxrt | tensorrt | torchscript
    "precision",  # fp32 | bf16 | fp16 | int8
    "device",  # cpu | tpu | cuda
    "device_name",
    "model",
    "weights",
    "dataset",
    "images_dir",
    "ann_json",
    "split",
    "n_images",
    "imgsz",
    "conf",
    "iou",
    "max_images",
    "map_50_95",
    "map_50",
    "map_75",
    "fps",
    "export_path",
    "detections_json",
    "viz_dir",
    "notes",
]


def _git_commit() -> str:
    try:
        return (
            subprocess.check_output(["git", "rev-parse", "--short", "HEAD"], stderr=subprocess.DEVNULL)
            .decode("utf-8")
            .strip()
        )
    except Exception:
        return ""


def _get_device_name(device: str) -> str:
    device = (device or "").lower()
    if device.startswith(("tpu", "jax")):
        try:
            import jax

            return str(jax.devices()[0])
        except Exception:
            return device
    return platform.processor() or platform.machine() or "cpu"


def collect_env_info(*, device: str) -> Dict[str, str]:
    return {
        "commit": _git_commit(),
        "host": socket.gethostname(),
        "device": device,
        "device_name": _get_device_name(device),
    }


def ensure_csv(path: Path, *, columns: Iterable[str] = COLUMNS) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    cols = list(columns)
    if not path.exists():
        with path.open("w", newline="", encoding="utf-8") as f:
            csv.writer(f).writerow(cols)
        return
    try:
        with path.open("r", newline="", encoding="utf-8") as f:
            reader = csv.reader(f)
            header = next(reader, None)
            if header is None:
                raise ValueError("empty CSV")
            if header == cols:
                return
            rows = []
            for r in reader:
                if len(r) < len(header):
                    r = r + [""] * (len(header) - len(r))
                elif len(r) > len(header):
                    r = r[: len(header)]
                rows.append(dict(zip(header, r)))
        with path.open("w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for rowmap in rows:
                w.writerow([rowmap.get(c, "") for c in cols])
    except Exception:
        with path.open("w", newline="", encoding="utf-8") as f:
            csv.writer(f).writerow(cols)


def append_row(path: Path, values: Mapping[str, object], *, columns: Iterable[str] = COLUMNS) -> None:
    ensure_csv(path, columns=columns)
    row = [values.get(col, "") for col in columns]
    with path.open("a", newline="", encoding="utf-8") as f:
        csv.writer(f).writerow(row)


def now_iso() -> str:
    return datetime.now(UTC).replace(microsecond=0).isoformat().replace("+00:00", "Z")
