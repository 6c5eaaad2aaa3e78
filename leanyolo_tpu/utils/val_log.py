"""Append-only CSV log of validation runs.

Behavioral parity target: the reference's 27-column canonical schema and
self-migrating header (leanyolo/utils/val_log.py:13-132). The schema is
mandated; the implementation here is DictReader/DictWriter-based. The
`runtime` column gains a 'jax' value and device names come from
`jax.devices()`.
"""

from __future__ import annotations

import csv
import platform
import socket
import subprocess
from datetime import UTC, datetime
from pathlib import Path
from typing import Dict, Iterable, List, Mapping

# Canonical 27-column run-log schema (order matters; appended rows and header
# migrations both key off this tuple).
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


def now_iso() -> str:
    """UTC timestamp in second resolution, Z-suffixed."""
    return datetime.now(UTC).replace(microsecond=0).isoformat().replace("+00:00", "Z")


def collect_env_info(*, device: str) -> Dict[str, str]:
    """Environment columns for a run row: commit, host, device, device_name."""
    dev = (device or "").lower()
    if dev.startswith(("tpu", "jax")):
        try:
            import jax

            name = str(jax.devices()[0])
        except Exception:
            name = dev
    else:
        name = platform.processor() or platform.machine() or "cpu"

    commit = ""
    proc = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    )
    if proc.returncode == 0:
        commit = proc.stdout.strip()

    return {
        "commit": commit,
        "host": socket.gethostname(),
        "device": device,
        "device_name": name,
    }


def _read_rows(path: Path) -> tuple[List[str], List[Dict[str, str]]] | None:
    """Parse an existing log as (header, row dicts); None if unreadable/empty."""
    try:
        with path.open("r", newline="", encoding="utf-8") as f:
            reader = csv.DictReader(f)
            if not reader.fieldnames:
                return None
            rows = [dict(r) for r in reader]
        return list(reader.fieldnames), rows
    except (OSError, csv.Error, UnicodeDecodeError):
        return None


def _write_rows(path: Path, columns: List[str], rows: Iterable[Mapping[str, object]]) -> None:
    with path.open("w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=columns, extrasaction="ignore", restval="")
        writer.writeheader()
        for row in rows:
            writer.writerow({k: v for k, v in row.items() if k is not None})


def ensure_csv(path: Path, *, columns: Iterable[str] = COLUMNS) -> None:
    """Create the log with a schema header, or migrate an old-schema log.

    Migration keeps every row, matching columns by name: renamed-away columns
    drop, new columns fill empty — so the file is always readable under the
    current schema.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    cols = list(columns)

    if not path.exists():
        _write_rows(path, cols, [])
        return

    parsed = _read_rows(path)
    if parsed is None:
        _write_rows(path, cols, [])  # unreadable/empty: start fresh
        return
    header, rows = parsed
    if header != cols:
        _write_rows(path, cols, rows)


def append_row(path: Path, values: Mapping[str, object], *, columns: Iterable[str] = COLUMNS) -> None:
    """Append one run row; creates/migrates the file first. Unknown keys in
    `values` are ignored, missing ones become empty cells."""
    path = Path(path)
    cols = list(columns)
    ensure_csv(path, columns=cols)
    with path.open("a", newline="", encoding="utf-8") as f:
        csv.DictWriter(f, fieldnames=cols, extrasaction="ignore", restval="").writerow(
            {c: values.get(c, "") for c in cols}
        )
