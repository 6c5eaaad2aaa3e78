"""On-device step profiling: capture + parse ``jax.profiler`` xplane traces.

The reference has no profiling tooling (SURVEY.md §5 notes traces are "not
required for parity"); on TPU the per-op timeline is the primary perf
instrument, so this framework ships it as a first-class utility. The
round-1/2 optimization campaigns (PERF.md) ran exactly this analysis by
hand; `tools/profile_step.py` is the productized form.

Usage:
    with capture_trace(out_dir):
        for _ in range(steps):
            run_one_step()
    table = summarize_trace(out_dir, steps=steps)
    print(format_table(table))

The parser aggregates XLA op time into "op families" (fusion kind prefixes
like `convolution`, `fusion`, `dynamic-update-slice` ...), which is the
granularity XLA's fused programs are legible at: individual HLO names are
compiler-generated and unstable across versions, families are not.
"""

from __future__ import annotations

import glob
import os
import re
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Dict, List, Optional


@dataclass
class OpFamily:
    name: str
    total_ms: float  # per step
    count: int  # per step (rounded)
    example: str  # longest single op in the family


@dataclass
class TraceSummary:
    plane: str
    total_ms: float  # per step, sum of XLA op time
    families: List[OpFamily]
    steps: int


@contextmanager
def capture_trace(out_dir: str):
    """jax.profiler.trace context; creates out_dir."""
    import jax

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        yield


def _latest_xplane(out_dir: str) -> str:
    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {out_dir}")
    return paths[-1]


def _family(op_name: str) -> str:
    m = re.match(r"%?([a-zA-Z_\-]+)", op_name)
    return m.group(1) if m else op_name[:24]


def summarize_trace(out_dir: str, *, steps: int = 1, plane_filter: Optional[str] = None) -> TraceSummary:
    """Parse the newest xplane trace under out_dir into a per-step op table.

    plane_filter: substring selecting the device plane ('TPU' on hardware).
    Default: prefer a TPU plane, else any plane carrying an 'XLA Ops' line
    (the CPU backend's plane in tests).
    """
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover - tf always present here
        raise RuntimeError(
            "parsing xplane traces needs tensorflow's xplane_pb2; "
            "view the trace in TensorBoard instead"
        ) from e

    xs = xplane_pb2.XSpace()
    with open(_latest_xplane(out_dir), "rb") as f:
        xs.ParseFromString(f.read())

    def xla_ops_events(plane):
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        # TPU planes put per-op events on a line literally named "XLA Ops";
        # the CPU backend scatters them over executor thread lines
        # ("tf_XLAPjRtCpuClient/...") with begin events + "end: ..." markers.
        has_xla_ops = any(l.name == "XLA Ops" for l in plane.lines)
        for line in plane.lines:
            if has_xla_ops:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    yield ev_meta.get(ev.metadata_id, "?"), ev.duration_ps / 1e9
            elif "XLAPjRtCpuClient" in line.name:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    if name.startswith(("end: ", "ThreadpoolListener", "$")):
                        continue
                    yield name, ev.duration_ps / 1e9

    def has_ops(plane):
        return any(
            l.name == "XLA Ops" or "XLAPjRtCpuClient" in l.name for l in plane.lines
        )

    # has_ops also gates the explicit filter: a name-matching metadata/host
    # plane with no op lines would otherwise read as "this step costs 0 ms".
    candidates = [p for p in xs.planes if plane_filter and plane_filter in p.name and has_ops(p)]
    if not candidates:
        candidates = [p for p in xs.planes if "TPU" in p.name and has_ops(p)]
    if not candidates:
        candidates = [p for p in xs.planes if has_ops(p)]
    if not candidates:
        raise RuntimeError(f"no device plane with XLA ops in trace (planes: {[p.name for p in xs.planes]})")

    plane = candidates[0]
    fam_ms: Dict[str, float] = defaultdict(float)
    fam_cnt: Dict[str, int] = defaultdict(int)
    fam_top: Dict[str, tuple] = {}
    for name, ms in xla_ops_events(plane):
        f0 = _family(name)
        fam_ms[f0] += ms
        fam_cnt[f0] += 1
        if ms > fam_top.get(f0, ("", -1.0))[1]:
            fam_top[f0] = (name, ms)

    steps = max(1, int(steps))
    families = [
        OpFamily(k, v / steps, round(fam_cnt[k] / steps), fam_top[k][0])
        for k, v in sorted(fam_ms.items(), key=lambda kv: -kv[1])
    ]
    return TraceSummary(plane.name, sum(fam_ms.values()) / steps, families, steps)


def format_table(s: TraceSummary, *, top: int = 25) -> str:
    lines = [
        f"plane: {s.plane}",
        f"on-device XLA op time: {s.total_ms:.3f} ms/step ({s.steps} steps averaged)",
        f"{'ms/step':>9}  {'count':>5}  family (longest op)",
    ]
    for f in s.families[:top]:
        ex = f.example if len(f.example) <= 60 else f.example[:57] + "..."
        lines.append(f"{f.total_ms:9.3f}  {f.count:5d}  {f.name}  ({ex})")
    rest = s.families[top:]
    if rest:
        lines.append(f"{sum(f.total_ms for f in rest):9.3f}  {sum(f.count for f in rest):5d}  ... {len(rest)} more families")
    return "\n".join(lines)
