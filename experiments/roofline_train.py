"""Per-op roofline analysis of the last xplane trace: every event name is a
full typed HLO definition string, so bytes-moved (output + operand shapes)
can be computed directly and compared with measured time at HBM speed.

Identifies which ops have real headroom vs which sit at the memory wall.

Usage: python experiments/roofline_train.py [min_ms] [steps]
"""

import glob
import re
import sys
from collections import defaultdict

HBM_GBS = 819.0  # measured-class HBM bandwidth for this chip (PERF.md)

min_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 0.35
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8, "f64": 8}
shape_re = re.compile(r"(f32|bf16|s32|u32|s8|u8|pred|f16|s16|u16|s64|u64|f64)\[([\d,]*)\]")


def shape_bytes(text):
    total = 0
    for dt, dims in shape_re.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(glob.glob("/tmp/leanyolo_tpu_prof/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

rows = []
tot_all = 0.0
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    tot = defaultdict(float)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            tot[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    tot_all = sum(tot.values()) / steps
    for name, t_ms in tot.items():
        t = t_ms / steps
        if t < min_ms:
            continue
        eq = name.find("=")
        paren = name.find("(", eq)
        out_text = name[eq + 1 : paren] if eq != -1 and paren != -1 else ""
        # operand types: tokens inside the call parens (strip layout annots fine)
        arg_text = name[paren:] if paren != -1 else ""
        wbytes = shape_bytes(out_text)
        rbytes = shape_bytes(arg_text)
        bound = (rbytes + wbytes) / (HBM_GBS * 1e6)
        short = name.split("=")[0].strip().lstrip("%")
        opkind = "conv-in-fusion" if "convolution" in name else ""
        rows.append((t, bound, (rbytes + wbytes) / 1e6, short, out_text.strip()[:70], opkind))

rows.sort(reverse=True)
print(f"total {tot_all:.2f} ms/step; ops >= {min_ms} ms, roofline @{HBM_GBS:.0f} GB/s:")
print(f"{'ms':>8} {'bound':>7} {'x':>5} {'MB':>8}  op / output")
sum_t = sum_b = 0.0
for t, bound, mb, short, out_text, opkind in rows:
    sum_t += t
    sum_b += bound
    print(f"{t:8.3f} {bound:7.3f} {t / max(bound, 1e-9):5.1f} {mb:8.1f}  {short}  {out_text} {opkind}")
print(f"\nlisted: {sum_t:.1f} ms measured vs {sum_b:.1f} ms bandwidth bound "
      f"(headroom-if-BW-bound {sum_t - sum_b:.1f} ms); step total {tot_all:.2f} ms")
