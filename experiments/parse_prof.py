"""Re-parse the last xplane trace and aggregate op time by name family."""

import glob
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = sorted(glob.glob("/tmp/lyt_prof/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    fam = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            # family = op name up to the first digit suffix / shape
            m = re.match(r"%([a-zA-Z_\-]+)", name)
            f0 = m.group(1) if m else name[:20]
            fam[f0] += ev.duration_ps / 1e9
            cnt[f0] += 1
    total = sum(fam.values())
    print(f"plane {plane.name}: total {total/3:.2f} ms/step")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v/3:8.3f} ms  x{cnt[k]//3:<5d} {k}")
