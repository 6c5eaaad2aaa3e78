"""Re-parse the last xplane trace and list the TOP INDIVIDUAL ops (not
families) with their full HLO names, so per-layer conv/wgrad/dgrad costs are
attributable to shapes. Usage: python experiments/parse_prof_ops.py [N] [steps]"""

import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

paths = sorted(glob.glob("/tmp/leanyolo_tpu_prof/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    # long name (with shape) lives in metadata display_name or stats; fall back to name
    disp = {m.id: (m.display_name or m.name) for m in plane.event_metadata.values()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            key = ev.metadata_id
            tot[key] += ev.duration_ps / 1e9
            cnt[key] += 1
    total = sum(tot.values())
    print(f"plane {plane.name}: total {total/steps:.2f} ms/step, top {top_n} individual ops:")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {v/steps:8.3f} ms  x{cnt[k]//steps:<3d} {disp[k][:160]}")
