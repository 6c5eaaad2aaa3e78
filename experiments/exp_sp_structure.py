"""Document the sp-mesh (1,8) 640px forward's program structure (virtual mesh).

Round-2 verdict item 5 asks for the spatial-parallel latency path to be
validated as a PROGRAM — op counts and halo-collective structure — so the
single-chip bs1 latency story (dispatch-bound, PERF.md) extends to a
hardware-ready prediction for SP. Runs on the 8-device virtual CPU mesh
(no chip needed); counts ops and collectives in the OPTIMIZED module.

What to look for (PERF.md "SP inference" prediction):
- per-shard op count vs the 560-op single-chip program (the per-op
  sequencer gap is the bs1 bottleneck, so SP only wins if op count does
  not balloon);
- the number of halo exchanges (collective-permutes) XLA inserts for the
  ~60 kh>1 convs.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python experiments/exp_sp_structure.py
"""

import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from leanyolo_tpu.models.yolov10.decode import decode_topk
from leanyolo_tpu.models.yolov10.fold import fold_params
from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply
from leanyolo_tpu.parallel import mesh as pmesh


def main():
    mesh = pmesh.make_sp_mesh(1, 8)
    model = YOLOv10.create("yolov10s", class_names=[f"c{i}" for i in range(80)])
    cfg = model.cfg
    params = jax.device_put(fold_params(model.params), pmesh.replicated(mesh))

    def forward(p, images):
        raw = model_apply(
            p, images.astype(jnp.bfloat16), cfg, train=False, branches=("one2one",),
            normalize=False, concat_head=False,
        )
        return decode_topk(raw["one2one"], num_classes=80, strides=cfg.strides, max_det=300)

    x = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randint(0, 256, (1, 640, 640, 3), np.uint8)),
        pmesh.image_sharded(mesh),
    )

    jfn = jax.jit(forward)
    compiled = jfn.lower(params, x).compile()
    txt = compiled.as_text()

    # Per-op census. `ops` counts every instruction in the module (fusion
    # bodies included); `entry_ops` counts only the ENTRY computation's
    # top-level instructions — the dispatch-count analog of the single-chip
    # 560-op figure in the bs1 anatomy.
    ops = Counter()
    entry_ops = Counter()
    colls = Counter()
    in_entry = False
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if s == "}":
            in_entry = False
            continue
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*\S+\s+([a-z][\w\-]*)\(", s)
        if not m:
            continue
        op = m.group(1)
        ops[op] += 1
        if in_entry:
            entry_ops[op] += 1
        if op in ("collective-permute", "all-gather", "all-reduce", "all-to-all",
                  "reduce-scatter", "collective-permute-start", "all-gather-start",
                  "all-reduce-start"):
            colls[op] += 1

    total = sum(ops.values())
    print(f"sp-mesh (1,8) yolov10s 640 forward+decode — optimized module census")
    print(f"total instructions: {total}; ENTRY (dispatched) instructions: "
          f"{sum(entry_ops.values())}")
    print("collectives:", dict(colls) or "none")
    print("top ENTRY op kinds:")
    for op, n in entry_ops.most_common(20):
        print(f"  {n:5d}  {op}")

    # Execute one step so the program is proven runnable, and sanity the shape.
    dets = jfn(params, x)
    print("executed ok; dets:", jax.tree.map(lambda a: (a.shape, str(a.dtype)), dets))


if __name__ == "__main__":
    main()
