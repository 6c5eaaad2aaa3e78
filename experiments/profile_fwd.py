"""Profile the yolov10s bs128 forward+decode on the TPU; print top ops.

Usage: python experiments/profile_fwd.py [--variant yolov10s] [--bs 128]
Writes the trace under /tmp/lyt_prof and prints a per-op time table parsed
from the xplane proto (tensorflow.tsl.profiler.protobuf.xplane_pb2).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="yolov10s")
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--train", action="store_true", help="profile the train step instead")
    ap.add_argument("--nmax", type=int, default=128, help="padded GT boxes per image (train)")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    logdir = "/tmp/lyt_prof"
    os.system(f"rm -rf {logdir}")

    from leanyolo_tpu.models.yolov10.decode import decode_topk
    from leanyolo_tpu.models.yolov10.fold import fold_params
    from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply

    model = YOLOv10.create(args.variant, class_names=[f"c{i}" for i in range(80)])
    cfg = model.cfg

    if args.train:
        from leanyolo_tpu.data.dataset import Batch
        from leanyolo_tpu.engine.trainer import TrainConfig, Trainer

        nmax = args.nmax
        cfg_t = TrainConfig(bf16=True, augment=True, grad_clip=1.0, steps_per_epoch=1000)
        tr = Trainer(model, cfg_t)
        rng = np.random.RandomState(0)
        b = args.bs
        x1, y1 = rng.uniform(0, args.imgsz - 40, (2, b, nmax)).astype(np.float32)
        wh = rng.uniform(8, 40, (2, b, nmax)).astype(np.float32)
        batch = Batch(
            rng.uniform(0, 255, (b, args.imgsz, args.imgsz, 3)).astype(np.float32),
            rng.randint(0, 80, (b, nmax)).astype(np.int32),
            np.stack([x1, y1, x1 + wh[0], y1 + wh[1]], axis=-1),
            rng.uniform(size=(b, nmax)) < 0.2,
            [None] * b,
        )

        def step(key):
            return tr.train_step(batch, key)

        jax.block_until_ready(step(jax.random.PRNGKey(0))["total"])  # compile
        jax.block_until_ready(step(jax.random.PRNGKey(1))["total"])
        with jax.profiler.trace(logdir):
            for i in range(3):
                loss = step(jax.random.PRNGKey(2 + i))["total"]
            jax.block_until_ready(loss)
    else:
        params = jax.device_put(fold_params(model.params))

        @jax.jit
        def fwd(p, images):
            raw = model_apply(
                p, images.astype(jnp.bfloat16), cfg, train=False, branches=("one2one",),
                normalize=False, concat_head=False,
            )
            return decode_topk(raw["one2one"], num_classes=80, strides=cfg.strides, max_det=300)

        rng = np.random.RandomState(0)
        # uint8 pixels, matching bench.py's serving-realistic feed.
        x = jnp.asarray(rng.randint(0, 256, (args.bs, args.imgsz, args.imgsz, 3)).astype(np.uint8))
        jax.block_until_ready(fwd(params, x))  # compile
        jax.block_until_ready(fwd(params, x))
        with jax.profiler.trace(logdir):
            for _ in range(3):
                d = fwd(params, x)
            jax.block_until_ready(d)

    # ---- parse the xplane trace ----
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        print(f"== plane: {plane.name} ==")
        for line in plane.lines:
            span = sum(ev.duration_ps for ev in line.events) / 1e9
            print(f"   line '{line.name}': {len(line.events)} events, sum {span:.2f} ms")
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
            items = sorted(tot.items(), key=lambda kv: -kv[1])
            total = sum(tot.values())
            print(f"-- XLA Ops: total {total:.2f} ms over 3 steps ({total/3:.2f}/step) --")
            for name, ms in items[: args.top]:
                print(f"{ms/3:9.3f} ms  x{cnt[name]//3:<3d} {name[:110]}")


if __name__ == "__main__":
    main()
