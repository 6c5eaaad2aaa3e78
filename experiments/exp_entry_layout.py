"""Probe: pin the u8 image batch's ENTRY layout to conv0's dim order.

The train profile shows the augment hflip `rev` at 6.9x its byte bound
plus a full-activation relayout copy: XLA assigns the u8 entry parameter
{2,1,3,0} (W on lanes) while conv0 consumes bf16 {0,3,2,1} (B on lanes).
In-program fixes both lose (PERF.md "u8 hflip reverse" ruling): the
reorder just moves the layout crossing into the cast, and
with_layout_constraint miscompiles on this stack.

Remaining lever: remove the crossing at the SOURCE — device_put the u8
batch already in m2m {0,3,2,1} (major_to_minor (1,2,3,0)) and let jit
compile for that input layout. The transfer moves the same 157 MB either
way (tiling is applied during infeed); the program then has no transposing
op between the parameter and conv0.

Measures the REAL train step (Trainer._step_raw, chained fori_loop, host
readback) with default vs pinned entry layout, and checks loss equality.

Usage: python experiments/exp_entry_layout.py [steps]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
from leanyolo_tpu.models.yolov10.model import YOLOv10

BS, IMGSZ, NBOXES = 128, 640, 24
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def main():
    model = YOLOv10.create("yolov10s", class_names=[f"c{i}" for i in range(80)])
    cfg = TrainConfig(bf16=True, augment=True, grad_clip=1.0, steps_per_epoch=1000)
    tr = Trainer(model, cfg)
    step_raw = tr._step_raw

    rng = np.random.RandomState(0)
    x1, y1 = rng.uniform(0, IMGSZ - 60, (2, BS, NBOXES)).astype(np.float32)
    wh = rng.uniform(8, 60, (2, BS, NBOXES)).astype(np.float32)
    images_np = rng.randint(0, 256, (BS, IMGSZ, IMGSZ, 3)).astype(np.uint8)
    gl = jax.device_put(rng.randint(0, 80, (BS, NBOXES)).astype(np.int32))
    gb = jax.device_put(np.stack([x1, y1, x1 + wh[0], y1 + wh[1]], axis=-1))
    gm = jax.device_put(rng.uniform(size=(BS, NBOXES)) < 0.4)

    @partial(jax.jit, static_argnames=("n",))
    def chained(params, opt_state, images, gl, gb, gm, key, n):
        def body(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, i)
            return step_raw(params, opt_state, images, gl, gb, gm, k)

        params, opt_state, losses = jax.lax.fori_loop(
            0, n, body,
            (params, opt_state,
             {"total": jnp.zeros(()), "cls": jnp.zeros(()), "reg": jnp.zeros(())}))
        return losses["total"]

    dev = jax.devices()[0]
    legs = {}
    # default: plain device_put (XLA picks the entry layout)
    legs["default"] = jax.device_put(images_np, dev)
    # pinned: m2m {0,3,2,1} == major_to_minor (1,2,3,0), conv0's dim order
    fmt = Format(Layout(major_to_minor=(1, 2, 3, 0)), jax.sharding.SingleDeviceSharding(dev))
    legs["pinned_0321"] = jax.device_put(images_np, fmt)

    losses = {}
    for name, images in legs.items():
        print(f"{name}: format={images.format}", flush=True)
        # warm (compile) at the SAME static n as the timed call — a different
        # n is a different program and the timed call would pay the compile.
        losses[name] = float(chained(tr.model.params, tr.opt_state, images, gl, gb, gm,
                                     jax.random.PRNGKey(0), STEPS))
        t0 = time.perf_counter()
        total = float(chained(tr.model.params, tr.opt_state, images, gl, gb, gm,
                              jax.random.PRNGKey(7), STEPS))
        dt = (time.perf_counter() - t0) / STEPS
        assert np.isfinite(total)
        print(f"{name}: {dt * 1e3:.2f} ms/step = {BS / dt:.1f} img/s", flush=True)

    d = abs(losses["default"] - losses["pinned_0321"])
    print(f"2-step loss default={losses['default']:.6f} pinned={losses['pinned_0321']:.6f} "
          f"abs_diff={d:.2e} (layouts must not change math)")


if __name__ == "__main__":
    main()
