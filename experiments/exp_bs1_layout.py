"""Probe: bs1 serving latency with weights pre-staged in XLA's preferred layouts.

The bs1 profile (experiments/profile_infer_bs1.log) shows 0.42 ms of the
1.17 ms on-device time in 78 relayout copies (XLA reshapes bs1 convs into
spatial-major forms and relays the folded weights at runtime) plus 173
copy-start/done prefetch pairs; the 2.89 ms wall is dominated by ~1.7 ms of
per-op sequencer gaps on a 560-op program. Pre-staging the weights in the
layouts the compiled program wants (jit with Layout.AUTO for params ->
query compiled input formats -> device_put once) removes those copies AND
shrinks the op count, attacking both terms. This is the round-2 verdict's
"pre-stage weights in their serving layout" lever (item 5).

Legs (yolov10s 640, folded params, exact decode — bench.py's serving path):
  default   — params device_put plainly, jit picks default entry layouts
  auto      — params device_put into compiled-with-AUTO input formats

Reports ms/image at bs in {1, 4, 8} for both legs.

Usage: python experiments/exp_bs1_layout.py [chain_steps]
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

from leanyolo_tpu.models.yolov10.decode import decode_topk
from leanyolo_tpu.models.yolov10.fold import fold_params
from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply

CHAIN = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    model = YOLOv10.create("yolov10s", class_names=[f"c{i}" for i in range(80)])
    cfg = model.cfg
    params_host = fold_params(model.params)

    def forward(p, images):
        raw = model_apply(
            p, images.astype(jnp.bfloat16), cfg, train=False, branches=("one2one",),
            normalize=False, concat_head=False,
        )
        return decode_topk(raw["one2one"], num_classes=80, strides=cfg.strides, max_det=300)

    @partial(jax.jit, static_argnames=("n",))
    def chained(p, images, n):
        def body(_, x):
            dets = forward(p, x)
            return x + (jnp.tanh(jnp.sum(dets)) * 1e-30).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, images)
        return jnp.sum(x[0, 0, 0].astype(jnp.float32))

    # bs1 only: the chain-length sweep (run with 64 then 256) separates true
    # per-step latency from the fixed per-call host/tunnel overhead —
    # wall(n) = overhead + n*step — which round 2's chain=16 measurement
    # smeared into its 2.89 ms "per-step" number.
    for bs in (1,):
        x0 = jnp.asarray(np.random.RandomState(0).randint(0, 256, (bs, 640, 640, 3), np.uint8))
        x1 = jnp.asarray(np.random.RandomState(1).randint(0, 256, (bs, 640, 640, 3), np.uint8))

        # --- default leg ---
        p_dev = jax.device_put(params_host)
        r_default = None
        float(chained(p_dev, x0, CHAIN))
        t0 = time.perf_counter()
        s = float(chained(p_dev, x1, CHAIN))
        dt = (time.perf_counter() - t0) / CHAIN
        assert np.isfinite(s)
        r_default = dt * 1e3
        print(f"bs{bs} default: {r_default:.3f} ms/step = {r_default / bs:.3f} ms/img", flush=True)

        # --- auto leg: compile with AUTO param layouts, stage params into them ---
        # (pjit rejects kwargs/static args when in_shardings is given — close
        # over the chain length instead.)
        auto_fmt = Format(Layout.AUTO)
        fmts = jax.tree.map(lambda _: auto_fmt, params_host)
        jfn = jax.jit(lambda p, images: chained.__wrapped__(p, images, CHAIN),
                      in_shardings=(fmts, None))
        compiled = jfn.lower(params_host, x0).compile()
        in_fmts = compiled.input_formats[0]  # (params_fmts, image_fmt)
        p_auto = jax.device_put(params_host, in_fmts[0])
        # call the AOT executable: __call__ on the jit wrapper re-validates
        # in_shardings=AUTO against concrete layouts and rejects them.
        float(compiled(p_auto, x0))
        t0 = time.perf_counter()
        s = float(compiled(p_auto, x1))
        dt = (time.perf_counter() - t0) / CHAIN
        assert np.isfinite(s)
        r_auto = dt * 1e3
        n_changed = sum(
            1 for d, a in zip(jax.tree.leaves(jax.tree.map(lambda x: x.format, p_dev)),
                              jax.tree.leaves(in_fmts[0]))
            if d.layout != a.layout
        )
        print(f"bs{bs} auto:    {r_auto:.3f} ms/step = {r_auto / bs:.3f} ms/img "
              f"({n_changed} param layouts differ from default)", flush=True)

        # --- bf16 pre-cast leg: remove the per-call f32->bf16 weight casts.
        # conv2d/bias do w.astype(x.dtype); pre-casting is the same
        # round-to-nearest-even, so outputs are bitwise identical and the 85
        # convert ops (plus their sequencer gaps) vanish from the program.
        params_bf16 = jax.tree.map(
            lambda w: w.astype(jnp.bfloat16) if w.dtype == jnp.float32 else w, params_host)
        p_b16 = jax.device_put(params_bf16)
        float(chained(p_b16, x0, CHAIN))
        t0 = time.perf_counter()
        s = float(chained(p_b16, x1, CHAIN))
        dt = (time.perf_counter() - t0) / CHAIN
        assert np.isfinite(s)
        print(f"bs{bs} bf16:    {dt * 1e3:.3f} ms/step = {dt * 1e3 / bs:.3f} ms/img", flush=True)

        # --- bf16 + AUTO layouts combined ---
        fmts_b = jax.tree.map(lambda _: auto_fmt, params_bf16)
        jfn_b = jax.jit(lambda p, images: chained.__wrapped__(p, images, CHAIN),
                        in_shardings=(fmts_b, None))
        compiled_b = jfn_b.lower(params_bf16, x0).compile()
        in_fmts_b = compiled_b.input_formats[0]
        p_b16a = jax.device_put(params_bf16, in_fmts_b[0])
        float(compiled_b(p_b16a, x0))
        t0 = time.perf_counter()
        s = float(compiled_b(p_b16a, x1))
        dt = (time.perf_counter() - t0) / CHAIN
        assert np.isfinite(s)
        print(f"bs{bs} bf16+auto: {dt * 1e3:.3f} ms/step = {dt * 1e3 / bs:.3f} ms/img", flush=True)


if __name__ == "__main__":
    main()
