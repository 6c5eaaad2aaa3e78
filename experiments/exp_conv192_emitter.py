"""Reproduce + attack the yolov10m conv-emitter pathology (round 4).

The m-vs-b profile (PERF.md round 4) found ONE op eating 15.6 ms of m's
97 ms step: a 3x3 s1 192->192 conv at [128,40,40] whose XLA schedule is
`EmitInputBatchInLanes` with estimated_cycles=145M — 18.7x its roofline
floor — while its 12 sibling convs of the SAME shape got 1.1M-cycle
schedules. The differing feature: the PREVIOUS conv's bias+SiLU epilogue
was fused into the slow conv's INPUT side (a kLoop producer inside the conv
fusion).

This probe reproduces the trigger standalone (a chain of two conv+bias+SiLU
blocks) and measures candidate fixes:

  chain     — conv(+bias+SiLU) -> conv(+bias+SiLU), as the model computes
  barrier   — jax.lax.optimization_barrier between the blocks (blocks
              producer fusion; numerically a no-op)
  pad256    — channels zero-padded to the 256 lane tile for the second conv
  single    — second conv alone from a materialized input (control)

Each at [128,40,40,C] for C in (192, 256) — 256 is the b-width control that
never shows the pathology.

Usage: python experiments/exp_conv192_emitter.py
Writes experiments/logs/conv192_emitter.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")
B = int(os.environ.get("EXP_B", 128))
H = W = int(os.environ.get("EXP_HW", 40))
CHANNELS = tuple(int(c) for c in os.environ.get("EXP_C", "192,256").split(","))


def run_case(name, c, variant):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, c)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32)).astype(jnp.bfloat16)

    def cba(y, w, b):
        y = jax.lax.conv_general_dilated(y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + b
        return y * jax.nn.sigmoid(y)

    def step(y):
        if variant == "single":
            return cba(y, w2, b2)
        h = cba(y, w1, b1)
        if variant == "barrier":
            h = jax.lax.optimization_barrier(h)
        if variant == "pad256" and c % 128:
            cp = 128 * (-(-c // 128))
            hp = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
            w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, cp - c), (0, cp - c)))
            b2p = jnp.pad(b2, (0, cp - c))
            return cba(hp, w2p, b2p)[..., :c]
        return cba(h, w2, b2)

    @partial(jax.jit, static_argnames=("m",))
    def chained(y, m):
        def body(_, z):
            out = step(z)
            # renormalize so the chain doesn't decay (ADVICE r3)
            return (out / (jnp.sqrt(jnp.mean(out.astype(jnp.float32) ** 2) + 1e-6)).astype(z.dtype))[..., : z.shape[-1]]

        z = jax.lax.fori_loop(0, m, body, y)
        return jnp.sum(z.astype(jnp.float32))

    chain = 16
    float(chained(x, chain))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x, chain))
        walls.append(time.perf_counter() - t0)
    ms = min(walls) / chain * 1e3
    print(f"C={c:4d} {name:10s} {ms:8.3f} ms/step", flush=True)
    return ms


def main() -> None:
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    out = {}
    for c in CHANNELS:
        for variant in ("chain", "barrier", "pad256", "single"):
            if variant == "pad256" and c % 128 == 0:
                continue
            out[f"c{c}/{variant}"] = round(run_case(variant, c, variant), 3)
    os.makedirs(LOG_DIR, exist_ok=True)
    with open(os.path.join(LOG_DIR, "conv192_emitter.json"), "w", encoding="utf-8") as f:
        json.dump({"shape": [B, H, W], "ms_per_step": out}, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
