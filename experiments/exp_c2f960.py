"""Round-5 probe: the yolov10s 960/1280px cliff — distributed C2f merge.

s@960 runs at ~46% of linear scaling from 640 (727 vs ~1587 img/s,
reports/bench_matrix_r5_960_s.json) while x scales ~linearly. Profile
(s@960 bs64): ~24% of the step is LAYOUT COPIES around the early C2f's
split/concat ([64,240,240,96] {3,0,2,1} <-> {2,3,1,0}), with batch-in-
sublanes conv emitters (EmitOutputBatchInSublanes etc.) appearing at these
large-spatial/small-channel shapes. Standalone conv chains at the same
shapes scale LINEARLY (probe above), and barrier=all makes the model WORSE
(694.6 vs 726.9) — so the pathology is the layout ping-pong at the C2f
split/concat boundaries, not conv-intrinsic and not producer fusion.

This probe tests eliminating the boundaries algebraically (the round-2
phase-add-upsample pattern): distribute cv2's 1x1 conv over the concat
segments (cv2(concat(ys)) == sum_i conv1x1(y_i, W_i) — fp reassociation
only, MXU accumulates f32), optionally split cv1's weights instead of
slicing its output. Shapes = the s@960 C2f-2 block exactly:
cv1 64->64, split 32/32, one bottleneck (3x3 32->32 x2, residual),
concat 96, cv2 96->64 @ [64,240,240].

Variants:
  base  — faithful current c2f_apply dataflow
  dist  — cv2 distributed over segments (concat eliminated)
  dist2 — dist + cv1 emitted as two 64->32 convs (split eliminated)

Usage: python experiments/exp_c2f960.py [--k 4] [--iters 20] [--hw 240] [--bs 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs", "c2f960.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hw", type=int, default=240)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--c", type=int, default=64, help="block in/out channels")
    args = ap.parse_args()

    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp

    c, ch = args.c, args.c // 2  # c_out, hidden
    rng = np.random.RandomState(0)

    def mk_conv(ci, co, k):
        return (
            jnp.asarray(rng.randn(k, k, ci, co) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.uniform(0.5, 1.5, co), jnp.bfloat16),
            jnp.asarray(rng.randn(co) * 0.01, jnp.bfloat16),
        )

    def mk_block():
        return {
            "cv1": mk_conv(c, 2 * ch, 1),
            "m0a": mk_conv(ch, ch, 3),
            "m0b": mk_conv(ch, ch, 3),
            "cv2": mk_conv(3 * ch, c, 1),
        }

    blocks = [mk_block() for _ in range(args.k)]

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    def cba(x, p):
        w, s, b = p
        return jax.nn.silu(conv(x, w).astype(jnp.bfloat16) * s + b)

    def block_base(x, p):
        y = cba(x, p["cv1"])
        y1, y2 = jnp.split(y, 2, axis=-1)
        m = y2 + jax.nn.silu(
            conv(jax.nn.silu(conv(y2, p["m0a"][0]).astype(jnp.bfloat16) * p["m0a"][1] + p["m0a"][2]),
                 p["m0b"][0]).astype(jnp.bfloat16) * p["m0b"][1] + p["m0b"][2])
        return cba(jnp.concatenate([y1, y2, m], axis=-1), p["cv2"])

    def _bottleneck(y2, p):
        m = jax.nn.silu(conv(y2, p["m0a"][0]).astype(jnp.bfloat16) * p["m0a"][1] + p["m0a"][2])
        return y2 + jax.nn.silu(conv(m, p["m0b"][0]).astype(jnp.bfloat16) * p["m0b"][1] + p["m0b"][2])

    def block_dist(x, p, split_cv1: bool):
        if split_cv1:
            w, s, b = p["cv1"]
            y1 = jax.nn.silu(conv(x, w[..., :ch]).astype(jnp.bfloat16) * s[:ch] + b[:ch])
            y2 = jax.nn.silu(conv(x, w[..., ch:]).astype(jnp.bfloat16) * s[ch:] + b[ch:])
        else:
            y = cba(x, p["cv1"])
            y1, y2 = jnp.split(y, 2, axis=-1)
        m = _bottleneck(y2, p)
        w, s, b = p["cv2"]
        acc = (
            conv(y1, w[:, :, :ch, :])
            + conv(y2, w[:, :, ch : 2 * ch, :])
            + conv(m, w[:, :, 2 * ch :, :])
        )
        return jax.nn.silu(acc.astype(jnp.bfloat16) * s + b)

    def bench(block_fn) -> float:
        @partial(jax.jit, static_argnames=("n",))
        def chained(params, x0, n):
            def body(_, x):
                y = x
                for p in params:
                    y = block_fn(y, p)
                return x + (jnp.tanh(jnp.sum(y)) * 1e-30).astype(x.dtype)

            return jnp.sum(jax.lax.fori_loop(0, n, body, x0)[0, 0, 0])

        x0 = jnp.asarray(rng.randn(args.bs, args.hw, args.hw, c) * 0.1, jnp.bfloat16)
        x1 = x0 + jnp.bfloat16(0.001)
        float(chained(blocks, x0, args.iters))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sv = float(chained(blocks, x1, args.iters))
            dt = time.perf_counter() - t0
            assert np.isfinite(sv)
            best = min(best, dt)
        return best / (args.iters * args.k) * 1e3

    # Parity first: the three forms must agree (fp reassociation only).
    import jax.numpy as jnp2

    xt = jnp.asarray(rng.randn(2, 32, 32, c) * 0.1, jnp.bfloat16)
    rb = np.asarray(block_base(xt, blocks[0]), np.float32)
    rd = np.asarray(block_dist(xt, blocks[0], False), np.float32)
    rd2 = np.asarray(block_dist(xt, blocks[0], True), np.float32)
    err_d = float(np.max(np.abs(rb - rd)))
    err_d2 = float(np.max(np.abs(rb - rd2)))
    print(f"parity: dist max|d|={err_d:.3e}  dist2 max|d|={err_d2:.3e}", flush=True)
    assert err_d < 0.05 and err_d2 < 0.05  # bf16 reassociation noise

    out = {"hw": args.hw, "bs": args.bs, "c": c, "parity_maxabs": {"dist": err_d, "dist2": err_d2}}
    for name, fn in [
        ("base", block_base),
        ("dist", lambda x, p: block_dist(x, p, False)),
        ("dist2", lambda x, p: block_dist(x, p, True)),
    ]:
        ms = bench(fn)
        out[name + "_ms_per_block"] = round(ms, 4)
        print(f"{name}: {ms:.4f} ms/block", flush=True)

    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
