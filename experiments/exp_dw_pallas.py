"""Probe: Pallas VPU kernel for the fused RepVGGDW 7x7 depthwise conv.

PERF.md "Inference-step closure" names the last addressable residue of the
serving step: the two fused RepVGGDW 7x7 DEPTHWISE convs ([128,20,20,512],
fgc=512) are VPU-compute-bound (no contraction dim for the MXU) and sit at
~0.65 ms each, ~2x their ~0.33 ms VPU-peak FLOP time. This probe asks
whether a hand Pallas schedule beats XLA's VPU code for the exact serving
op (conv + bias + SiLU, pad 3, stride 1, bf16 in/out, f32 accumulate).

Design (see PERF.md for the ruling): one grid step per image; zero-pad the
[20,20,512] block into a [26,26,512] VMEM scratch (one unaligned-sublane
store); precompute the 7 W-shifted copies ONCE (7 unaligned-sublane reads)
so all 49 tap FMAs become aligned reads — H is an untiled dim, so the
kh-slice is free. Two accumulation variants:
  A: explicit VMEM accumulator ref (49 read-modify-writes)
  B: one value-graph sum (Mosaic schedules vreg reuse)

Oracle: lax.conv_general_dilated with feature_group_count=C (the product
path, layers.py::conv2d) + bias + SiLU. Timing: chained fori_loop with a
data dependence + scalar readback (bench.py measurement notes).

Usage: python experiments/exp_dw_pallas.py [--chain 50]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, K = 128, 20, 20, 512, 7
PAD = K // 2
HP, WP = H + 2 * PAD, W + 2 * PAD


def _kernel(x_ref, w_ref, b_ref, o_ref, p_ref, s_ref, acc_ref, *, variant: str):
    # x_ref [1,H,W,C] bf16; w_ref [K*K, C] f32; b_ref [1, C] f32.
    p_ref[:] = jnp.zeros(p_ref.shape, p_ref.dtype)
    p_ref[PAD:PAD + H, PAD:PAD + W, :] = x_ref[0]
    if variant != "C":
        for kw in range(K):  # 7 unaligned reads instead of 49
            s_ref[kw] = p_ref[:, kw:kw + W, :]
    if variant == "C":
        # Direct 49 unaligned-sublane tap reads from the padded scratch —
        # no shift-copy stage, no shifted scratch traffic.
        y = b_ref[0][None, None, :].astype(jnp.float32) * jnp.ones((H, W, C), jnp.float32)
        for kh in range(K):
            for kw in range(K):
                y = y + p_ref[kh:kh + H, kw:kw + W, :].astype(jnp.float32) * w_ref[kh * K + kw][None, None, :]
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)
        return
    if variant == "A":
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        for kh in range(K):
            for kw in range(K):
                acc_ref[:] += (
                    s_ref[kw, kh:kh + H].astype(jnp.float32)
                    * w_ref[kh * K + kw][None, None, :]
                )
        y = acc_ref[:] + b_ref[0][None, None, :]
    else:
        y = b_ref[0][None, None, :].astype(jnp.float32) * jnp.ones((H, W, C), jnp.float32)
        for kh in range(K):
            for kw in range(K):
                y = y + s_ref[kw, kh:kh + H].astype(jnp.float32) * w_ref[kh * K + kw][None, None, :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def dw_pallas(x, w_hwio, bias, *, variant: str = "A"):
    """x [B,H,W,C] bf16, w [7,7,1,C] f32, bias [C] f32 -> bf16 [B,H,W,C]."""
    w2 = w_hwio.reshape(K * K, C).astype(jnp.float32)
    b2 = bias.reshape(1, C).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0],),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HP, WP, C), jnp.bfloat16),
            pltpu.VMEM((K, HP, W, C), jnp.bfloat16),
            pltpu.VMEM((H, W, C), jnp.float32),
        ],
    )(x, w2, b2)


def dw_xla(x, w_hwio, bias):
    y = jax.lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype), (1, 1), ((PAD, PAD), (PAD, PAD)),
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + bias.astype(x.dtype)
    return jax.nn.silu(y)


def timed(fn, x, w, b, chain: int) -> float:
    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(x0, w_, b_, n):
        def body(_, xc):
            y = fn(xc, w_, b_)
            # Renormalize to unit variance so the data dependence stays
            # non-degenerate over long chains (with 0.1-scaled weights the
            # activations otherwise decay toward zero; TPU timing is
            # data-independent, but keep the chained values meaningful).
            return y / jnp.sqrt(jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-6).astype(y.dtype)
        out = jax.lax.fori_loop(0, n, body, x0)
        return jnp.sum(out[0, 0, 0].astype(jnp.float32))

    float(chained(x, w, b, chain))  # compile + warm
    best = float("inf")
    for _ in range(3):  # min over repeats: one sample is noise-prone
        t0 = time.perf_counter()
        s = float(chained(x, w, b, chain))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(s)
    return best / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, K, 1, C).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

    ref = np.asarray(dw_xla(x, w, b), np.float32)
    for variant in ("A", "B", "C"):
        got = np.asarray(jax.jit(functools.partial(dw_pallas, variant=variant))(x, w, b), np.float32)
        err = np.max(np.abs(got - ref))
        print(f"variant {variant}: max_abs_err vs XLA = {err:.3e}")
        assert err < 1e-1, "bf16 out: expect <= a few LSB"

    t_xla = timed(dw_xla, x, w, b, args.chain)
    print(f"XLA   conv+bias+silu: {t_xla*1e3:.3f} ms/step")
    for variant in ("A", "B", "C"):
        t_p = timed(functools.partial(dw_pallas, variant=variant), x, w, b, args.chain)
        print(f"Pallas variant {variant}: {t_p*1e3:.3f} ms/step  ({t_xla/t_p:.2f}x vs XLA)")


if __name__ == "__main__":
    main()
