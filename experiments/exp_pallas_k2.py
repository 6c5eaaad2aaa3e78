"""Probe: Pallas k2-VALID conv on the S2D form vs XLA, bs128.

exp_s2d.py showed XLA reaches only ~53 TF/s on the lane-dense S2D form
(k2 VALID [81,81,128]->128), where the shape is 4 perfectly MXU-sized
matmuls ([6400,128]x[128,128] per tap). If a hand kernel can run those at
near-peak with pipelined per-image blocks, a fused bottleneck-pair kernel
could beat the in-model dense c32 chain. This probe times the single conv:
go/no-go for the whole direction.

Kernel: grid over batch; per image the [82,82,128] block (1-row/col halo,
pad-shifted S2D) sits in VMEM, 4 tap matmuls accumulate in f32, SiLU
epilogue, bf16 out. Slices: offsets on rows (major) and w (sublane, offsets
free, size 80 = 8-aligned), lanes untouched.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, out_ref, acc_ref):
    # x_ref: [1, 81, 81, 128] bf16; w_ref: [4, 128, 128] bf16 (tap-major)
    # out_ref: [1, 80, 80, 128] bf16; acc_ref: [6400, 128] f32 scratch
    acc = jnp.zeros((6400, 128), jnp.float32)
    for t, (di, dj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xs = x_ref[0, di : di + 80, dj : dj + 80, :]
        xs = xs.reshape(6400, 128)
        acc = acc + jnp.dot(xs, w_ref[t], preferred_element_type=jnp.float32)
    y = acc * jax.nn.sigmoid(acc)
    out_ref[0] = y.reshape(80, 80, 128).astype(out_ref.dtype)


def pallas_k2(x, w_taps):
    b = x.shape[0]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, 80, 80, 128), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 81, 81, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 80, 80, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((6400, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 6400 * 128 * 512, bytes_accessed=b * (81 * 81 + 80 * 80) * 128 * 2, transcendentals=b * 6400 * 128
        ),
    )(x, w_taps)


def xla_k2(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def timeit(fn, *args, chain=32):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(x, n, *rest):
        def body(_, x):
            y = fn(x, *rest)
            return x + (jnp.sum(y) * 1e-30).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(x.reshape(-1)[0])

    x0 = args[0]
    x1 = x0 + jnp.asarray(1e-3, x0.dtype)
    float(chained(x0, chain, *args[1:]))
    t0 = time.perf_counter()
    s = float(chained(x1, chain, *args[1:]))
    dt = (time.perf_counter() - t0) / chain
    assert np.isfinite(s)
    return dt


def main():
    rng = np.random.RandomState(0)
    B = 128
    x = jnp.asarray(rng.standard_normal((B, 81, 81, 128)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((2, 2, 128, 128)).astype(np.float32) * 0.05, jnp.bfloat16)
    w_taps = w.reshape(4, 128, 128)

    # correctness first (bf16 tolerance)
    small = x[:2]
    ref = xla_k2(small, w)
    got = pallas_k2(small, w_taps)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"max abs err vs XLA: {err:.5f}")
    assert err < 0.15, "pallas kernel mismatch"

    fl = 2 * B * 6400 * 128 * 512
    t = timeit(xla_k2, x, w)
    print(f"XLA    k2 VALID [81,81,128]->128: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")
    t = timeit(pallas_k2, x, w_taps)
    print(f"Pallas k2 VALID [81,81,128]->128: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
