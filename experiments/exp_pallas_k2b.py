"""Variant matrix for the Pallas k2 probe: where do the 42 TF/s go?

v0: baseline (4 sliced taps, python loop, reshape to [6400,128])
v1: pure matmul, no slicing (1 tap, wrong math — upper bound for the dot)
v2: dot_general on 3D values (no reshape)
v3: 4-image blocks (amortize per-program overhead)
v4: batched dot_general over taps (one fused contraction)
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = ((0, 0), (0, 1), (1, 0), (1, 1))


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


def build(kernel, b, nimg=1, out_hw=80):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_hw, out_hw, 128), jnp.bfloat16),
        grid=(b // nimg,),
        in_specs=[
            pl.BlockSpec((nimg, 81, 81, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nimg, out_hw, out_hw, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * out_hw * out_hw * 128 * 512,
            bytes_accessed=b * (81 * 81 + out_hw * out_hw) * 128 * 2,
            transcendentals=b * out_hw * out_hw * 128,
        ),
    )


def k_v0(x_ref, w_ref, out_ref):
    acc = jnp.zeros((6400, 128), jnp.float32)
    for t, (di, dj) in enumerate(TAPS):
        xs = x_ref[0, di : di + 80, dj : dj + 80, :].reshape(6400, 128)
        acc = acc + jnp.dot(xs, w_ref[t], preferred_element_type=jnp.float32)
    y = acc * jax.nn.sigmoid(acc)
    out_ref[0] = y.reshape(80, 80, 128).astype(out_ref.dtype)


def k_v1(x_ref, w_ref, out_ref):
    # no slicing: same matmul count on an aligned view (wrong math, timing only)
    xs = x_ref[0, :80, :80, :].reshape(6400, 128)
    acc = jnp.zeros((6400, 128), jnp.float32)
    for t in range(4):
        acc = acc + jnp.dot(xs, w_ref[t], preferred_element_type=jnp.float32)
    y = acc * jax.nn.sigmoid(acc)
    out_ref[0] = y.reshape(80, 80, 128).astype(out_ref.dtype)


def k_v2(x_ref, w_ref, out_ref):
    acc = jnp.zeros((80, 80, 128), jnp.float32)
    for t, (di, dj) in enumerate(TAPS):
        xs = x_ref[0, di : di + 80, dj : dj + 80, :]
        acc = acc + jax.lax.dot_general(
            xs, w_ref[t], (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    y = acc * jax.nn.sigmoid(acc)
    out_ref[0] = y.astype(out_ref.dtype)


def k_v3(x_ref, w_ref, out_ref):
    for img in range(4):
        acc = jnp.zeros((6400, 128), jnp.float32)
        for t, (di, dj) in enumerate(TAPS):
            xs = x_ref[img, di : di + 80, dj : dj + 80, :].reshape(6400, 128)
            acc = acc + jnp.dot(xs, w_ref[t], preferred_element_type=jnp.float32)
        y = acc * jax.nn.sigmoid(acc)
        out_ref[img] = y.reshape(80, 80, 128).astype(out_ref.dtype)


def k_v4(x_ref, w_ref, out_ref):
    xs = jnp.stack(
        [x_ref[0, di : di + 80, dj : dj + 80, :].reshape(6400, 128) for (di, dj) in TAPS]
    )  # [4, 6400, 128]
    acc = jax.lax.dot_general(
        xs, w_ref[...], (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [4, 6400, 128]
    acc = jnp.sum(acc, axis=0)
    y = acc * jax.nn.sigmoid(acc)
    out_ref[0] = y.reshape(80, 80, 128).astype(out_ref.dtype)


def main():
    rng = np.random.RandomState(0)
    B = 128
    x = jnp.asarray(rng.standard_normal((B, 81, 81, 128)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((4, 128, 128)).astype(np.float32) * 0.05, jnp.bfloat16)
    fl = 2 * B * 6400 * 128 * 512

    for name, kern, nimg in (("v0 4-tap sliced", k_v0, 1), ("v1 no-slice", k_v1, 1),
                             ("v2 3D dot_general", k_v2, 1), ("v3 4-img block", k_v3, 4),
                             ("v4 batched taps", k_v4, 1)):
        try:
            fn = build(kern, B, nimg=nimg)
            t = timeit(fn, x, w)
            print(f"{name:18s}: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
