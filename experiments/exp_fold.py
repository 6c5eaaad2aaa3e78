"""Experiment: does batch-folding beat the lane-padding tax on c<128 convs?

Round-1 root cause: TPU layouts pad the channel (lane) dim to 128, so convs
with C<128 move 2-4x the real bytes. Batch-folding packs g images' channels
together: x[B,H,W,C] -> x[B/g,H,W,g*C] and the conv becomes grouped
(feature_group_count=g) with weights tiled per group. Same real bytes, but
lane-dense at g*C=128.

Timing: chained fori_loop with data dependence + host readback (axon rules).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


def timeit(fn, *args, chain=32):
    @partial(jax.jit, static_argnames=("n",))
    def chained(x, n, *rest):
        def body(_, x):
            y = fn(x, *rest)
            return x + (jnp.sum(y) * 1e-30).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(x.reshape(-1)[0])

    x0 = args[0]
    x1 = x0 + jnp.asarray(1e-3, x0.dtype)
    float(chained(x0, chain, *args[1:]))  # compile+warm
    t0 = time.perf_counter()
    s = float(chained(x1, chain, *args[1:]))
    dt = (time.perf_counter() - t0) / chain
    assert np.isfinite(s)
    return dt


def conv(x, w, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=DN,
        feature_group_count=groups, preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def silu_conv(x, w, stride=1, groups=1):
    y = conv(x, w, stride, groups)
    return y * jax.nn.sigmoid(y)


def main():
    rng = np.random.RandomState(0)
    B = 128

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32), jnp.bfloat16)

    print("== k3 s1 conv @160^2, c32->c32, B=128 (bytes_real in+out = 419MB) ==")
    x = mk((B, 160, 160, 32))
    w = mk((3, 3, 32, 32))
    t = timeit(silu_conv, x, w)
    print(f"dense c32         : {t*1e3:8.3f} ms  {419e6/t/1e9:7.1f} GB/s-real")

    g = 4
    xf = mk((B // g, 160, 160, 32 * g))
    wg = mk((3, 3, 32, 32 * g))
    t = timeit(partial(silu_conv, groups=g), xf, wg)
    print(f"folded g=4 grouped: {t*1e3:8.3f} ms  {419e6/t/1e9:7.1f} GB/s-real")

    wd = mk((3, 3, 128, 128))
    t = timeit(silu_conv, xf, wd)
    print(f"folded g=4 dense  : {t*1e3:8.3f} ms  {419e6/t/1e9:7.1f} GB/s-real")

    print("== k3 s1 conv @160^2, c64->c64, B=128 (838MB real) ==")
    x = mk((B, 160, 160, 64))
    w = mk((3, 3, 64, 64))
    t = timeit(silu_conv, x, w)
    print(f"dense c64         : {t*1e3:8.3f} ms  {838e6/t/1e9:7.1f} GB/s-real")
    g = 2
    xf = mk((B // g, 160, 160, 64 * g))
    wg = mk((3, 3, 64, 64 * g))
    t = timeit(partial(silu_conv, groups=g), xf, wg)
    print(f"folded g=2 grouped: {t*1e3:8.3f} ms  {838e6/t/1e9:7.1f} GB/s-real")
    t = timeit(silu_conv, xf, mk((3, 3, 128, 128)))
    print(f"folded g=2 dense  : {t*1e3:8.3f} ms  {838e6/t/1e9:7.1f} GB/s-real")

    print("== stem conv0: k3 s2 3->32 @640->320, B=128 (315+839=1154MB real fp-in) ==")
    x = mk((B, 640, 640, 3))
    w = mk((3, 3, 3, 32))
    t = timeit(partial(silu_conv, stride=2), x, w)
    print(f"dense c3->c32     : {t*1e3:8.3f} ms  {1154e6/t/1e9:7.1f} GB/s-real")
    g = 4
    xf = mk((B // g, 640, 640, 3 * g))
    wg = mk((3, 3, 3, 32 * g))
    t = timeit(partial(silu_conv, stride=2, groups=g), xf, wg)
    print(f"folded g=4 grouped: {t*1e3:8.3f} ms  {1154e6/t/1e9:7.1f} GB/s-real")

    print("== stem conv1: k3 s2 32->64 @320->160, B=128 (839+419=1258MB real) ==")
    x = mk((B, 320, 320, 32))
    w = mk((3, 3, 32, 64))
    t = timeit(partial(silu_conv, stride=2), x, w)
    print(f"dense c32->c64    : {t*1e3:8.3f} ms  {1258e6/t/1e9:7.1f} GB/s-real")
    g = 4
    xf = mk((B // g, 320, 320, 32 * g))
    wg = mk((3, 3, 32, 64 * g))
    t = timeit(partial(silu_conv, stride=2, groups=g), xf, wg)
    print(f"folded g=4 grouped: {t*1e3:8.3f} ms  {1258e6/t/1e9:7.1f} GB/s-real")

    print("== fold/unfold transpose cost ==")
    x = mk((B, 640, 640, 3))

    def fold(x, g=4):
        b, h, wd, c = x.shape
        return x.reshape(b // g, g, h, wd, c).transpose(0, 2, 3, 1, 4).reshape(b // g, h, wd, g * c)

    t = timeit(fold, x)
    print(f"fold [128,640,640,3]->g4  : {t*1e3:8.3f} ms")
    y = mk((B // 4, 80, 80, 512))

    def unfold(y, g=4):
        bg, h, wd, gc = y.shape
        return y.reshape(bg, h, wd, g, gc // g).transpose(0, 3, 1, 2, 4).reshape(bg * g, h, wd, gc // g)

    t = timeit(unfold, y)
    print(f"unfold [32,80,80,512]->128: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
