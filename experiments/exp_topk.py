"""Experiment: stage-2 top-k alternatives on [128, 24000] bf16 -> top 300.

The TopK custom call costs 3.0 ms in the bs128 forward profile (processing
only 6 MB). Candidates: full sort + slice, per-block topk then merge,
approx_max_k, and float32 input.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, chain=64):
    @partial(jax.jit, static_argnames=("n",))
    def chained(x, n):
        def body(_, carry):
            x, acc = carry
            v, i = fn(x)
            return (x + (jnp.sum(v.astype(jnp.float32)) * 1e-30).astype(x.dtype), acc + jnp.sum(i))

        x, acc = jax.lax.fori_loop(0, n, body, (x, jnp.zeros((), jnp.int64) if False else jnp.zeros((), jnp.int32)))
        return jnp.sum(x[0, :4]) + acc.astype(x.dtype)

    float(chained(x, chain))
    t0 = time.perf_counter()
    s = float(chained(x + jnp.asarray(0.001, x.dtype), chain))
    dt = (time.perf_counter() - t0) / chain
    assert np.isfinite(s)
    return dt


def main():
    rng = np.random.RandomState(0)
    B, N, K = 128, 24000, 300
    xf = jnp.asarray(rng.randn(B, N).astype(np.float32))
    xb = xf.astype(jnp.bfloat16)

    def topk(x):
        return jax.lax.top_k(x, K)

    def sort_slice(x):
        n = x.shape[-1]
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), x.shape)
        sv, si = jax.lax.sort_key_val(-x, idx, dimension=-1)
        return -sv[..., :K], si[..., :K]

    def blocked(x, nb=8):
        # top-K within each of nb blocks (guaranteed superset of global top-K
        # only if K <= block size; exact merge via second top-K over nb*K).
        b, n = x.shape
        xr = x.reshape(b, nb, n // nb)
        v, i = jax.lax.top_k(xr, K)  # [B, nb, K]
        base = (jnp.arange(nb, dtype=jnp.int32) * (n // nb))[None, :, None]
        v2, i2 = jax.lax.top_k(v.reshape(b, nb * K), K)
        gi = jnp.take_along_axis((i + base).reshape(b, nb * K), i2, axis=1)
        return v2, gi

    def approx(x):
        return jax.lax.approx_max_k(x, K)

    for name, fn, x in [
        ("lax.top_k bf16", topk, xb),
        ("lax.top_k f32 ", topk, xf),
        ("sort+slice bf16", sort_slice, xb),
        ("blocked8 bf16  ", blocked, xb),
        ("blocked8 f32   ", blocked, xf),
        ("approx bf16    ", approx, xb),
    ]:
        try:
            dt = timeit(fn, x)
            # correctness vs reference topk on values
            want, _ = jax.lax.top_k(x, K)
            got, _ = fn(x)
            ok = bool(jnp.all(want == got)) if name.strip() != "approx bf16" else "n/a"
            print(f"{name}: {dt*1e3:7.3f} ms  exact_vals={ok}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")

    # stage-1 shape too
    x1 = jnp.asarray(rng.randn(B, 8400).astype(np.float32)).astype(jnp.bfloat16)
    for name, fn in [("s1 top_k", topk), ("s1 blocked8", blocked), ("s1 sort", sort_slice)]:
        dt = timeit(fn, x1)
        print(f"{name} [128,8400]: {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
