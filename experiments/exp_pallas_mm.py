"""Raw Pallas vs XLA matmul rate at the conv-shaped sizes (bs-128 grid).

Is Mosaic's [6400,K]x[K,128] bf16 dot slow because K=128 underfills the MXU
pipeline? Sweep K and M to find where the knee is; XLA batched matmul at the
same shapes for reference.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, chain=16):
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


def pallas_mm(x, w):
    b, m, k = x.shape
    n = w.shape[1]

    def kern(x_ref, w_ref, o_ref):
        o_ref[0] = jnp.dot(x_ref[0], w_ref[...], preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, m, n), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, m, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(flops=2 * b * m * k * n, bytes_accessed=b * (m * k + m * n) * 2, transcendentals=0),
    )(x, w)


def xla_mm(x, w):
    return jnp.einsum("bmk,kn->bmn", x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    B = 128
    for m, k, n in ((6400, 128, 128), (6400, 512, 128), (3200, 512, 128), (1600, 512, 128), (1600, 512, 512)):
        x = jnp.asarray(rng.standard_normal((B, m, k)).astype(np.float32) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1, jnp.bfloat16)
        fl = 2 * B * m * k * n
        tp = timeit(pallas_mm, x, w)
        tx = timeit(xla_mm, x, w)
        print(f"M{m} K{k} N{n}: pallas {tp*1e3:7.3f} ms {fl/tp/1e12:6.1f} TF/s | xla {tx*1e3:7.3f} ms {fl/tx/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
