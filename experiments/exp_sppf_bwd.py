"""Probe: Pallas maxpool2d_same backward vs XLA select-and-scatter.

The bs128 train profile shows the 3 SPPF maxpool backwards at 3.24 ms for
78.6 MB moved (11x the HBM bound) — select-and-scatter is
sequencing-limited, not bandwidth-limited, at 20x20 spatial. A Pallas
kernel holding the padded tile in VMEM does the 25-offset first-max routing
at the byte floor.

Semantics to reproduce EXACTLY (XLA's select-and-scatter with GE select):
dy of window o routes to the FIRST position (window-row-major) attaining
the window max. Validated here against jax.vjp of reduce_window on random
AND tie-heavy inputs, then timed.

Usage: python experiments/exp_sppf_bwd.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mp(x, k=5):
    pad = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


# ---------------------------------------------------------------- kernel
def _mpbwd_kernel(x_ref, dy_ref, dx_ref, xp_ref, dxp_ref, *, k: int):
    """One batch-block: x [BB,H,W,C], dy [BB,H,W,C] -> dx [BB,H,W,C].

    Routing rule: window o's dy goes to the first (row-major over the
    window) position attaining the max. Equivalently, per offset d in
    window order: mask_d = (x[o+d-pad] == wmax[o]) & not-yet-taken[o].
    dx[p] = sum_d shifted(dy * mask_d). xp_ref is a VMEM scratch holding
    x padded with -inf (Mosaic has no dynamic_update_slice on values;
    static-slice ref writes do the padding instead).
    """
    pad = k // 2
    bb, h, w, c = x_ref.shape
    xp_ref[:] = jnp.full((bb, h + 2 * pad, w + 2 * pad, c), -jnp.inf, jnp.float32)
    xp_ref[:, pad : pad + h, pad : pad + w, :] = x_ref[:].astype(jnp.float32)

    # window max over the k*k shifts
    wmax = jnp.full((bb, h, w, c), -jnp.inf, jnp.float32)
    for dh in range(k):
        for dw in range(k):
            wmax = jnp.maximum(wmax, xp_ref[:, dh : dh + h, dw : dw + w, :])

    dyf = dy_ref[:].astype(jnp.float32)
    taken = jnp.zeros((bb, h, w, c), jnp.bool_)
    # accumulate into the padded dx scratch in place (keeping 25 contrib
    # arrays live OOMs VMEM), then crop
    dxp_ref[:] = jnp.zeros((bb, h + 2 * pad, w + 2 * pad, c), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            xs = xp_ref[:, dh : dh + h, dw : dw + w, :]
            m = jnp.logical_and(xs == wmax, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, m)
            contrib = jnp.where(m, dyf, 0.0)
            dxp_ref[:, dh : dh + h, dw : dw + w, :] = (
                dxp_ref[:, dh : dh + h, dw : dw + w, :] + contrib
            )
    dx_ref[:] = dxp_ref[:, pad : pad + h, pad : pad + w, :].astype(dx_ref.dtype)


def mpbwd_pallas(x, dy, k=5, block_b=2):
    b, h, w, c = x.shape
    assert b % block_b == 0
    return pl.pallas_call(
        partial(_mpbwd_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_b, h + 2 * (k // 2), w + 2 * (k // 2), c), jnp.float32),
                        pltpu.VMEM((block_b, h + 2 * (k // 2), w + 2 * (k // 2), c), jnp.float32)],
    )(x, dy)


def main():
    rng = np.random.RandomState(0)
    shape = (128, 20, 20, 256)
    k = 5

    # --- correctness: random + heavy ties, bf16 and f32 ---
    for dtype, tieround in ((jnp.float32, False), (jnp.bfloat16, False), (jnp.float32, True), (jnp.bfloat16, True)):
        xnp = rng.randn(8, 20, 20, 256).astype(np.float32)
        if tieround:
            xnp = np.round(xnp * 2) / 2  # force many exact ties
        x = jnp.asarray(xnp, dtype)
        dy = jnp.asarray(rng.randn(*x.shape), dtype)
        ref = jax.vjp(lambda t: mp(t, k), x)[1](dy)[0]
        got = mpbwd_pallas(x, dy, k=k, block_b=2)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        exact = bool(jnp.all(ref == got))
        print(f"dtype={dtype.__name__} ties={tieround}: max_abs_err={err:.3e} exact={exact}")

    # --- timing at the SPPF shape (chained dependence, host readback) ---
    x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    dy = jnp.asarray(rng.randn(*shape), jnp.bfloat16)

    @jax.jit
    def t_xla(x, dy, iters):
        def body(i, acc):
            g = jax.vjp(lambda t: mp(t, k), x + (acc * 0).astype(x.dtype))[1](dy)[0]
            return acc + jnp.float32(g[0, 0, 0, 0])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def t_pal(x, dy, iters):
        def body(i, acc):
            g = mpbwd_pallas(x + (acc * 0).astype(x.dtype), dy, k=k)
            return acc + jnp.float32(g[0, 0, 0, 0])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    for name, fn in (("xla_sas", t_xla), ("pallas", t_pal)):
        fn(x, dy, 3).block_until_ready()
        n = 50
        t0 = time.perf_counter()
        fn(x, dy, n).block_until_ready()
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {dt:.3f} ms per bwd at {shape}")


if __name__ == "__main__":
    main()
