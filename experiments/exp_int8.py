"""Gate experiment for an int8 PTQ serving path: does XLA lower s8 x s8 -> s32
convolutions to the MXU at ~2x the bf16 rate on this chip (v5e spec: 394 TOPS
int8 vs 197 TF/s bf16), and what does the quantize/rescale overhead cost?

Times representative YOLOv10s conv shapes three ways:
  bf16      : conv(bf16, bf16)
  s8-core   : conv(s8, s8) -> s32 (pre-quantized operands; MXU ceiling)
  s8-e2e    : bf16 in -> quantize -> s8 conv -> rescale + SiLU -> bf16 out
              (what a quantized cba_apply would run per layer)
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 32


def timeit(fn, *args):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    s = float(np.asarray(fn(*args)).sum())
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt / CHAIN * 1e3


def conv(x, w, stride=1):
    pt = jnp.int32 if x.dtype == jnp.int8 else None
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((k // 2, k // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pt,
    )


def chain_conv(x, w, stride, post):
    @jax.jit
    def run(x, w):
        def body(_, c):
            x_, acc = c
            y = post(conv(x_, w, stride))
            return x_ + (y[0, 0, 0, 0] * 0).astype(x_.dtype), acc + y[0, 0, 0, 0].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (x, jnp.float32(0)))
        return acc
    return run


def main():
    rng = np.random.RandomState(0)
    B = 128
    shapes = [
        ("3x3 c64->c64 @160^2 s1", 160, 64, 64, 3, 1),
        ("3x3 c128->c128 @80^2 s1", 80, 128, 128, 3, 1),
        ("3x3 c128->c256 @80^2 s2", 80, 128, 256, 3, 2),
        ("3x3 c256->c256 @40^2 s1", 40, 256, 256, 3, 1),
        ("1x1 c256->c512 @40^2", 40, 256, 512, 1, 1),
        ("3x3 c512->c512 @20^2 s1", 20, 512, 512, 3, 1),
    ]
    for name, hw, ci, co, k, s in shapes:
        xb = jnp.asarray(rng.randn(B, hw, hw, ci), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(k, k, ci, co) * 0.05, jnp.bfloat16)
        xq = jnp.asarray(rng.randint(-127, 128, (B, hw, hw, ci)), jnp.int8)
        wq = jnp.asarray(rng.randint(-127, 128, (k, k, ci, co)), jnp.int8)
        sw = jnp.asarray(np.abs(rng.randn(co)) * 0.01, jnp.float32)

        t_bf16 = timeit(chain_conv(xb, wb, s, lambda y: y), xb, wb)

        def post_s32(y):
            return y.astype(jnp.bfloat16)

        t_s8 = timeit(chain_conv(xq, wq, s, post_s32), xq, wq)

        def e2e(x, w):
            q = jnp.clip(jnp.round(x.astype(jnp.float32) * 12.7), -127, 127).astype(jnp.int8)
            y = conv(q, w, s)
            return jax.nn.silu(y.astype(jnp.float32) * sw * (1 / 12.7)).astype(jnp.bfloat16)

        @jax.jit
        def run_e2e(x, w):
            def body(_, c):
                x_, acc = c
                y = e2e(x_, w)
                return x_ + (y[0, 0, 0, 0] * 0).astype(x_.dtype), acc + y[0, 0, 0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, CHAIN, body, (x, jnp.float32(0)))
            return acc

        run_e2e(xb, wq).block_until_ready()
        t0 = time.perf_counter()
        sv = float(np.asarray(run_e2e(xb, wq)).sum())
        t_e2e = (time.perf_counter() - t0) / CHAIN * 1e3
        assert np.isfinite(sv)

        gf = 2 * B * (hw // s) ** 2 * k * k * ci * co / 1e9
        print(
            f"{name}: bf16={t_bf16:.3f} ms ({gf/t_bf16:.0f} TF/s)  "
            f"s8-core={t_s8:.3f} ms ({gf/t_s8:.0f} TOP/s)  s8-e2e={t_e2e:.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
