"""Measure row-gather strategies for decode's winner-row selection on TPU.

take_along_axis on [B, HW, C] lowers to a gather custom-call that (a) needs a
row-major layout copy of the whole source and (b) reads scattered 160-byte
rows. A one-hot dot reads the source once sequentially and runs the selection
on the MXU. This experiment times both on the decode shapes.
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

B, K = 128, 300
CHAIN = 32


def timed(fn, *args):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    r = fn(*args)
    s = float(np.asarray(r).sum())
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt / CHAIN * 1e3


def chain(body, x, idx):
    @jax.jit
    def run(x, idx):
        def step(_, carry):
            x_, acc = carry
            g = body(x_, idx)
            return x_ + (jnp.tanh(jnp.sum(g)) * 1e-30).astype(x_.dtype), acc + g[0, 0, 0].astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, CHAIN, step, (x, jnp.float32(0)))
        return acc

    return run


def gather_taa(x, idx):
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def gather_onehot(x, idx):
    hw = x.shape[1]
    oh = (idx[..., None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, hw), 2)).astype(x.dtype)
    return jax.lax.dot_general(
        oh, x, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    for hw, c in [(6400, 80), (1600, 80), (400, 80)]:
        x = jnp.asarray(rng.randn(B, hw, c), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, hw, (B, K)), jnp.int32)
        # parity
        a = np.asarray(gather_taa(x, idx), np.float32)
        b = np.asarray(gather_onehot(x, idx), np.float32)
        err = np.abs(a - b).max()
        t_taa = timed(chain(gather_taa, x, idx), x, idx)
        t_oh = timed(chain(gather_onehot, x, idx), x, idx)
        print(f"[{B},{hw},{c}] k={K}: take_along={t_taa:.3f} ms  onehot-dot={t_oh:.3f} ms  maxerr={err:.2e}")


if __name__ == "__main__":
    main()
