"""TAL only consumes the top-k membership SET per (B, N) row (the indices feed
a one-hot count), so the variadic (f32 value, s32 index) sort can be replaced:

  A) current topk_lastdim (blocked variadic sort) -> one-hot count
  B) single-tensor unstable f32 sort for the k-th threshold, then
     membership = (v > thr) | (v == thr and tie_rank < k - n_greater)
     with tie_rank = exclusive cumsum of (v == thr)  [first-occurrence ties]
  C) k rounds of iterative argmax with masking        [first-occurrence ties]

All three give identical membership (lax.top_k keeps ascending index order for
equal values, i.e. first occurrences win ties).
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from leanyolo_tpu.ops.topk import topk_lastdim

B, N, A, K = 128, 16, 8400, 10
CHAIN = 16


def member_current(x):
    _, idxs = topk_lastdim(x, K)
    return jnp.sum(jax.nn.one_hot(idxs, A, dtype=jnp.int32), axis=-2) > 0


def member_threshold(x):
    blk = 1680
    nb = A // blk
    s = jax.lax.sort(x.reshape(x.shape[:-1] + (nb, blk)), dimension=-1, is_stable=False)
    cand = s[..., blk - K :].reshape(x.shape[:-1] + (nb * K,))
    topv = jax.lax.sort(cand, dimension=-1, is_stable=False)[..., nb * K - K :]
    thr = topv[..., 0:1]  # k-th largest value
    greater = x > thr
    n_greater = jnp.sum(greater, axis=-1, keepdims=True)
    eq = x == thr
    tie_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1) - eq.astype(jnp.int32)
    return greater | (eq & (tie_rank < K - n_greater))


def member_iter_argmax(x):
    neg = jnp.asarray(-jnp.inf, x.dtype)

    def body(_, carry):
        sel, xm = carry
        am = jnp.argmax(xm, axis=-1)
        hit = am[..., None] == jnp.arange(A, dtype=am.dtype)
        return sel | hit, jnp.where(hit, neg, xm)

    sel0 = jnp.zeros(x.shape, bool)
    sel, _ = jax.lax.fori_loop(0, K, body, (sel0, x))
    return sel


def timed(body, x):
    @jax.jit
    def run(x):
        def step(_, c):
            x_, acc = c
            m = body(x_)
            return x_ + (jnp.sum(m).astype(x_.dtype) * 1e-30), acc + jnp.sum(m[0, 0].astype(jnp.int32))
        _, acc = jax.lax.fori_loop(0, CHAIN, step, (x, jnp.int32(0)))
        return acc

    run(x).block_until_ready()
    t0 = time.perf_counter()
    s = int(np.asarray(run(x)))
    dt = (time.perf_counter() - t0) / CHAIN * 1e3
    return dt, s


def main():
    rng = np.random.RandomState(0)
    x_np = np.abs(rng.randn(B, N, A)).astype(np.float32)
    # inject exact ties to stress the tie rule
    x_np[:, :, 100:110] = x_np[:, :, 200:210] = 3.0
    x_np[:, 2] = 0.5  # whole-row constant: all-tie row
    x = jnp.asarray(x_np)

    a = np.asarray(member_current(x))
    b = np.asarray(member_threshold(x))
    c = np.asarray(member_iter_argmax(x))
    print("threshold == current:", bool((a == b).all()), " iter == current:", bool((a == c).all()))
    print("per-row count == K everywhere:", bool((a.sum(-1) == K).all()))

    for name, fn in [("current-variadic", member_current), ("threshold", member_threshold), ("iter-argmax", member_iter_argmax)]:
        dt, _ = timed(fn, x)
        print(f"{name}: {dt:.3f} ms")


if __name__ == "__main__":
    main()
