"""Exact top-k that avoids TPU's slow full-sort / TopK lowerings.

`jax.lax.top_k` on TPU lowers to either a complete variadic sort of the last
dimension or a TopK custom call — measured 8.3 ms for [128, 8400] k=300 and
29.5 ms for [128, 24000] k=300 (experiments/exp_topk.py). Selecting top-k
within fixed blocks first and merging the per-block winners is 5-12x faster
and EXACT:

- every global top-k element is a top-k element of its block (k <= block);
- lax.top_k's tie rule (equal values -> ascending index) is preserved at
  both stages because the block stage emits candidates in ascending global
  index order among equal values and the merge stage is stable.

k == 1 short-circuits to max/argmax (argmax picks the first maximum — the
same tie rule).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pick_block(n: int, k: int) -> int:
    """Largest divisor of n in [k, 2048], or 0 if none usable."""
    best = 0
    for d in range(1, int(n**0.5) + 1):
        if n % d == 0:
            for cand in (d, n // d):
                if k <= cand <= 2048 and cand < n and cand > best:
                    best = cand
    return best


def topk_lastdim(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k (values, int32 indices) over the last dimension."""
    n = x.shape[-1]
    if k == 1:
        return (
            jnp.max(x, axis=-1, keepdims=True),
            jnp.argmax(x, axis=-1, keepdims=True).astype(jnp.int32),
        )
    block = _pick_block(n, k)
    if k >= n or block == 0 or n // block < 2:
        return jax.lax.top_k(x, k)
    nb = n // block
    xr = x.reshape(x.shape[:-1] + (nb, block))
    v, i = jax.lax.top_k(xr, k)  # [..., nb, k]
    base = (jnp.arange(nb, dtype=jnp.int32) * block)[:, None]
    gidx = (i + base).reshape(x.shape[:-1] + (nb * k,))
    v2, i2 = jax.lax.top_k(v.reshape(x.shape[:-1] + (nb * k,)), k)
    return v2, jnp.take_along_axis(gidx, i2, axis=-1)
