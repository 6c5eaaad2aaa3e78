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


def _pack_bf16_desc(x: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving s32 keys: descending key order == (value desc, index asc).

    bf16 bits map to an order-preserving u16 (flip all bits for negatives,
    set the sign bit for positives — the standard IEEE radix trick), biased
    into the signed range for the high 16 bits; the low 16 bits carry the
    complemented position so lax.top_k's tie rule (equal values -> ascending
    index) survives a plain descending comparison. Key gaps are >= 65536
    between distinct values, so the index field can never reorder values.

    -0.0 is canonicalized to +0.0 first (x + 0.0 is the IEEE identity for
    every other value, incl. NaN/inf): the radix trick orders the two zero
    bit patterns apart, but numeric comparison ties them, so without the
    canonicalization a {-0.0, +0.0} tie would resolve to the +0.0 slot
    instead of the first occurrence. After it, both zeros share one key and
    the index field restores the exact first-occurrence rule. (Unpacked
    values consequently report +0.0 where the source held -0.0 — numerically
    equal.)
    """
    x = x + jnp.zeros((), x.dtype)  # -0.0 -> +0.0; identity elsewhere
    bits = jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.int32)
    key = jnp.where(bits >= 0x8000, 0xFFFF - bits, bits + 0x8000)  # u16, ascending
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return (key - 32768) * 65536 + (32767 - idx)


def _unpack_bf16_desc(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    key = (packed >> 16) + 32768
    bits = jnp.where(key >= 0x8000, key - 0x8000, 0xFFFF - key).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16), 32767 - (packed & 0xFFFF)


def _topk_packed_bf16(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked top-k over single s32 keys (value+index packed).

    A variadic (value, iota) sort moves two tensors through the sort network
    and needs index gathers at the merge; packing makes every stage ONE
    lax.sort over s32 and the final unpack is elementwise — measured ~2x
    faster per stage on the decode shapes ([128,8400] / [128,24000], k=300).
    """
    n = x.shape[-1]
    packed = _pack_bf16_desc(x)
    block = _pick_block(n, k)
    if block and n // block >= 2:
        nb = n // block
        ps = jax.lax.sort(packed.reshape(x.shape[:-1] + (nb, block)), dimension=-1, is_stable=False)
        cand = jax.lax.rev(ps[..., block - k:], (ps.ndim - 1,)).reshape(x.shape[:-1] + (nb * k,))
        top = jax.lax.sort(cand, dimension=-1, is_stable=False)[..., nb * k - k:]
    else:
        top = jax.lax.sort(packed, dimension=-1, is_stable=False)[..., n - k:]
    return _unpack_bf16_desc(jax.lax.rev(top, (top.ndim - 1,)))


def max_argmax_lastdim(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused (max, argmax) over the last dimension in ONE reduce pass.

    For bf16 inputs the value and its index share one packed s32 key
    (`_pack_bf16_desc`), so a single max-reduce yields both — the packing
    arithmetic fuses into the reduce's operand, where separate max + argmax
    reduces cost a second full pass over the source (measured +1.25 ms/batch
    on the decode_nms candidate stage at [128,8400,80] bf16,
    experiments/exp_nms_anatomy.py). Tie rule matches jnp.argmax exactly
    (first occurrence): key order is (value desc, index asc), with -0.0
    canonicalized to +0.0 at pack time so a signed-zero tie also resolves
    to the first occurrence (the returned max is then +0.0, numerically
    equal to jnp.max's).

    Non-bf16 inputs fall back to the two-reduce form.
    """
    if x.dtype == jnp.bfloat16 and x.shape[-1] <= 32768:
        best = jnp.max(_pack_bf16_desc(x), axis=-1)
        vals, idx = _unpack_bf16_desc(best)
        return vals, idx.astype(jnp.int32)
    return jnp.max(x, axis=-1), jnp.argmax(x, axis=-1).astype(jnp.int32)


def topk_membership(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Boolean top-k membership mask over the last dimension (no ordering).

    Equivalent to scattering `topk_lastdim(x, k)[1]` into a presence mask,
    with the same tie rule (equal values admitted in ascending index order,
    matching lax.top_k). When only the SET of winners is needed — TAL's
    candidate counting — k rounds of argmax + masking beat any sort: no
    (value, index) variadic sort and no index materialization (measured
    9.3 -> 3.0 ms on [128,16,8400] f32 k=10, experiments/exp_topk_tal.py).
    jnp.argmax returns the first occurrence, so ties resolve identically.
    """
    n = x.shape[-1]
    if k >= n:
        return jnp.ones(x.shape, bool)
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min, x.dtype)
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(_, carry):
        sel, xm = carry
        hit = jnp.argmax(xm, axis=-1)[..., None] == iota
        return sel | hit, jnp.where(hit, neg, xm)

    # Unrolled rather than lax.fori_loop: k is small and static (TAL k=10),
    # and an XLA while-loop body compiles standalone so each round writes
    # the masked xm back. Unrolled, round i+1's argmax fuses the round-i
    # select into its reduce (train-step while op 6.5 ms -> 0; ~1 ms net
    # after the argmax reads redistribute into fusions).
    carry = (jnp.zeros(x.shape, bool), x)
    for _ in range(k):
        carry = body(None, carry)
    return carry[0]


def topk_lastdim(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k (values, int32 indices) over the last dimension."""
    n = x.shape[-1]
    if k == 1:
        return (
            jnp.max(x, axis=-1, keepdims=True),
            jnp.argmax(x, axis=-1, keepdims=True).astype(jnp.int32),
        )
    if k >= n:
        return jax.lax.top_k(x, k)
    if x.dtype == jnp.bfloat16 and n <= 32768:
        return _topk_packed_bf16(x, k)
    block = _pick_block(n, k)
    if block == 0 or n // block < 2:
        return jax.lax.top_k(x, k)
    nb = n // block
    xr = x.reshape(x.shape[:-1] + (nb, block))
    v, i = jax.lax.top_k(xr, k)  # [..., nb, k]
    base = (jnp.arange(nb, dtype=jnp.int32) * block)[:, None]
    gidx = (i + base).reshape(x.shape[:-1] + (nb * k,))
    v2, i2 = jax.lax.top_k(v.reshape(x.shape[:-1] + (nb * k,)), k)
    return v2, jnp.take_along_axis(gidx, i2, axis=-1)
