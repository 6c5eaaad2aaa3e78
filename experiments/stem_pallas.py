"""Pallas fused stem kernel: conv0 + BN/SiLU + conv1 + BN/SiLU in one pass.

The YOLOv10 stem (reference: backbone.py:68-69 — two k3 s2 convs) is the
most memory-bound span of the network: XLA runs it as two separate convs
with an HBM round-trip of the half-resolution intermediate (~210 MB at
batch 32, 640px). This kernel keeps the intermediate in VMEM: the image is
read from HBM once and only the quarter-resolution stem output is written.

Mechanics:
- stride-2 3x3 convs become stride-1 2x2 "block" convs on space-to-depth
  inputs via the zero-padded-4x4 kernel split (standard MLPerf-ResNet TPU
  trick); tap contractions run as dense MXU matmuls;
- host-side prep (`prepare_stem_params`) folds input normalization
  (x - sub) / div into conv0's weights/bias, so the kernel consumes raw
  pixels;
- the grid tiles over (batch, row-strips); strips are non-overlapping
  BlockSpec blocks and the 3-row bottom halo arrives as a second, explicit
  input (Mosaic's HBM DMA requires 128-aligned lane slices, so manual
  halo DMA of 12-channel data is not expressible — BlockSpec pipelining
  handles narrow lanes fine).

Mosaic constraints encoded here (probed empirically on v5e):
- slice sizes on the sublane (width) dim must be 8-aligned -> padded widths;
- strided slices and lane-dim concat of offset slices are unsupported ->
  space-to-depth phases via reshape-split + scalar phase indexing;
- in-kernel HBM DMA needs 128-aligned lane slices -> BlockSpec + halo input.

Exactness: identical math to the reference stem up to bf16/f32 rounding;
parity is tested in tests/test_stem_pallas.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class StemParams(NamedTuple):
    w0: jnp.ndarray  # [2, 2, 4*c_img, c0] block-conv weights for conv0
    b0: jnp.ndarray  # [c0]
    w1: jnp.ndarray  # [2, 2, 4*c0, c1] block-conv weights for conv1
    b1: jnp.ndarray  # [c1]


def _s2d_weight(w: np.ndarray) -> np.ndarray:
    """k3 HWIO kernel -> [2, 2, 4*cin, cout] block kernel (zero-padded 4x4 split)."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    wp = np.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    wb = wp.reshape(2, 2, 2, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return wb.reshape(2, 2, 4 * cin, cout)


def prepare_stem_params(
    cv0_w: np.ndarray,  # [3, 3, c_img, c0] HWIO (BN-folded)
    cv0_b: np.ndarray,  # [c0]
    cv1_w: np.ndarray,  # [3, 3, c0, c1] HWIO (BN-folded)
    cv1_b: np.ndarray,  # [c1]
    *,
    input_subtract: np.ndarray,  # [c_img]
    input_divide: np.ndarray,  # [c_img]
    dtype=jnp.bfloat16,
) -> StemParams:
    """Fold input normalization into conv0 and build block-conv weights."""
    cv0_w = np.asarray(cv0_w, np.float32)
    sub = np.asarray(input_subtract, np.float32)
    div = np.asarray(input_divide, np.float32)
    w_norm = cv0_w / div[None, None, :, None]
    b_norm = np.asarray(cv0_b, np.float32) - np.einsum("hwco,c->o", cv0_w, sub / div)
    return StemParams(
        w0=jnp.asarray(_s2d_weight(w_norm), dtype),
        b0=jnp.asarray(b_norm, jnp.float32),
        w1=jnp.asarray(_s2d_weight(np.asarray(cv1_w, np.float32)), dtype),
        b1=jnp.asarray(np.asarray(cv1_b, np.float32), jnp.float32),
    )


def _round8(x: int) -> int:
    return (x + 7) // 8 * 8


def _stem_kernel(xs_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, *, t1: int, w_out: int, c0: int, c1: int):
    """One (batch, row-strip, col-strip) program of the fused stem.

    `w_out`/`t1` here are the PER-TILE output extents; per-program working
    shapes stay small (~tens of rows x ~hundred cols) — Mosaic compile time
    explodes with full-width working sets.
    """
    t = pl.program_id(1)
    wi = pl.program_id(2)
    rows0 = 2 * t1 + 2  # conv0-output rows this tile computes (incl. halo)
    w0cols = _round8(2 * w_out + 2)  # padded conv0-output working width

    xs = xs_ref[0, 0, 0]  # [2*t1+3, w0cols+8, 4*c_img] (pre-gathered overlap)

    # conv0 as 4 shifted matmuls, fp32 accumulation.
    cin0 = xs.shape[-1]
    acc = jnp.zeros((rows0 * w0cols, c0), jnp.float32)
    for da in range(2):
        for db in range(2):
            v = xs[da : da + rows0, db : db + w0cols, :].reshape(-1, cin0)
            acc = acc + jnp.dot(v, w0_ref[da, db], preferred_element_type=jnp.float32)
    y = acc + b0_ref[:][None, :]
    y = y * jax.nn.sigmoid(y)  # SiLU
    y = y.reshape(rows0, w0cols, c0)

    # Zero conv1's padding region: cols 0:2 on the leftmost strip (image
    # border), rows 0:2 on the topmost strip. Interior tile halos carry real
    # neighbor data; garbage columns beyond 2*w_out+2 are never read by
    # conv1's block window.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows0, w0cols, 1), 1)
    y = jnp.where(jnp.logical_and(col_ids < 2, wi == 0), 0.0, y)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows0, w0cols, 1), 0)
    y = jnp.where(jnp.logical_and(row_ids < 2, t == 0), 0.0, y)
    y = y.astype(xs.dtype)

    # In-VMEM space-to-depth: reshape-split rows (major) and width (sublane)
    # into blocks+phases, then conv1 as 16 per-phase tap matmuls
    # (w1 channel layout is (p, q, c)).
    y5 = y.reshape(t1 + 1, 2, w0cols // 2, 2, c0)
    acc1 = jnp.zeros((t1 * w_out, c1), jnp.float32)
    for da in range(2):
        for p in range(2):
            for db in range(2):
                for q in range(2):
                    phase = y5[da : da + t1, p, db : db + w_out, q, :].reshape(-1, c0)
                    wk = w1_ref[da, db, (p * 2 + q) * c0 : (p * 2 + q + 1) * c0, :]
                    acc1 = acc1 + jnp.dot(phase, wk, preferred_element_type=jnp.float32)
    z = acc1 + b1_ref[:][None, :]
    z = z * jax.nn.sigmoid(z)
    out_ref[0, 0, 0] = z.reshape(t1, w_out, c1).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _stem_v2_kernel(main_ref, halo_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, *, t1: int, w1: int, wp: int, c0: int, c1: int):
    """Relayout-free formulation: 4-phase-split input, major-dim row slices,
    aligned full-width col slices, no in-kernel reshapes of minor dims.

    Index conventions (see fused_stem_v2): xs4[p][q][m, n] = s2d-grid pixel
    (2*(m-2+tile_row0)+p, 2*(n-2)+q); y_PQ[k', n] = conv0-output (act0) at
    global (2*(R1-1+k')+P, 2*(n-2)+Q).
    """
    t = pl.program_id(1)

    # Assemble the (t1+2)-row phase arrays: main strip + 2 halo rows.
    xs = {}
    for p in range(2):
        for q in range(2):
            xs[(p, q)] = jnp.concatenate([main_ref[0, p, q], halo_ref[0, 0, p, q]], axis=0)  # [t1+2, wp, cimg4]

    cin = xs[(0, 0)].shape[-1]
    ws = wp - 8  # working width of y (168 for 640px)

    # conv0: per output phase (P,Q), 4 taps — tap (di,dj) reads source phase
    # ((P+di-1)%2, (Q+dj-1)%2) at row offset (P+di-1)//2+1, col offset
    # (Q+dj-1)//2+1 (the +1s come from the 2-block zero padding).
    y = {}
    for P in range(2):
        for Q in range(2):
            acc = jnp.zeros(((t1 + 1) * ws, c0), jnp.float32)
            for di in range(2):
                for dj in range(2):
                    u, v = P + di - 1, Q + dj - 1
                    src = xs[(u % 2, v % 2)]
                    ro = (u - (u % 2)) // 2 + 1  # -1 -> 0, 0/1 -> 1
                    co = (v - (v % 2)) // 2 + 1
                    blk = src[ro : ro + t1 + 1, co : co + ws, :].reshape(-1, cin)
                    acc = acc + jnp.dot(blk, w0_ref[di, dj, :cin, :], preferred_element_type=jnp.float32)
            z = acc + b0_ref[:][None, :]
            z = z * jax.nn.sigmoid(z)
            z = z.reshape(t1 + 1, ws, c0)
            # Mask conv1's zero padding: y local col n maps to ys block col
            # n-1, so col 0 is ys col -1; row k'=0 is ys row -1 on strip 0.
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (t1 + 1, ws, 1), 1)
            z = jnp.where(col_ids == 0, 0.0, z)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (t1 + 1, ws, 1), 0)
            z = jnp.where(jnp.logical_and(row_ids == 0, t == 0), 0.0, z)
            y[(P, Q)] = z.astype(main_ref.dtype)

    # conv1: out[r, c1] = sum over (da, db) of ys[r+da, c1+db] @ W1[da, db]
    # where ys = lane-concat of the four clean phase arrays (K=4*c0 keeps the
    # MXU fed; y col n = ys col n-1).
    ys = jnp.concatenate([y[(0, 0)], y[(0, 1)], y[(1, 0)], y[(1, 1)]], axis=-1)  # [t1+1, ws, 4*c0]
    acc1 = jnp.zeros((t1 * w1, c1), jnp.float32)
    for da in range(2):
        for db in range(2):
            blk = ys[da : da + t1, db : db + w1, :].reshape(-1, 4 * c0)
            acc1 = acc1 + jnp.dot(blk, w1_ref[da, db], preferred_element_type=jnp.float32)
    z = acc1 + b1_ref[:][None, :]
    z = z * jax.nn.sigmoid(z)
    out_ref[0] = z.reshape(t1, w1, c1).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("t1", "interpret"))
def fused_stem_v2(images: jnp.ndarray, params: StemParams, *, t1: int = 20, interpret: bool = False) -> jnp.ndarray:
    """Phase-split fused stem: full-width row strips, no minor-dim reshapes.

    Input prep (one XLA transpose pass): the raw image becomes four
    phase-split s2d arrays xs4[b, p, q, a, n, 12] where (p, q) is the parity
    of the s2d-grid coordinate and (a, n) its block position.
    """
    b, h, w, c_img = images.shape
    assert h % 4 == 0 and w % 4 == 0
    h1, w1 = h // 4, w // 4
    assert h1 % t1 == 0
    c0 = params.w0.shape[-1]
    c1 = params.w1.shape[-1]
    dtype = params.w0.dtype

    x = images.astype(dtype)
    # s2d-by-4 with channel order (p2, q2, ch) inside each 2x2 image block and
    # phase dims (p, q) pulled out front: pixel (4a+2p+p2, 4n+2q+q2).
    x6 = x.reshape(b, h1, 2, 2, w1, 2, 2, c_img)  # [b, a, p, p2, n, q, q2, ch]
    xs4 = x6.transpose(0, 2, 5, 1, 4, 3, 6, 7).reshape(b, 2, 2, h1, w1, 4 * c_img)

    # Pad: 2 zero block rows/cols at top/left (conv halo), plus bottom halo
    # rows and right alignment padding.
    ws = _round_up(2 + w1 + 1, 8)  # y working width (>= left pad 2 + w1 + right halo)
    wp = ws + 8
    xsp4 = jnp.pad(xs4, ((0, 0), (0, 0), (0, 0), (2, t1 + 2), (2, wp - 2 - w1), (0, 0)))

    n_t = h1 // t1
    main = xsp4[:, :, :, : n_t * t1]
    halo = jnp.stack([xsp4[:, :, :, t1 * (t + 1) : t1 * (t + 1) + 2] for t in range(n_t)], axis=1)

    kernel = partial(_stem_v2_kernel, t1=t1, w1=w1, wp=wp, c0=c0, c1=c1)
    return pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 2, 2, t1, wp, 4 * c_img), lambda bi, ti: (bi, 0, 0, ti, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 2, 2, wp, 4 * c_img), lambda bi, ti: (bi, ti, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t1, w1, c1), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h1, w1, c1), dtype),
        interpret=interpret,
    )(main, halo, params.w0, params.b0, params.w1, params.b1)


@partial(jax.jit, static_argnames=("t1", "w1t", "interpret"))
def fused_stem(
    images: jnp.ndarray, params: StemParams, *, t1: int = 20, w1t: int = 40, interpret: bool = False
) -> jnp.ndarray:
    """Raw images [B, H, W, 3] -> stem output [B, H/4, W/4, c1] (bf16).

    H and W must be multiples of 4; H/4 must be a multiple of t1 and W/4 of
    w1t (the per-tile output rows/cols). Overlapping input tiles are
    gathered by XLA (halo duplication ~10-15% of the s2d input).
    """
    b, h, w, c_img = images.shape
    assert h % 4 == 0 and w % 4 == 0
    h1, w1 = h // 4, w // 4
    assert h1 % t1 == 0, f"H/4={h1} must be a multiple of t1={t1}"
    assert w1 % w1t == 0, f"W/4={w1} must be a multiple of w1t={w1t}"
    c0 = params.w0.shape[-1]
    c1 = params.w1.shape[-1]
    dtype = params.w0.dtype

    # Space-to-depth + halo padding in XLA (single fused pass over the input).
    x = images.astype(dtype)
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c_img).transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c_img)
    rows0 = 2 * t1 + 2
    w0cols = _round8(2 * w1t + 2)
    tile_w = w0cols + 8
    # Pad: 3 top/left (conv halo; tile starts stay >= 0), enough bottom/right
    # for the last tiles' halos and the aligned tile width.
    n_ht, n_wt = h1 // t1, w1 // w1t
    xsp = jnp.pad(xs, ((0, 0), (3, rows0 + 1), (3, tile_w), (0, 0)))

    # Pre-gather overlapping tiles: [B, n_ht, n_wt, rows0+1, tile_w, 4c].
    tiles = jnp.stack(
        [
            jnp.stack([xsp[:, 2 * t1 * hi : 2 * t1 * hi + rows0 + 1, 2 * w1t * wi : 2 * w1t * wi + tile_w] for wi in range(n_wt)], axis=1)
            for hi in range(n_ht)
        ],
        axis=1,
    )

    kernel = partial(_stem_kernel, t1=t1, w_out=w1t, c0=c0, c1=c1)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_ht, n_wt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, rows0 + 1, tile_w, 4 * c_img),
                lambda bi, hi, wi: (bi, hi, wi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, t1, w1t, c1), lambda bi, hi, wi: (bi, hi, wi, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_ht, n_wt, t1, w1t, c1), dtype),
        interpret=interpret,  # CPU testing (no Mosaic backend there)
    )(tiles, params.w0, params.b0, params.w1, params.b1)
    # [B, n_ht, n_wt, t1, w1t, c1] -> [B, H/4, W/4, c1]
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h1, w1, c1)
