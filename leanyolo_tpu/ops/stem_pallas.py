"""Pallas fused stem kernel: conv0 + BN/SiLU + conv1 + BN/SiLU in one pass.

The YOLOv10 stem (reference: backbone.py:68-69 — two k3 s2 convs) is the
most memory-bound span of the network: XLA runs it as two separate convs
with an HBM round-trip of the 320x320 intermediate (~210 MB at batch 32).
This kernel keeps the intermediate in VMEM: the image is read from HBM
once and only the 160x160 stem output is written back.

Mechanics:
- stride-2 3x3 convs become stride-1 2x2 "block" convs on space-to-depth
  inputs via the zero-padded-4x4 kernel split (standard MLPerf-ResNet TPU
  trick); both tap contractions then run as dense MXU matmuls;
- the host-side prep (`prepare_stem_params`) folds input normalization
  (x - sub) / div into conv0's weights/bias, so the kernel consumes raw
  pixels;
- the grid tiles over (batch, row-strips); each program DMAs its
  overlapping input strip from HBM (halo rows can't be expressed as a
  non-overlapping BlockSpec).

Exactness: the math is identical to the reference stem up to bf16/f32
rounding; parity is tested against the XLA path in tests/test_stem_pallas.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

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
    wp = np.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 4x4, origin shifted
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


def _stem_kernel(xsp_hbm, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, xs_tile, sem, *, t1: int, w_out: int, c0: int, c1: int):
    """One (batch, row-strip) program of the fused stem."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows0 = 2 * t1 + 2  # conv0-output rows this tile computes (incl. halo)
    w0cols = 2 * w_out + 2  # conv0-output cols (incl. halo)

    # Overlapping input strip: DMA from HBM (BlockSpecs can't overlap).
    cp = pltpu.make_async_copy(xsp_hbm.at[b, pl.ds(t * 2 * t1, rows0 + 1)], xs_tile, sem)
    cp.start()
    cp.wait()
    xs = xs_tile[:]  # [rows0 + 1, w0cols + 1, 4*c_img]

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

    # Zero the conv1 padding region: cols 0:2 always (left image border),
    # rows 0:2 only for the first strip (top border).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows0, w0cols, 1), 1)
    y = jnp.where(col_ids < 2, 0.0, y)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows0, w0cols, 1), 0)
    y = jnp.where(jnp.logical_and(row_ids < 2, t == 0), 0.0, y)
    y = y.astype(xs.dtype)

    # Space-to-depth phases as static slices (Mosaic rejects both the
    # transpose+collapse shape cast and lane-concat of offset slices), then
    # conv1 as 16 per-phase matmuls. w1 channel layout is (p, q, c).
    y5 = y.reshape(t1 + 1, 2, w0cols // 2, 2, c0)
    acc1 = jnp.zeros((t1 * w_out, c1), jnp.float32)
    for da in range(2):
        for db in range(2):
            for p in range(2):
                for q in range(2):
                    phase = y5[da : da + t1, p, db : db + w_out, q, :].reshape(-1, c0)
                    wk = w1_ref[da, db, (p * 2 + q) * c0 : (p * 2 + q + 1) * c0, :]
                    acc1 = acc1 + jnp.dot(phase, wk, preferred_element_type=jnp.float32)
    z = acc1 + b1_ref[:][None, :]
    z = z * jax.nn.sigmoid(z)
    out_ref[0] = z.reshape(t1, w_out, c1).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("t1",))
def fused_stem(images: jnp.ndarray, params: StemParams, *, t1: int = 20) -> jnp.ndarray:
    """Raw images [B, H, W, 3] -> stem output [B, H/4, W/4, c1] (bf16).

    H and W must be multiples of 4; H/4 must be a multiple of t1.
    """
    b, h, w, c_img = images.shape
    assert h % 4 == 0 and w % 4 == 0
    h1, w1 = h // 4, w // 4
    assert h1 % t1 == 0, f"H/4={h1} must be a multiple of t1={t1}"
    c0 = params.w0.shape[-1]
    c1 = params.w1.shape[-1]
    dtype = params.w0.dtype

    # Space-to-depth + halo padding in XLA (single fused pass over the input).
    x = images.astype(dtype)
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c_img).transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c_img)
    # conv0-out local row m covers (H/2)-grid row (2*t*t1 - 2 + m) and reads
    # xs rows shifted by -3 after padding; pad 3 blocks top/left so every
    # tile's DMA start is >= 0 and the left/top halos are zeros.
    xsp = jnp.pad(xs, ((0, 0), (3, 0), (3, 0), (0, 0)))

    rows0 = 2 * t1 + 2
    w0cols = 2 * w1 + 2
    kernel = partial(_stem_kernel, t1=t1, w_out=w1, c0=c0, c1=c1)
    grid = (b, h1 // t1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xsp stays in HBM; DMA'd per tile
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t1, w1, c1), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h1, w1, c1), dtype),
        scratch_shapes=[
            pltpu.VMEM((rows0 + 1, w0cols + 1, 4 * c_img), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xsp, params.w0, params.b0, params.w1, params.b1)
