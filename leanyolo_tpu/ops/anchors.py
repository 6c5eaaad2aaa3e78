"""Anchor-free grid math for YOLOv10 heads.

TPU-native counterpart of the reference anchor utilities
(reference: leanyolo/utils/tal.py:10-52). Everything here is pure jnp on
static shapes so it traces once under jit and fuses into the surrounding
program. Anchors are derived from `(h, w)` level shapes rather than live
tensors, so the same helpers serve decode, loss, and serving paths.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def make_anchors(
    hw_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate anchor centers and per-anchor strides for a feature pyramid.

    Args:
        hw_shapes: per-level spatial shapes [(H, W), ...] (static Python ints).
        strides: stride per level, e.g. (8, 16, 32).
        grid_cell_offset: fractional center offset (0.5 = cell centers).

    Returns:
        anchor_points: [A, 2] (x, y) in feature-cell units, levels concatenated.
        stride_tensor: [A, 1] stride per anchor.

    Parity: leanyolo/utils/tal.py:10-33 (same +0.5 centers, same level order).
    """
    assert len(hw_shapes) == len(strides)
    points = []
    stride_vals = []
    for (h, w), s in zip(hw_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack((gx, gy), axis=-1).reshape(-1, 2))
        stride_vals.append(jnp.full((h * w, 1), float(s), dtype=dtype))
    return jnp.concatenate(points, axis=0), jnp.concatenate(stride_vals, axis=0)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = False, axis: int = -1) -> jnp.ndarray:
    """Distances (l, t, r, b) -> boxes (xyxy or xywh).

    Parity: leanyolo/utils/tal.py:36-46.
    """
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate((c_xy, wh), axis=axis)
    return jnp.concatenate((x1y1, x2y2), axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox_xyxy: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Boxes (xyxy) -> distances (l, t, r, b), clipped to [0, reg_max - 0.01].

    Parity: leanyolo/utils/tal.py:49-52.
    """
    x1y1, x2y2 = jnp.split(bbox_xyxy, 2, axis=-1)
    dist = jnp.concatenate((anchor_points - x1y1, x2y2 - anchor_points), axis=-1)
    return jnp.clip(dist, 0.0, reg_max - 0.01)


def dfl_expectation(box_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Expected distances from DFL logits.

    Args:
        box_logits: [..., 4 * reg_max] raw logits (bins contiguous per side).

    Returns:
        [..., 4] expected (l, t, r, b) in feature-cell units.

    The softmax-expectation (reference: leanyolo/models/yolov10/head.py:32-49)
    is expressed as one reshape + softmax + dot so XLA keeps it on the VPU in a
    single fusion.
    """
    shape = box_logits.shape[:-1]
    probs = jnp.reshape(box_logits, shape + (4, reg_max))
    probs = jnp.exp(probs - jnp.max(probs, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    bins = jnp.arange(reg_max, dtype=probs.dtype)
    return jnp.einsum("...kr,r->...k", probs, bins)
