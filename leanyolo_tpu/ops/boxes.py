"""Box geometry + fixed-shape NMS, designed for XLA.

TPU-native counterpart of the reference box utilities
(reference: leanyolo/utils/box_ops.py:17-124, leanyolo/utils/tal.py:55-86).

Everything operates on fixed shapes: instead of boolean filtering that would
produce dynamic result counts, suppression is expressed as masks so the whole
pipeline stays inside one compiled program. Variable-size results only
materialize at the numpy/host boundary (see `leanyolo_tpu.models.yolov10.decode`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def box_xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate((x - w / 2, y - h / 2, x + w / 2, y + h / 2), axis=-1)


def box_xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = jnp.maximum(x2 - x1, 0.0)
    h = jnp.maximum(y2 - y1, 0.0)
    return jnp.concatenate((x1 + w / 2, y1 + h / 2, w, h), axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    wh = jnp.maximum(boxes[..., 2:4] - boxes[..., 0:2], 0.0)
    return wh[..., 0] * wh[..., 1]


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix. boxes1 [N,4], boxes2 [M,4] -> [N,M] (xyxy)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / (union + 1e-9)


def box_ciou_pairwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU matrix between boxes1 [N,4] and boxes2 [M,4] (xyxy).

    Parity: leanyolo/utils/tal.py:55-86 (same eps placement, clamp to [0,1],
    alpha treated as a constant w.r.t. gradients).
    """
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area1 = jnp.maximum(b1[..., 2] - b1[..., 0], 0.0) * jnp.maximum(b1[..., 3] - b1[..., 1], 0.0)
    area2 = jnp.maximum(b2[..., 2] - b2[..., 0], 0.0) * jnp.maximum(b2[..., 3] - b2[..., 1], 0.0)
    union = area1 + area2 - inter + 1e-9
    iou = inter / union

    cw = jnp.maximum(jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0]), 0.0)
    ch = jnp.maximum(jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1]), 0.0)
    c2 = cw**2 + ch**2 + 1e-9

    b1cx = (b1[..., 0] + b1[..., 2]) / 2
    b1cy = (b1[..., 1] + b1[..., 3]) / 2
    b2cx = (b2[..., 0] + b2[..., 2]) / 2
    b2cy = (b2[..., 1] + b2[..., 3]) / 2
    rho2 = (b1cx - b2cx) ** 2 + (b1cy - b2cy) ** 2

    w1 = jnp.maximum(b1[..., 2] - b1[..., 0], 1e-9)
    h1 = jnp.maximum(b1[..., 3] - b1[..., 1], 1e-9)
    w2 = jnp.maximum(b2[..., 2] - b2[..., 0], 1e-9)
    h2 = jnp.maximum(b2[..., 3] - b2[..., 1], 1e-9)
    v = (4 / (jnp.pi**2)) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (1 - iou + v + 1e-9))
    ciou = iou - (rho2 / c2) - alpha * v
    return jnp.clip(ciou, 0.0, 1.0)


def box_ciou_paired(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise CIoU between matched box pairs: [..., 4] x [..., 4] -> [...].

    Same math as `box_ciou_pairwise` (reference: leanyolo/utils/tal.py:55-86)
    without materializing the N x M matrix — used for the IoU loss where each
    prediction has exactly one assigned target.
    """
    b1, b2 = boxes1, boxes2
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area1 = jnp.maximum(b1[..., 2] - b1[..., 0], 0.0) * jnp.maximum(b1[..., 3] - b1[..., 1], 0.0)
    area2 = jnp.maximum(b2[..., 2] - b2[..., 0], 0.0) * jnp.maximum(b2[..., 3] - b2[..., 1], 0.0)
    union = area1 + area2 - inter + 1e-9
    iou = inter / union

    cw = jnp.maximum(jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0]), 0.0)
    ch = jnp.maximum(jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1]), 0.0)
    c2 = cw**2 + ch**2 + 1e-9
    rho2 = ((b1[..., 0] + b1[..., 2] - b2[..., 0] - b2[..., 2]) / 2) ** 2 + (
        (b1[..., 1] + b1[..., 3] - b2[..., 1] - b2[..., 3]) / 2
    ) ** 2

    w1 = jnp.maximum(b1[..., 2] - b1[..., 0], 1e-9)
    h1 = jnp.maximum(b1[..., 3] - b1[..., 1], 1e-9)
    w2 = jnp.maximum(b2[..., 2] - b2[..., 0], 1e-9)
    h2 = jnp.maximum(b2[..., 3] - b2[..., 1], 1e-9)
    v = (4 / (jnp.pi**2)) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (1 - iou + v + 1e-9))
    return jnp.clip(iou - (rho2 / c2) - alpha * v, 0.0, 1.0)


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """Greedy NMS over a fixed-size candidate set; returns a keep mask.

    Exact greedy semantics of the reference Python-loop NMS
    (reference: leanyolo/utils/box_ops.py:49-78), recast for the TPU: rather
    than shrinking arrays, we sort once by score, compute the full [N, N] IoU
    matrix, and run a fixed-trip-count `fori_loop` that marks survivors. All
    shapes are static; padded entries should carry score -inf (they simply
    never suppress anything that outranks them).

    Args:
        boxes: [N, 4] xyxy (any order).
        scores: [N] confidence; padding entries should be -inf or very small.
        iou_thresh: suppression threshold (IoU > thresh removes a box).

    Returns:
        keep: [N] boolean mask aligned with *input* order.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    iou = box_iou(boxes_s, boxes_s)
    rank = jnp.arange(n)
    # supp[j, i]: higher-ranked j would suppress i if j survives (strict
    # upper triangle of the IoU threshold mask, in sorted order).
    supp = ((iou > iou_thresh) & (rank[:, None] < rank[None, :])).astype(jnp.bfloat16)

    # Greedy NMS is the unique fixed point of
    #     alive[i] = not OR_{j<i} (supp[j, i] and alive[j])
    # (well-founded recursion over rank order). Jacobi-iterate it to
    # convergence instead of running an n-trip serial loop: each sweep is one
    # [n] x [n, n] matvec on the MXU (f32 accumulation of 0/1 values, so the
    # ==0 test is exact), and after sweep t every box whose suppression-
    # dependency depth is <= t has its final value (induction: sweep t+1
    # recomputes from values that are already final for depth <= t). Real
    # candidate sets converge in a handful of sweeps; the while_loop bound n
    # guarantees termination at the exact serial-greedy result regardless.
    # Measured on-chip (PERF.md round 4): 1000-trip serial fori_loop cost
    # ~10 ms/step at bs128; the sweep form runs in the decode noise floor.
    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        alive, _, it = state
        amt = jax.lax.dot_general(
            alive.astype(jnp.bfloat16), supp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n]: how many live higher-ranked boxes overlap each i
        new_alive = amt == 0.0
        return new_alive, jnp.any(new_alive != alive), it + 1

    alive0 = jnp.ones((n,), dtype=bool)
    alive, _, _ = jax.lax.while_loop(cond, body, (alive0, jnp.array(True), 0))
    # Scatter back to input order.
    keep = jnp.zeros((n,), dtype=bool).at[order].set(alive)
    return keep


def scale_coords(from_shape: Tuple[int, int], boxes: jnp.ndarray, to_shape: Tuple[int, int]) -> jnp.ndarray:
    """Scale xyxy boxes from from_shape (h, w) to to_shape (h, w).

    Parity: leanyolo/utils/box_ops.py:81-93.
    """
    fh, fw = from_shape
    th, tw = to_shape
    gain = jnp.asarray([tw / max(fw, 1), th / max(fh, 1), tw / max(fw, 1), th / max(fh, 1)], dtype=boxes.dtype)
    return boxes * gain


def unletterbox_coords(
    boxes: jnp.ndarray,
    gain: Tuple[float, float],
    pad: Tuple[int, int],
    to_shape: Tuple[int, int],
) -> jnp.ndarray:
    """Invert letterboxing for xyxy boxes; clips to the original image.

    Parity: leanyolo/utils/box_ops.py:96-124.
    """
    gw, gh = gain
    px, py = pad
    h, w = to_shape
    x1 = jnp.clip((boxes[..., 0] - px) / gw, 0, w)
    y1 = jnp.clip((boxes[..., 1] - py) / gh, 0, h)
    x2 = jnp.clip((boxes[..., 2] - px) / gw, 0, w)
    y2 = jnp.clip((boxes[..., 3] - py) / gh, 0, h)
    return jnp.stack((x1, y1, x2, y2), axis=-1)
