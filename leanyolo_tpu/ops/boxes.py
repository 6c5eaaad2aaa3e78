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


def _alive_jacobi(boxes_s: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Greedy-NMS survivors over score-sorted boxes via Jacobi fixed-point.

    Greedy NMS is the unique fixed point of
        alive[i] = not OR_{j<i} (supp[j, i] and alive[j])
    (well-founded recursion over rank order). Jacobi-iterate it to
    convergence: each sweep is one [n] x [n, n] matvec on the MXU (f32
    accumulation of 0/1 values, so the ==0 test is exact), and after sweep t
    every box whose suppression-dependency depth is <= t has its final value
    (induction: sweep t+1 recomputes from values already final for depth
    <= t). The while_loop bound n guarantees exact termination regardless.

    Measured on-chip (PERF.md round 4): LOSES to the blocked substitution —
    every sweep re-reads the [n, n] suppression matrix from HBM (bs128,
    n=1000: 256 MB/sweep), so deep suppression chains multiply the traffic.
    Kept for the measurement record (experiments/exp_nms_schedules.py).
    """
    n = boxes_s.shape[0]
    iou = box_iou(boxes_s, boxes_s)
    rank = jnp.arange(n)
    # supp[j, i]: higher-ranked j would suppress i if j survives (strict
    # upper triangle of the IoU threshold mask, in sorted order).
    supp = ((iou > iou_thresh) & (rank[:, None] < rank[None, :])).astype(jnp.bfloat16)

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
    return alive


def _alive_blocked(
    boxes_s: jnp.ndarray, iou_thresh: float, block: int, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Greedy-NMS survivors via blocked forward-substitution (the shipping
    schedule).

    The dependency structure alive[i] = !OR_{j<i}(supp[j,i] & alive[j]) is a
    unit-lower-triangular boolean solve; process rank-ordered candidates in
    blocks of `block` like a blocked triangular solver:

      per block k (sequential, n/block trips):
        1. compute this block's IoU rows against ALL candidates on the fly
           ([m, n] from [m,4] x [n,4] box coords — the full [n, n] matrix is
           NEVER materialized in HBM),
        2. solve the [m, m] intra-block recursion by Jacobi sweeps (tiny
           VMEM-resident matvecs, exact by the same induction as
           `_alive_jacobi`, bounded by m),
        3. one [m] x [m, n] MXU matvec adds this block's surviving
           suppressors into the downstream kill counts.

    Each suppression pair is thus produced and consumed exactly ONCE
    (vs once per sweep for the global Jacobi form), and the serial depth is
    n/block trips instead of n. Counts stay exact: 0/1 bf16 operands
    accumulate in f32 (integers <= n << 2^24).

    `valid` (optional [n] bool): entries marked False are dead from the
    start — they never survive and never suppress. This is how the decode
    path expresses conf-masked candidates WITHOUT re-sorting: greedy over a
    sorted list with dead entries equals greedy over the compacted list.
    """
    n = boxes_s.shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad > n:
        # Zero-area padding boxes: IoU is 0 against everything (inter 0 over
        # union+eps), so they never suppress and never rescue anyone.
        boxes_s = jnp.pad(boxes_s, ((0, n_pad - n), (0, 0)))
    if valid is not None and n_pad > n:
        valid = jnp.pad(valid, (0, n_pad - n))
    rank = jnp.arange(block)
    tri = rank[:, None] < rank[None, :]  # strict upper triangle, [m, m]
    gidx = jnp.arange(n_pad)

    def solve_block(live0, intra):
        """Exact greedy inside one block; live0 = not externally killed."""

        def cond(state):
            _, changed, it = state
            return changed & (it < block)

        def body(state):
            a, _, it = state
            amt = jax.lax.dot_general(
                a.astype(jnp.bfloat16), intra, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new = live0 & (amt == 0.0)
            return new, jnp.any(new != a), it + 1

        alive, _, _ = jax.lax.while_loop(cond, body, (live0, jnp.array(True), 0))
        return alive

    def body(k, state):
        acc, alive = state  # acc[i]: f32 count of alive higher-rank suppressors
        start = k * block
        blk = jax.lax.dynamic_slice_in_dim(boxes_s, start, block, axis=0)
        supp_blk = (box_iou(blk, boxes_s) > iou_thresh).astype(jnp.bfloat16)  # [m, n_pad]
        intra = jax.lax.dynamic_slice_in_dim(supp_blk, start, block, axis=1)
        intra = jnp.where(tri, intra, 0).astype(jnp.bfloat16)
        live0 = jax.lax.dynamic_slice_in_dim(acc, start, block, axis=0) == 0.0
        if valid is not None:
            live0 = live0 & jax.lax.dynamic_slice_in_dim(valid, start, block, axis=0)
        alive_blk = solve_block(live0, intra)
        contrib = jax.lax.dot_general(
            alive_blk.astype(jnp.bfloat16), supp_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_pad] — counts for every position; only later blocks may use them
        acc = acc + jnp.where(gidx >= start + block, contrib, 0.0)
        alive = jax.lax.dynamic_update_slice_in_dim(alive, alive_blk, start, axis=0)
        return acc, alive

    acc0 = jnp.zeros((n_pad,), jnp.float32)
    alive0 = jnp.zeros((n_pad,), dtype=bool)
    _, alive = jax.lax.fori_loop(0, nb, body, (acc0, alive0))
    return alive[:n]


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    *,
    schedule: str = "blocked",
    block: int = 64,
    presorted: bool = False,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy NMS over a fixed-size candidate set; returns a keep mask.

    Exact greedy semantics of the reference Python-loop NMS
    (reference: leanyolo/utils/box_ops.py:49-78), recast for the TPU: sort
    once by score, then solve the triangular suppression recursion with a
    blocked substitution schedule (`_alive_blocked`; `schedule="jacobi"`
    keeps the measured-slower global fixed-point form). All shapes are
    static; padded entries should carry score -inf (they simply never
    suppress anything that outranks them).

    Args:
        boxes: [N, 4] xyxy (any order).
        scores: [N] confidence; padding entries should be -inf or very small.
        iou_thresh: suppression threshold (IoU > thresh removes a box).
        schedule: "blocked" (default, one pass over the suppression pairs)
            or "jacobi" (global fixed-point sweeps).
        block: candidates per substitution block (blocked schedule only;
            64 is the measured-best at n=1000, experiments/exp_nms_schedules.py).
        presorted: input is ALREADY in descending-score order (the decode
            paths' candidates come straight from top-k). Skips the
            argsort+gather — measured 1.7 ms/batch at bs128/n=1000, more
            than the whole blocked solve.
        valid: optional [N] bool: False entries are dead from the start
            (conf-masked candidates) — they neither survive nor suppress,
            which is exactly equivalent to dropping them before a sort.
            Same force-dead semantics in both the presorted and sorting
            paths.

    Returns:
        keep: [N] boolean mask aligned with *input* order.
    """
    if presorted:
        return _alive_blocked(boxes, iou_thresh, min(block, boxes.shape[0]), valid=valid)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    if schedule == "jacobi":
        alive = _alive_jacobi(boxes_s, iou_thresh)
    else:
        alive = _alive_blocked(boxes_s, iou_thresh, min(block, boxes.shape[0]))
    # Scatter back to input order.
    keep = jnp.zeros((boxes.shape[0],), dtype=bool).at[order].set(alive)
    if valid is not None:
        # Force-dead, matching the presorted path: invalid entries carry
        # score -inf so every valid entry outranks them — they can only
        # suppress other invalid entries, never a valid one. Masking them
        # out of `keep` is therefore exactly equivalent to threading
        # `valid` through the solve (they neither survive nor suppress).
        keep = keep & valid
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
