"""Task-Aligned assignment (TAL) as a fixed-shape, vmappable jnp function.

TPU-native counterpart of the reference TaskAlignedAssigner
(reference: leanyolo/utils/tal.py:89-178). Semantics match exactly:

- candidate anchors must have centers strictly inside a GT box;
- alignment metric s^alpha * iou^beta with alpha=0.5, beta=6.0 (CIoU);
- top-k candidates per GT (k=10 one2many, k=1 one2one);
- anchors claimed by multiple GTs resolve to the highest-overlap GT;
- outputs are one-hot target scores gated by the foreground mask.

Shapes are static ([B, N, A]); the reference's per-image Python loop over
the batch (tal.py:162-169) becomes a vmapped CIoU, and scatter_add counting
becomes a one-hot sum. Padded GTs (mask_gt False) never win an anchor.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .boxes import box_ciou_pairwise
from .topk import topk_membership as _topk_membership


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # [B, A] int32 (num_classes for background)
    target_bboxes: jnp.ndarray  # [B, A, 4]
    target_scores: jnp.ndarray  # [B, A, C] float
    fg_mask: jnp.ndarray  # [B, A] bool
    target_gt_idx: jnp.ndarray  # [B, A] int32


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Anchors with centers inside each GT box. [A,2] x [B,N,4] -> [B,N,A] bool.

    Parity: leanyolo/utils/tal.py:171-178.
    """
    lt = gt_bboxes[..., None, :2]  # [B, N, 1, 2]
    rb = gt_bboxes[..., None, 2:]  # [B, N, 1, 2]
    deltas = jnp.concatenate((xy_centers[None, None] - lt, rb - xy_centers[None, None]), axis=-1)
    return jnp.min(deltas, axis=-1) > eps


def task_aligned_assign(
    pd_scores: jnp.ndarray,  # [B, A, C] raw logits
    pd_bboxes: jnp.ndarray,  # [B, A, 4] xyxy (same space as gt_bboxes)
    anc_points: jnp.ndarray,  # [A, 2] (same space as gt_bboxes)
    gt_labels: jnp.ndarray,  # [B, N] int
    gt_bboxes: jnp.ndarray,  # [B, N, 4] xyxy
    mask_gt: jnp.ndarray,  # [B, N] bool
    *,
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    b, a, c = pd_scores.shape
    n = gt_labels.shape[1]
    if n == 0:
        return AssignResult(
            jnp.full((b, a), num_classes, jnp.int32),
            jnp.zeros((b, a, 4), pd_bboxes.dtype),
            jnp.zeros((b, a, c), pd_scores.dtype),
            jnp.zeros((b, a), bool),
            jnp.zeros((b, a), jnp.int32),
        )

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes) & mask_gt[..., None]  # [B, N, A]

    overlaps = jax.vmap(box_ciou_pairwise)(gt_bboxes, pd_bboxes)  # [B, N, A]

    probs = jax.nn.sigmoid(pd_scores)  # [B, A, C]
    gt_ind = jnp.maximum(gt_labels.astype(jnp.int32), 0)  # [B, N]
    # probs[b, a, gt[b, n]] as a one-hot contraction on the MXU — the gather
    # formulation needs a [B, C, A] transpose plus a gather custom-call (and
    # a scatter in the backward).
    gt_onehot = (gt_ind[..., None] == jnp.arange(c, dtype=jnp.int32)).astype(probs.dtype)  # [B, N, C]
    cls_scores = jnp.einsum("bnc,bac->bna", gt_onehot, probs)  # [B, N, A]

    align = jnp.clip(cls_scores, 0, 1) ** alpha * jnp.clip(overlaps, 0, 1) ** beta
    align = align * mask_in_gts.astype(align.dtype)

    # Top-k per GT -> membership mask. Only the SET of top-k anchors is
    # consumed (the reference scatters indices into a count, tal.py:146-156),
    # so no ordered (values, indices) top-k is needed: iterative argmax
    # membership skips the variadic sort entirely (see ops/topk.py). A GT row
    # whose best metric is <= eps degenerates to {anchor 0}, reproducing the
    # reference's masked_fill(0) of all k indices.
    k = min(topk, a)
    has_any = jnp.max(align, axis=-1, keepdims=True) > eps  # [B, N, 1]
    member = _topk_membership(align, k)  # [B, N, A] bool
    mask_pos = jnp.where(has_any, member, (jnp.arange(a, dtype=jnp.int32) == 0)[None, None]) & mask_in_gts

    # Resolve anchors claimed by multiple GTs by the highest CIoU.
    fg_counts = jnp.sum(mask_pos, axis=1)  # [B, A]
    max_overlap_gt = jnp.argmax(overlaps, axis=1)  # [B, A]
    is_max = jax.nn.one_hot(max_overlap_gt, n, axis=1, dtype=bool)  # [B, N, A]
    mask_pos = jnp.where((fg_counts[:, None, :] > 1), is_max, mask_pos)
    fg_mask = jnp.sum(mask_pos, axis=1) > 0  # [B, A]

    target_gt_idx = jnp.argmax(mask_pos.astype(jnp.int32), axis=1)  # [B, A]

    # Select per-anchor GT rows via a one-hot contraction (N is small): the
    # gather formulation's backward is a [B, A] -> [B, N] scatter custom-call;
    # the einsum's backward is another matmul on the MXU.
    sel = (target_gt_idx[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(gt_bboxes.dtype)  # [B, A, N]
    target_labels = jnp.sum(sel.astype(jnp.int32) * gt_ind[:, None, :], axis=-1)  # [B, A]
    target_bboxes = jnp.einsum("ban,bnf->baf", sel, gt_bboxes)  # [B, A, 4]
    onehot = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = onehot * fg_mask[..., None].astype(pd_scores.dtype)

    return AssignResult(
        target_labels.astype(jnp.int32),
        target_bboxes,
        target_scores,
        fg_mask,
        target_gt_idx.astype(jnp.int32),
    )
