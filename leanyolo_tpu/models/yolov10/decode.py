"""Decode paths: NMS-free top-k and masked class-wise NMS.

TPU-native counterparts of the reference postprocessing
(reference: leanyolo/models/yolov10/postprocess.py:48-261 and the
fixed-shape export wrapper, models/yolov10/export.py:126-198).

Both decoders are single jitted programs over static shapes:

- `decode_topk` replicates the official YOLOv10 NMS-free eval decode: DFL
  expectation -> anchor decode -> two-stage top-k over (anchor, class).
  Output is always [B, k, 6]; nothing is filtered.
- `decode_nms` replicates the reference's NMS decode with the export
  wrapper's fixed-shape contract: confidence masking, pre-top-k candidate
  capping, one greedy NMS pass per image (the class+image "offset trick"
  collapses class-wise NMS into a single pass), and `(detections, num_dets)`
  outputs instead of variable-length lists.

Performance notes (results are EXACTLY those of the reference algorithm):
- ranking happens on raw class logits — sigmoid is monotonic, so top-k over
  logits equals top-k over probabilities; sigmoid runs only on survivors;
- the DFL softmax-expectation and box decode run only on the <=max_det
  selected anchors (the reference decodes all ~8400 anchors first,
  postprocess.py:215-232 — 28x more DFL work than needed);
- `approx=True` swaps lax.top_k for the TPU-native `lax.approx_max_k`
  (serving-speed mode; ordering can differ for near-ties at the boundary).

Inputs are NHWC pyramids ([B, H, W, 4*reg_max + nc]); level order must match
`strides`.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.anchors import dfl_expectation, dist2bbox, make_anchors
from ...ops.boxes import nms_fixed
from ...ops.topk import max_argmax_lastdim, topk_lastdim


def _topk(x: jnp.ndarray, k: int, approx: bool):
    if approx and k < x.shape[-1]:
        return jax.lax.approx_max_k(x, k)
    return topk_lastdim(x, k)  # exact; 5-12x faster than lax.top_k's lowering


def _flatten_levels(preds: Sequence, num_classes: int, strides: Sequence[int]):
    """Concat levels -> (flat [B, A, C], anchors [A, 2], stride [A, 1], reg_max).

    Accepts either [B, H, W, 4R+nc] maps or (reg, cls) tuples from
    `model_apply(concat_head=False)` (the tuple form skips the head-side
    concat; the level concat happens here instead, same values).
    """
    assert len(preds) == len(strides)
    levels, hw_shapes, reg_max = _split_levels(list(preds), num_classes)
    anchors, stride_t = make_anchors(hw_shapes, strides, dtype=jnp.float32)
    flat = jnp.concatenate([jnp.concatenate([reg, cls], axis=-1) for reg, cls in levels], axis=1)
    return flat, anchors, stride_t, reg_max


def _flatten_pyramid(preds: Sequence[jnp.ndarray], num_classes: int, strides: Sequence[int]):
    """Dense decode: (boxes [B,A,4] pixels, cls logits [B,A,nc]).

    Kept for the serving export wrapper and loss-adjacent code paths that
    genuinely need every anchor decoded.
    """
    flat, anchors, stride_t, reg_max = _flatten_levels(list(preds), num_classes, strides)
    box_logits = flat[..., : 4 * reg_max]
    cls_logits = flat[..., 4 * reg_max :]
    dist = dfl_expectation(box_logits.astype(jnp.float32), reg_max)
    boxes = dist2bbox(dist, anchors[None], xywh=False) * stride_t[None]
    return boxes, cls_logits


def _split_levels(preds: Sequence, num_classes: int):
    """Per-level (box_logits [B,HW,4R], cls_logits [B,HW,nc]) + shapes.

    Accepts either concatenated [B, H, W, 4R+nc] maps or (reg, cls) tuples
    from `model_apply(concat_head=False)` — the latter avoids ever writing
    the concatenated head output.
    """
    levels, hw_shapes = [], []
    for p in preds:
        if isinstance(p, (tuple, list)):
            reg, cls = p
            b, h, w = reg.shape[0], reg.shape[1], reg.shape[2]
            assert cls.shape[-1] == num_classes
            levels.append((reg.reshape(b, h * w, reg.shape[-1]), cls.reshape(b, h * w, num_classes)))
        else:
            b, h, w, ct = p.shape
            flat = p.reshape(b, h * w, ct)
            levels.append((flat[..., : ct - num_classes], flat[..., ct - num_classes :]))
        hw_shapes.append((h, w))
    reg_max = levels[0][0].shape[-1] // 4
    assert levels[0][0].shape[-1] == 4 * reg_max
    return levels, hw_shapes, reg_max


def _gather_levels(level_arrays: Sequence[jnp.ndarray], idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows by global anchor index from per-level [B, HW_l, C] arrays.

    Equivalent to take_along_axis on the level concat, but without ever
    materializing the [B, A_total, C] array (the concat + its layout copies
    cost ~3 ms/step at bs128; three [B, k, C] gathers are negligible).

    Caveat (shared with any dot-based selection): the one-hot dot streams
    the WHOLE source through the accumulator, so a non-finite value at any
    anchor (0 * inf = nan) poisons every gathered row, where a gather would
    only corrupt its own selection. Detection outputs from a model emitting
    inf/nan activations are garbage either way; no sanitization pass is paid.
    """
    out = None
    off = 0
    for lv in level_arrays:
        hw = lv.shape[1]
        # One-hot row selection on the MXU: XLA's gather custom-call needs a
        # row-major layout copy of the whole source and then reads scattered
        # ~160-byte rows, while the dot streams the source once (measured
        # 2.0 -> 1.05 ms at [128,1600,80] k=300, experiments/exp_gather.py).
        # Out-of-level indices match no iota position -> all-zero rows, so
        # the cross-level merge needs no explicit mask. Each output element
        # is 1*x + 0*... accumulated in f32: bit-exact vs the gather.
        oh = (
            (idx - off)[..., None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, hw), 2)
        ).astype(lv.dtype)
        g = jax.lax.dot_general(
            oh, lv, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(lv.dtype)
        out = g if out is None else out + g
        off += hw
    return out


@partial(jax.jit, static_argnames=("num_classes", "strides", "max_det", "approx"))
def decode_topk(
    preds: Sequence,
    *,
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    max_det: int = 300,
    approx: bool = False,
) -> jnp.ndarray:
    """Official NMS-free two-stage top-k decode.

    Parity: leanyolo/models/yolov10/postprocess.py:167-261 (same two-stage
    selection: top-k anchors by best class score, then top-k over the
    flattened (anchor, class) pairs of the survivors; identical results
    including tie order). Ranking runs on logits (sigmoid is monotonic) and
    entirely per level: the [B, A, 4R+nc] level concat of the reference
    formulation never materializes, boxes decode only for the final
    selections, and gathers touch [B, k, C] slices only.

    Returns:
        [B, k, 6] with columns [x1, y1, x2, y2, score, cls]; k = min(max_det, A).
    """
    levels, hw_shapes, reg_max = _split_levels(list(preds), num_classes)
    b = levels[0][0].shape[0]
    a = sum(h * w for h, w in hw_shapes)
    nc = num_classes
    k = min(max_det, a)

    # Stage 1: best class per anchor, reduced per level (fuses into the head
    # convs' epilogues instead of re-reading a materialized concat).
    max_per_anchor = jnp.concatenate([jnp.max(cls, axis=-1) for _, cls in levels], axis=1)  # [B, A]
    _, top_anchor_idx = _topk(max_per_anchor, k, approx)  # [B, k]
    sel_logits = _gather_levels([cls for _, cls in levels], top_anchor_idx)  # [B, k, nc]

    # Stage 2: global top-k over the (anchor, class) pairs of the survivors.
    flat_logits, flat_idx = _topk(sel_logits.reshape(b, -1), k, approx)  # [B, k]
    scores = jax.nn.sigmoid(flat_logits.astype(jnp.float32))
    rel_anchor = flat_idx // nc
    cls_idx = (flat_idx % nc).astype(jnp.float32)
    final_anchor_idx = jnp.take_along_axis(top_anchor_idx, rel_anchor, axis=1)  # [B, k]

    # DFL + box decode densely PER LEVEL, then gather the k winners' [4]-wide
    # boxes. Gathering the 4*reg_max logit rows instead forces a layout copy
    # of the full [B, HW, 64] reg maps before XLA's gather (measured 1.3 ms
    # at bs128); the dense expectation fuses into the head conv epilogues and
    # the gather source shrinks 16x. Per-anchor math (and therefore results)
    # is identical to decoding after the gather.
    final_boxes = _gather_levels(
        _boxes_per_level(levels, hw_shapes, strides, reg_max), final_anchor_idx
    )  # [B, k, 4]
    return jnp.concatenate([final_boxes, scores[..., None], cls_idx[..., None]], axis=-1)


def _boxes_per_level(levels, hw_shapes, strides, reg_max):
    """Dense per-level DFL + box decode -> list of [B, HW_l, 4] pixel boxes.

    The dense expectation fuses into the head conv epilogues and shrinks the
    subsequent gather source 16x vs gathering raw 4*reg_max logit rows
    (see decode_topk's in-line measurement notes)."""
    out = []
    for (reg, _), (h, w), s in zip(levels, hw_shapes, strides):
        anchors_l, _ = make_anchors([(h, w)], [s], dtype=jnp.float32)  # [HW, 2]
        dist_l = dfl_expectation(reg.astype(jnp.float32), reg_max)  # [B, HW, 4]
        out.append(dist2bbox(dist_l, anchors_l[None], xywh=False) * float(s))
    return out


def _nms_single(
    boxes: jnp.ndarray,  # [K, 4]
    scores: jnp.ndarray,  # [K]
    cls_idx: jnp.ndarray,  # [K]
    *,
    iou_thresh: float,
    conf_thresh: float,
    max_det: int,
    class_wise: bool,
    group_offset: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS on one image's fixed-size candidate set -> ([max_det, 6], n).

    REQUIRES candidates in descending-score order (every caller feeds top-k
    output, which is sorted): the kernel then skips its own argsort+gather
    (measured 1.7 ms/batch at bs128/n=1000 — more than the whole blocked
    suppression solve, experiments/exp_nms_schedules.py) and conf-masked
    candidates enter as force-dead entries instead of being re-sorted away.
    """
    valid = scores > conf_thresh
    if class_wise:
        off = (cls_idx * group_offset)[:, None]
        nms_boxes = boxes + off
    else:
        nms_boxes = boxes
    keep = nms_fixed(nms_boxes, scores, iou_thresh, presorted=True, valid=valid) & valid

    # Compaction: survivors are already in descending-score (candidate)
    # order, so "top max_det survivors" is a STABLE PARTITION, not a top-k:
    # row j of the output is the j-th kept candidate. One cumsum gives each
    # survivor its slot; a one-hot dot moves the [K, 6] payload rows (exact
    # selection: each output element is 1*x accumulated in f32 — PROOF.md).
    # Replaces a topk_lastdim over the kept scores (+~1.7 ms/batch at
    # bs128/K=1000, experiments/exp_nms_anatomy.py).
    k_out = min(max_det, boxes.shape[0])
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1  # slot of each kept row
    payload = jnp.concatenate(
        [boxes, scores[:, None], cls_idx[:, None]], axis=-1
    ).astype(jnp.float32)  # [K, 6]
    onehot = (
        (keep[None, :])
        & (pos[None, :] == jax.lax.broadcasted_iota(jnp.int32, (k_out, 1), 0))
    ).astype(jnp.float32)  # [k_out, K]
    dets = jax.lax.dot_general(
        onehot, payload, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [k_out, 6]; slots past the survivor count match nothing -> zero rows
    num = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), k_out)
    if k_out < max_det:
        dets = jnp.pad(dets, ((0, max_det - k_out), (0, 0)))
    return dets, num


@partial(
    jax.jit,
    static_argnames=(
        "num_classes", "strides", "conf_thresh", "iou_thresh", "max_det", "pre_topk", "class_wise", "multi_label", "approx",
    ),
)
def decode_nms(
    preds: Sequence[jnp.ndarray],
    *,
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1000,
    class_wise: bool = False,
    multi_label: bool = False,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Confidence filter + greedy NMS with a fixed-shape contract.

    Behavior follows the reference NMS decode
    (leanyolo/models/yolov10/postprocess.py:104-163: best-class-per-anchor
    candidates, plain greedy NMS, max_det cap); the fixed-shape mechanics —
    pre-top-k candidate capping, class+image offset trick (`class_wise=True`),
    and the `(detections, num_dets)` output — follow the export wrapper
    (models/yolov10/export.py:145-198).

    Args:
        multi_label: if True, candidates are the top (anchor, class) pairs
            (export wrapper semantics); if False, one candidate per anchor at
            its best class (postprocess.py semantics).

    Returns:
        detections: [B, max_det, 6]; invalid rows zeroed.
        num_dets: [B] int32 count of valid rows (valid rows come first).
    """
    levels, hw_shapes, reg_max = _split_levels(list(preds), num_classes)
    b = levels[0][0].shape[0]
    a = sum(h * w for h, w in hw_shapes)
    nc = num_classes

    # Candidate selection runs entirely PER LEVEL (the [B, A, 4R+nc] level
    # concat of the reference formulation never materializes — at bs128/640px
    # that array is ~310 MB of pure HBM traffic; the per-level reductions fuse
    # into the head conv epilogues instead).
    if multi_label:
        # Export-wrapper semantics (reference export.py:149-156): top (anchor,
        # class) pairs over all levels. Per-level top-k in GLOBAL pair index,
        # then an exact [B, 3k]-wide merge.
        k_pre = min(pre_topk, a * nc)
        merged_logits, merged_pair = [], []
        off = 0
        for _, cls in levels:
            hw = cls.shape[1]
            k_l = min(k_pre, hw * nc)
            v, p = _topk(cls.reshape(b, hw * nc), k_l, approx)
            merged_logits.append(v)
            merged_pair.append((p // nc + off) * nc + p % nc)  # global pair idx
            off += hw
        cat_logits = jnp.concatenate(merged_logits, axis=1)
        cat_pair = jnp.concatenate(merged_pair, axis=1)
        cand_logits, pos = _topk(cat_logits, k_pre, approx)
        pre_idx = jnp.take_along_axis(cat_pair, pos, axis=1)
        anc_idx = pre_idx // nc
        cand_cls = (pre_idx % nc).astype(jnp.float32)
    else:
        # postprocess.py semantics: one candidate per anchor at its best
        # class. Max and argmax fuse into ONE packed-key reduce per level
        # (ops/topk.py::max_argmax_lastdim) — a separate dense argmax costs
        # a second full pass over the [B, A, nc] class maps (+1.25 ms/batch
        # at bs128, experiments/exp_nms_anatomy.py).
        per_level = [max_argmax_lastdim(cls) for _, cls in levels]
        best_logits = jnp.concatenate([v for v, _ in per_level], axis=1)
        best_cls = jnp.concatenate([i for _, i in per_level], axis=1)
        k_pre = min(pre_topk, a)
        cand_logits, anc_idx = _topk(best_logits, k_pre, approx)
        cand_cls = jnp.take_along_axis(best_cls, anc_idx, axis=1).astype(jnp.float32)
    cand_scores = jax.nn.sigmoid(cand_logits.astype(jnp.float32))
    cand_boxes = _gather_levels(
        _boxes_per_level(levels, hw_shapes, strides, reg_max), anc_idx
    )  # [B, k_pre, 4]

    # Offset per class only: batch separation is free because we vmap.
    group_offset = 8192.0 * 10.0
    fn = partial(
        _nms_single,
        iou_thresh=iou_thresh,
        conf_thresh=conf_thresh,
        max_det=max_det,
        class_wise=class_wise,
        group_offset=group_offset,
    )
    return jax.vmap(fn)(cand_boxes, cand_scores, cand_cls)


@partial(jax.jit, static_argnames=("num_classes", "strides", "conf_thresh", "iou_thresh", "max_det", "pre_topk"))
def decode_direct_nms(
    preds: Sequence[jnp.ndarray],
    *,
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_det: int = 300,
    pre_topk: int = 1000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Legacy direct-offset layout decode ([B, H, W, 4 + nc] per level).

    Parity: leanyolo/models/yolov10/postprocess.py:70-102 — sigmoid center
    offsets plus exp width/height, then the same fixed-shape NMS as above.
    """
    b = preds[0].shape[0]
    boxes_l, scores_l = [], []
    for p, s in zip(preds, strides):
        _, h, w, c = p.shape
        assert c == 4 + num_classes
        flat = p.reshape(b, h * w, c)
        bbox, cls_logits = flat[..., :4], flat[..., 4:]
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=p.dtype), jnp.arange(w, dtype=p.dtype), indexing="ij")
        gx = gx.reshape(1, -1)
        gy = gy.reshape(1, -1)
        cx = (jax.nn.sigmoid(bbox[..., 0]) + gx) * s
        cy = (jax.nn.sigmoid(bbox[..., 1]) + gy) * s
        bw = jnp.exp(bbox[..., 2]) * s
        bh = jnp.exp(bbox[..., 3]) * s
        boxes_l.append(jnp.stack((cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2), axis=-1))
        scores_l.append(jax.nn.sigmoid(cls_logits))
    boxes = jnp.concatenate(boxes_l, axis=1)
    scores_all = jnp.concatenate(scores_l, axis=1)

    best_scores = jnp.max(scores_all, axis=-1)
    best_cls = jnp.argmax(scores_all, axis=-1).astype(boxes.dtype)
    k_pre = min(pre_topk, boxes.shape[1])
    cand_scores, anc_idx = jax.lax.top_k(best_scores, k_pre)
    cand_cls = jnp.take_along_axis(best_cls, anc_idx, axis=1)
    cand_boxes = jnp.take_along_axis(boxes, anc_idx[..., None], axis=1)

    fn = partial(
        _nms_single,
        iou_thresh=iou_thresh,
        conf_thresh=conf_thresh,
        max_det=max_det,
        class_wise=False,
        group_offset=0.0,
    )
    return jax.vmap(fn)(cand_boxes, cand_scores, cand_cls)


def detections_to_list(dets, num_dets=None, conf_thresh: float = 0.0) -> List:
    """Host-side: fixed [B, k, 6] -> list of per-image numpy arrays [Ni, 6].

    Mirrors the reference's nested-list return type
    (postprocess.py:148-163, 261) at the numpy boundary.
    """
    import numpy as np

    dets = np.asarray(dets)
    num_dets = None if num_dets is None else np.asarray(num_dets)  # ONE d2h transfer
    out = []
    for i in range(dets.shape[0]):
        d = dets[i]
        if num_dets is not None:
            d = d[: int(num_dets[i])]
        if conf_thresh > 0:
            d = d[d[:, 4] > conf_thresh]
        out.append(d)
    return out


def postprocess_to_original(dets, num, metas, *, decode: str, conf_thresh: float, apply_conf_filter: bool) -> List:
    """Host-side: fixed-shape device results -> per-image arrays in
    ORIGINAL-image coordinates (the shared tail of Predictor.predict_images
    and BucketedServing.predict_images).

    Row selection matches the reference pipelines: topk mode filters by conf
    (or returns all rows when apply_conf_filter=False); nms mode truncates
    to num_dets. `metas` is [(gain, pad, orig_hw)] from the letterbox step.
    """
    import numpy as np

    selected = detections_to_list(
        dets,
        num_dets=None if decode == "topk" else num,
        conf_thresh=conf_thresh if (decode == "topk" and apply_conf_filter) else 0.0,
    )
    out = []
    for d, (gain, pad, orig_hw) in zip(selected, metas):
        if len(d):
            # Host numpy (NOT eager jnp): per-image [Ni,4] math would
            # otherwise dispatch ~8 tiny device ops + transfers per image
            # through the tunnel. Same formulas as ops.boxes.
            # unletterbox_coords (parity: leanyolo/utils/box_ops.py:96-124).
            (gw, gh), (px, py), (h, w) = gain, pad, orig_hw
            b = d[:, :4].astype(np.float32, copy=True)
            b[:, 0::2] = ((b[:, 0::2] - px) / gw).clip(0, w)
            b[:, 1::2] = ((b[:, 1::2] - py) / gh).clip(0, h)
            d = np.concatenate([b, d[:, 4:6]], axis=1)
        out.append(d)
    return out
