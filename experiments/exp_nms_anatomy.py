"""decode_nms candidate-selection anatomy on the chip (round 4).

After the blocked-presorted NMS landed (suppression solve: 0.8 ms/batch),
the nms path still trails decode_topk by ~6 ms/batch at bs128. The NMS
decode differs from topk in its candidate stage; this probe times each
component and the design alternatives:

  A. decode_topk total / decode_nms total (context)
  B. candidate stage only (decode_nms minus NMS+compaction)
  C. top-k width: topk_lastdim k=300 vs k=1000 on [B, 8400]
  D. dense per-anchor argmax cost (best_cls): with vs without
  E. box gather at k=1000/k=300: one-hot MXU dot (round-2 winner at
     [128,1600,80]/k=300) vs concat + take_along_axis — for the 4-wide box
     source the one-hot operand is [B, k, A] bf16 (2.1 GB at k=1000!) while
     the concat source is only 17 MB, so the round-2 ruling may invert.

Timing: chained fori_loop + readback, min of 3 (CLAUDE.md protocol).
Writes experiments/logs/nms_anatomy.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")
B, NC, RM = 128, 80, 16
HWS = [(80, 80), (40, 40), (20, 20)]
STRIDES = (8, 16, 32)


def make_preds(seed=0):
    rng = np.random.RandomState(seed)
    preds = []
    for h, w in HWS:
        reg = rng.normal(0, 1, (B, h, w, 4 * RM)).astype(np.float32)
        cls = rng.normal(-4, 2, (B, h, w, NC)).astype(np.float32)
        preds.append((reg.astype(np.dtype("bfloat16")), cls.astype(np.dtype("bfloat16"))))
    return preds


def timed(fn, *args, chain=32):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("m",))
    def chained(a, m):
        def body(_, x):
            out = fn(x)
            return x + (jnp.tanh(out) * 1e-30).astype(x.dtype)

        x = jax.lax.fori_loop(0, m, body, a)
        return jnp.sum(x[0].astype(jnp.float32))

    a = args[0]
    float(chained(a, chain))
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(a, chain))
        walls.append(time.perf_counter() - t0)
    return min(walls) / chain * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.decode import (
        _boxes_per_level,
        _gather_levels,
        _split_levels,
        decode_nms,
        decode_topk,
    )
    from leanyolo_tpu.ops.topk import topk_lastdim
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    preds_np = make_preds()
    # One flat carrier so `timed` can perturb a single array: rebuild tuple
    # views inside the jitted fn from one packed [B, X] buffer.
    sizes = [(h * w * 4 * RM, h * w * NC) for h, w in HWS]
    flat = np.concatenate(
        [np.concatenate([r.reshape(B, -1).astype(np.float32), c.reshape(B, -1).astype(np.float32)], axis=1)
         for (r, c) in preds_np], axis=1)
    flat = jnp.asarray(flat.astype(np.dtype("bfloat16")))

    def unpack(x):
        preds, off = [], 0
        for (h, w), (nr, ncl) in zip(HWS, sizes):
            reg = x[:, off:off + nr].reshape(B, h, w, 4 * RM)
            off += nr
            cls = x[:, off:off + ncl].reshape(B, h, w, NC)
            off += ncl
            preds.append((reg, cls))
        return preds

    out = {}

    def rec(name, ms):
        out[name] = round(ms, 3)
        print(f"{name:34s} {ms:8.3f} ms/batch", flush=True)

    rec("decode_topk_total", timed(lambda x: jnp.sum(decode_topk(unpack(x), num_classes=NC, strides=STRIDES, max_det=300)), flat))
    rec("decode_nms_total", timed(lambda x: jnp.sum(
        decode_nms(unpack(x), num_classes=NC, strides=STRIDES, conf_thresh=0.25,
                   iou_thresh=0.45, max_det=300, pre_topk=1000, class_wise=True)[0]), flat))

    def candidates_only(x, k_pre, with_cls, gather):
        levels, hw_shapes, reg_max = _split_levels(unpack(x), NC)
        best_logits = jnp.concatenate([jnp.max(cls, axis=-1) for _, cls in levels], axis=1)
        acc = jnp.sum(best_logits) * 0
        if with_cls:
            best_cls = jnp.concatenate([jnp.argmax(cls, axis=-1).astype(jnp.int32) for _, cls in levels], axis=1)
        cand_logits, anc_idx = topk_lastdim(best_logits, k_pre)
        if with_cls:
            acc = acc + jnp.sum(jnp.take_along_axis(best_cls, anc_idx, axis=1))
        boxes_l = _boxes_per_level(levels, hw_shapes, STRIDES, reg_max)
        if gather == "onehot":
            cand_boxes = _gather_levels(boxes_l, anc_idx)
        else:
            cand_boxes = jnp.take_along_axis(
                jnp.concatenate(boxes_l, axis=1), anc_idx[..., None], axis=1)
        return jnp.sum(cand_boxes) + jnp.sum(cand_logits) + acc

    for k_pre in (300, 1000):
        for gather in ("onehot", "concat_gather"):
            rec(f"cand_k{k_pre}_{gather}_nocls",
                timed(lambda x, k=k_pre, g=gather: candidates_only(x, k, False, g), flat))
    rec("cand_k1000_concat_gather_withcls",
        timed(lambda x: candidates_only(x, 1000, True, "concat_gather"), flat))
    rec("cand_k1000_onehot_withcls",
        timed(lambda x: candidates_only(x, 1000, True, "onehot"), flat))

    # top-k width on [B, A]
    def tk(x, k):
        levels, _, _ = _split_levels(unpack(x), NC)
        best = jnp.concatenate([jnp.max(cls, axis=-1) for _, cls in levels], axis=1)
        v, i = topk_lastdim(best, k)
        return jnp.sum(v) + jnp.sum(i)

    rec("maxred_topk300", timed(lambda x: tk(x, 300), flat))
    rec("maxred_topk1000", timed(lambda x: tk(x, 1000), flat))

    os.makedirs(LOG_DIR, exist_ok=True)
    with open(os.path.join(LOG_DIR, "nms_anatomy.json"), "w", encoding="utf-8") as f:
        json.dump({"bs": B, "ms_per_batch": out}, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
