"""Measure greedy-NMS schedules on the chip: serial vs Jacobi vs blocked.

Round-4 probe behind the class-wise NMS decode closure (PERF.md). The three
exact-greedy schedules for the triangular suppression recursion:

  serial  — 1000-trip fori_loop, one candidate per trip (round-3 shipping
            form; the [n,n] IoU matrix is materialized once).
  jacobi  — global fixed-point sweeps; [n]x[n,n] MXU matvec per sweep, but
            every sweep re-reads the [n,n] suppression matrix from HBM.
  blocked — blocked forward-substitution (ops/boxes.py::_alive_blocked):
            per block, IoU rows computed on the fly, intra-block Jacobi in
            VMEM, one [m]x[m,n] matvec downstream; each suppression pair is
            produced/consumed exactly once.

Candidates mimic decode_nms output at bs128/n=1000 in three regimes
(sparse / mixed / dense-clustered — suppression-chain depth is the axis the
schedules differ on). Timing: chained fori_loop with a data dependence +
host readback (CLAUDE.md protocol), min over 3 runs (ADVICE r3).

Usage: python experiments/exp_nms_schedules.py [--bs 128] [--n 1000]
Writes experiments/logs/nms_schedules.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs")


def make_candidates(bs: int, n: int, regime: str, seed: int = 0):
    """[bs, n, 4] boxes + [bs, n] scores with decode-like statistics."""
    rng = np.random.RandomState(seed)
    if regime == "sparse":
        xy = rng.uniform(0, 640, (bs, n, 2))
        wh = rng.uniform(8, 60, (bs, n, 2))
    elif regime == "dense":
        # Detections cluster around ~12 objects/image: deep chains.
        centers = rng.uniform(80, 560, (bs, 12, 2))
        pick = rng.randint(0, 12, (bs, n))
        base = np.take_along_axis(centers, pick[..., None].repeat(2, -1), axis=1)
        xy = base + rng.normal(0, 12, (bs, n, 2))
        wh = rng.uniform(40, 160, (bs, n, 2))
    else:  # mixed
        half = n // 2
        a_xy = rng.uniform(0, 640, (bs, half, 2))
        a_wh = rng.uniform(8, 60, (bs, half, 2))
        centers = rng.uniform(80, 560, (bs, 8, 2))
        pick = rng.randint(0, 8, (bs, n - half))
        b_xy = np.take_along_axis(centers, pick[..., None].repeat(2, -1), axis=1) + rng.normal(0, 10, (bs, n - half, 2))
        b_wh = rng.uniform(40, 140, (bs, n - half, 2))
        xy = np.concatenate([a_xy, b_xy], axis=1)
        wh = np.concatenate([a_wh, b_wh], axis=1)
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, (bs, n)).astype(np.float32)
    # ~30% below a 0.25-conf mask, like real candidate sets.
    scores[rng.uniform(size=scores.shape) < 0.3] = -np.inf
    return boxes, scores


def alive_serial(boxes_s, iou_thresh):
    """Round-3 shipping schedule: n-trip serial scan over sorted candidates."""
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.ops.boxes import box_iou

    n = boxes_s.shape[0]
    iou = box_iou(boxes_s, boxes_s)
    rank = jnp.arange(n)
    supp = (iou > iou_thresh) & (rank[:, None] < rank[None, :])

    def body(i, state):
        alive, killed = state
        a_i = alive[i] & ~killed[i]
        killed = killed | (supp[i] & a_i)
        return alive.at[i].set(a_i), killed

    alive0 = jnp.ones((n,), bool)
    killed0 = jnp.zeros((n,), bool)
    alive, _ = jax.lax.fori_loop(0, n, body, (alive0, killed0))
    return alive


def bench_schedule(name: str, bs: int, n: int, regime: str, chain: int = 32, iou_thresh: float = 0.45):
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.ops.boxes import _alive_blocked, _alive_jacobi

    if name == "sortonly":
        fn1 = lambda b: b[:, 0] > -1e30  # argsort+gather cost floor
    elif name == "serial":
        fn1 = lambda b: alive_serial(b, iou_thresh)
    elif name == "jacobi":
        fn1 = lambda b: _alive_jacobi(b, iou_thresh)
    else:
        block = int(name.split("-")[1])
        fn1 = lambda b: _alive_blocked(b, iou_thresh, block)

    boxes_np, scores_np = make_candidates(bs, n, regime)
    presorted = name.endswith("-ps")

    def one(boxes, scores):
        if presorted:
            # decode_nms candidates arrive score-sorted from top-k: no sort.
            return fn1(boxes)
        order = jnp.argsort(-scores)
        alive = fn1(jnp.take_along_axis(boxes, order[:, None], axis=0))
        return alive

    @partial(jax.jit, static_argnames=("m",))
    def chained(boxes, scores, m):
        def body(_, s):
            alive = jax.vmap(one)(boxes, s)
            # Data dependence: perturb scores by an amount that cannot change
            # any comparison (scores are >= 0.01 apart w.p. 1; 1e-12 shifts
            # every candidate equally per image anyway).
            return s + jnp.sum(alive, axis=1, keepdims=True).astype(s.dtype) * 1e-12

        s = jax.lax.fori_loop(0, m, body, scores)
        return jnp.sum(s[0])

    b = jnp.asarray(boxes_np)
    s0 = jnp.asarray(scores_np)
    float(chained(b, s0, chain))  # compile + warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(b, s0, chain))
        walls.append(time.perf_counter() - t0)
    ms_per_batch = min(walls) / chain * 1e3
    return ms_per_batch


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--schedules", default="serial,jacobi,blocked-64,blocked-128,blocked-256")
    p.add_argument("--regimes", default="sparse,mixed,dense")
    args = p.parse_args()

    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    out = {"bs": args.bs, "n": args.n, "ms_per_batch": {}}
    for regime in args.regimes.split(","):
        for name in args.schedules.split(","):
            ms = bench_schedule(name, args.bs, args.n, regime)
            out["ms_per_batch"][f"{regime}/{name}"] = round(ms, 3)
            print(f"{regime:7s} {name:12s} {ms:8.3f} ms/batch "
                  f"({args.bs/ms*1e3:,.0f} img/s NMS-stage-only)", flush=True)
    os.makedirs(LOG_DIR, exist_ok=True)
    with open(os.path.join(LOG_DIR, "nms_schedules.json"), "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
