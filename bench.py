"""Benchmark: yolov10s end-to-end inference throughput on one chip.

Measures the jitted normalize->backbone->neck->head->top-k-decode program at
640x640 in bf16 (fp32 accumulation on the MXU) — the headline BASELINE.json
metric (images/sec/chip). Prints ONE JSON line.

Measurement notes: on the axon-tunneled TPU, block_until_ready can return
before remote completion and repeated identical executions may be cached, so
the benchmark (a) chains iterations with a data dependence inside ONE jitted
fori_loop program and (b) forces a host readback of a scalar — one tunnel
round-trip amortized over all iterations.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported against 1.0.
"""

from __future__ import annotations

import json
import time


def bench_variant(variant: str = "yolov10s", imgsz: int = 640, batch_sizes=(32, 128), chain: int = 16, approx: bool = False, dp: int = 0, sp: int = 0, decode: str = "topk") -> dict:
    """decode: 'topk' (headline NMS-free path) or 'nms' (class-wise greedy NMS,
    BASELINE config 3: conf 0.25 / IoU 0.45 / pre_topk 1000, class_wise=True —
    behavioral spec reference: leanyolo/models/yolov10/export.py:145-198)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from leanyolo_tpu.models.yolov10.decode import decode_nms, decode_topk
    from leanyolo_tpu.models.yolov10.fold import fold_params
    from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply

    # Multi-chip hooks (PERF.md round-3 scaling model): --data-parallel
    # shards the batch over a 1-D mesh, --spatial-parallel shards H over a
    # (1, sp) mesh. Input placement is the only sharding annotation needed —
    # GSPMD propagates it through the jit (params replicate via device_put).
    mesh = None
    if dp > 1 or sp > 1:
        from leanyolo_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_sp_mesh(1, sp) if sp > 1 else pmesh.make_mesh(dp)
        in_sharding = pmesh.image_sharded(mesh)

    model = YOLOv10.create(variant, class_names=[f"c{i}" for i in range(80)])
    cfg = model.cfg
    # BN-folded + RepVGGDW-fused serving params (mathematically equivalent),
    # staged bf16 like the product Predictor (fuse+bf16) — bitwise-identical
    # to per-use casts (fold.py), no weight-convert ops per call.
    params = fold_params(model.params, dtype=jnp.bfloat16)
    if mesh is not None:
        from leanyolo_tpu.parallel.mesh import replicated

        params = jax.device_put(params, replicated(mesh))
    else:
        params = jax.device_put(params)

    def forward(p, images):
        # Params are folded (normalization lives in conv0), the head skips
        # its concat (decode consumes reg/cls per level), and the decode is
        # the exact official top-k (approx=False) for the honest headline.
        raw = model_apply(
            p, images.astype(jnp.bfloat16), cfg, train=False, branches=("one2one",),
            normalize=False, concat_head=False,
        )
        if decode == "nms":
            dets, num = decode_nms(
                raw["one2one"], num_classes=80, strides=cfg.strides,
                conf_thresh=0.25, iou_thresh=0.45, max_det=300,
                pre_topk=1000, class_wise=True,
            )
            return dets + num[:, None, None].astype(dets.dtype) * 0.0
        return decode_topk(raw["one2one"], num_classes=80, strides=cfg.strides, max_det=300, approx=approx)

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def chained(p, images, n):
        def body(_, x):
            dets = forward(p, x)
            # Data dependence so iterations can't be elided or deduplicated:
            # tanh of a runtime sum is not constant-foldable, and the uint8
            # cast of ~1e-30 is 0 at runtime, so pixels stay valid.
            return x + (jnp.tanh(jnp.sum(dets)) * 1e-30).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, images)
        return jnp.sum(x[0, 0, 0].astype(jnp.float32))

    results = {}
    best_ips, best_bs = 0.0, 0
    for bs in batch_sizes:
        # uint8 raw pixels, as a real serving pipeline delivers them (image
        # decoders emit uint8); the uint8->bf16 cast is part of the measured
        # program. An f32 input would instead measure a 4x-larger HBM read
        # plus a full-res f32->bf16 convert that no production path performs.
        x0 = jnp.asarray(np.random.RandomState(0).randint(0, 256, (bs, imgsz, imgsz, 3), np.uint8))
        x1 = jnp.asarray(np.random.RandomState(1).randint(0, 256, (bs, imgsz, imgsz, 3), np.uint8))
        if mesh is not None:
            x0 = jax.device_put(x0, in_sharding)
            x1 = jax.device_put(x1, in_sharding)
        try:
            float(chained(params, x0, chain))  # compile + warm at the same static n
        except Exception:
            break
        t0 = time.perf_counter()
        s = float(chained(params, x1, chain))  # fresh input: no result caching
        dt = time.perf_counter() - t0
        assert np.isfinite(s)
        ips = chain * bs / dt
        results[bs] = ips
        if ips > best_ips:
            best_ips, best_bs = ips, bs
    return {"best_ips": best_ips, "best_bs": best_bs, "per_bs": results}


def bench_latency(variant: str = "yolov10s", imgsz: int = 640, chains=(64, 256), decode: str = "topk") -> dict:
    """Single-image serving latency via a chain-length sweep.

    A single wall/step at one chain length conflates the fixed per-CALL
    host overhead (25-50 ms through the axon tunnel, varies run-to-run)
    with the true per-step device latency. Fit wall(n) = overhead + n*step
    over two chain lengths instead (PERF.md "Single-image latency,
    revisited"). Reuses bench_variant's chained harness at bs=1.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from functools import partial

    from leanyolo_tpu.models.yolov10.decode import decode_nms, decode_topk
    from leanyolo_tpu.models.yolov10.fold import fold_params
    from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply

    model = YOLOv10.create(variant, class_names=[f"c{i}" for i in range(80)])
    cfg = model.cfg
    params = jax.device_put(fold_params(model.params, dtype=jnp.bfloat16))

    def forward(p, images):
        raw = model_apply(
            p, images.astype(jnp.bfloat16), cfg, train=False, branches=("one2one",),
            normalize=False, concat_head=False,
        )
        if decode == "nms":
            dets, num = decode_nms(
                raw["one2one"], num_classes=80, strides=cfg.strides,
                conf_thresh=0.25, iou_thresh=0.45, max_det=300,
                pre_topk=1000, class_wise=True,
            )
            return dets + num[:, None, None].astype(dets.dtype) * 0.0
        return decode_topk(raw["one2one"], num_classes=80, strides=cfg.strides, max_det=300)

    @partial(jax.jit, static_argnames=("n",))
    def chained(p, images, n):
        def body(_, x):
            dets = forward(p, x)
            return x + (jnp.tanh(jnp.sum(dets)) * 1e-30).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, images)
        return jnp.sum(x[0, 0, 0].astype(jnp.float32))

    x0 = jnp.asarray(np.random.RandomState(0).randint(0, 256, (1, imgsz, imgsz, 3), np.uint8))
    x1 = jnp.asarray(np.random.RandomState(1).randint(0, 256, (1, imgsz, imgsz, 3), np.uint8))
    walls = {}
    for n in chains:
        float(chained(params, x0, n))  # compile + warm at the same static n
        t0 = time.perf_counter()
        s = float(chained(params, x1, n))
        walls[n] = time.perf_counter() - t0
        assert np.isfinite(s)
    n1, n2 = min(chains), max(chains)
    step_ms = (walls[n2] - walls[n1]) / (n2 - n1) * 1e3
    overhead_ms = walls[n1] * 1e3 - n1 * step_ms
    return {
        "step_ms": step_ms,
        "per_call_overhead_ms": overhead_ms,
        "wall_ms_per_step": {str(n): walls[n] / n * 1e3 for n in chains},
    }


def wait_for_backend(max_wait_s: float = 1500.0, probe_timeout_s: float = 120.0) -> None:
    """Block until the device backend initializes, bounded.

    The axon tunnel occasionally goes down for stretches; in-process
    jax.devices() then HANGS in backend init (unkillable from Python), so
    probe in a SUBPROCESS with a timeout and retry until max_wait_s. Raises
    after the budget so the caller fails loudly instead of hanging forever.
    """
    import os
    import subprocess
    import sys

    # The headline numbers are per-CHIP; a silent CPU fallback would emit a
    # bogus measurement. Local CPU debugging can opt in explicitly.
    allow_cpu = os.environ.get("LEANYOLO_BENCH_ALLOW_CPU", "") == "1"
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    last_stderr = ""
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
                timeout=probe_timeout_s, capture_output=True, text=True,
            )
            platform = out.stdout.strip().split("\n")[-1] if out.returncode == 0 else ""
            if platform and (platform != "cpu" or allow_cpu):
                return
            if out.returncode != 0:
                last_stderr = out.stderr.strip().split("\n")[-1] if out.stderr else ""
                # A tunnel outage surfaces as a long hang then UNAVAILABLE —
                # worth retrying. A deterministic local failure (broken
                # install, bad plugin config) fails instantly with a Python
                # traceback; retrying that for 25 min only hides the cause.
                if "Error" in last_stderr and "UNAVAILABLE" not in last_stderr:
                    raise RuntimeError(
                        f"backend probe failed deterministically (not a tunnel outage): {last_stderr}"
                    )
            why = (
                "found only CPU (set LEANYOLO_BENCH_ALLOW_CPU=1 to bench it)"
                if platform == "cpu"
                else f"failed: {last_stderr or 'no stderr'}"
            )
        except subprocess.TimeoutExpired:
            why = f"timed out after {probe_timeout_s:.0f}s"
        if time.monotonic() >= deadline:
            raise RuntimeError(
                f"device backend unavailable after {max_wait_s:.0f}s ({attempt} probes; "
                f"last: {why}) — axon tunnel down? (CLAUDE.md environment gotchas)"
            )
        print(f"backend probe {attempt} {why}; retrying...", flush=True)
        time.sleep(30.0)


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description="leanyolo-tpu inference benchmark")
    p.add_argument("--variant", default="yolov10s")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-sizes", default="32,128")
    p.add_argument("--approx", action="store_true", help="approx_max_k decode (headline stays exact)")
    p.add_argument("--decode", default="topk", choices=("topk", "nms"),
                   help="decode path: topk (NMS-free headline) or nms (class-wise greedy NMS, BASELINE config 3)")
    p.add_argument("--data-parallel", type=int, default=0, metavar="N", help="shard the batch over an N-chip mesh")
    p.add_argument("--spatial-parallel", type=int, default=0, metavar="N", help="shard image height over an N-chip mesh (bs1-latency axis)")
    p.add_argument("--latency", action="store_true",
                   help="bs1 serving latency via chain-length sweep (fits out the per-call overhead)")
    args = p.parse_args()

    wait_for_backend()
    # Persistent, host-fingerprinted compile cache (utils/compile_cache.py):
    # a full-model chained program costs minutes to compile through the axon
    # plugin; caching only skips compilation, never the timed execution.
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    if args.latency:
        r = bench_latency(args.variant, args.imgsz, decode=args.decode)
        decode_tag = "" if args.decode == "topk" else f"_{args.decode}"
        print(json.dumps({
            "metric": f"{args.variant}_{args.imgsz}_bf16{decode_tag}_bs1_latency_ms",
            "value": round(r["step_ms"], 3),
            "unit": "ms/image",
            "vs_baseline": round(r["step_ms"], 3),
            "detail": {
                "per_call_overhead_ms": round(r["per_call_overhead_ms"], 1),
                "wall_ms_per_step_by_chain": {k: round(v, 3) for k, v in r["wall_ms_per_step"].items()},
            },
        }))
        return
    r = bench_variant(
        args.variant, args.imgsz, tuple(int(b) for b in args.batch_sizes.split(",")),
        approx=args.approx, dp=args.data_parallel, sp=args.spatial_parallel, decode=args.decode,
    )
    decode_tag = "" if args.decode == "topk" else f"_{args.decode}"
    print(
        json.dumps(
            {
                "metric": f"{args.variant}_{args.imgsz}_bf16{decode_tag}_images_per_sec_per_chip",
                "value": round(r["best_ips"], 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(r["best_ips"] / 1.0, 2),
                "detail": {
                    "batch_size": r["best_bs"],
                    "per_batch_size": {str(k): round(v, 2) for k, v in r["per_bs"].items()},
                    # With --data-parallel/--spatial-parallel the value is
                    # AGGREGATE mesh throughput, not per-chip.
                    **({"mesh": {"dp": args.data_parallel, "sp": args.spatial_parallel}}
                       if (args.data_parallel > 1 or args.spatial_parallel > 1) else {}),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
