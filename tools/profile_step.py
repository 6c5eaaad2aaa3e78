"""Profile one inference or training step on device and print the op table.

Captures a ``jax.profiler`` trace of N steps of the jitted hot path and
aggregates XLA op time per family — the exact instrument the PERF.md
optimization campaigns used, productized. The reference framework has no
profiling tool (SURVEY.md §5); on TPU this is how you find the next
bottleneck.

Examples:
    python tools/profile_step.py --mode infer --model yolov10s \
        --imgsz 640 --batch-size 128 --dtype bf16 --fuse
    python tools/profile_step.py --mode train --model yolov10s \
        --imgsz 640 --batch-size 32 --out-dir /tmp/prof --json prof.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", default="yolov10s")
    p.add_argument("--weights", default="none", help="'none' (random), 'PRETRAINED_COCO', or a checkpoint path")
    p.add_argument("--mode", choices=["infer", "train"], default="infer")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--dtype", choices=["float32", "bf16"], default="bf16")
    p.add_argument("--decode", choices=["topk", "nms"], default="topk")
    p.add_argument("--fuse", action="store_true", help="fold BN/norm into conv weights (serving path)")
    p.add_argument("--steps", type=int, default=3, help="profiled steps (after one warmup)")
    p.add_argument("--max-boxes", type=int, default=32, help="train mode: GT pad per image")
    p.add_argument("--out-dir", default="/tmp/leanyolo_tpu_prof")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--json", default=None, help="also dump the family table as JSON here")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import numpy as np

    from leanyolo_tpu import get_model
    from leanyolo_tpu.utils.profiling import capture_trace, format_table, summarize_trace

    weights = None if args.weights in ("none", "None", "") else args.weights
    model = get_model(args.model, weights=weights, class_names=[f"c{i}" for i in range(80)])

    rng = np.random.RandomState(0)
    if args.mode == "infer":
        import jax.numpy as jnp

        from leanyolo_tpu.engine.predictor import Predictor

        pred = Predictor(
            model, imgsz=args.imgsz, decode=args.decode, dtype=args.dtype,
            donate=False, fuse=args.fuse,
        )
        x = jnp.asarray(rng.randint(0, 256, (args.batch_size, args.imgsz, args.imgsz, 3)).astype(np.uint8))
        step = lambda: pred.run_batch(x)[0].block_until_ready()
    else:
        import jax

        from leanyolo_tpu.data.dataset import Batch
        from leanyolo_tpu.engine.trainer import Trainer, TrainConfig

        cfg = TrainConfig(
            epochs=1, steps_per_epoch=1, augment=True, grad_clip=1.0,
            bf16=args.dtype in ("bf16", "bfloat16"),
        )
        trainer = Trainer(model, cfg)
        b, n = args.batch_size, args.max_boxes
        batch = Batch(
            rng.randint(0, 256, (b, args.imgsz, args.imgsz, 3)).astype(np.uint8),
            rng.randint(0, 80, (b, n)).astype(np.int32),
            np.tile(np.asarray([4.0, 4.0, float(args.imgsz) / 2, float(args.imgsz) / 2], np.float32), (b, n, 1)),
            np.ones((b, n), bool),
            [None] * b,
        )
        key = jax.random.PRNGKey(0)

        def step():
            losses = trainer.train_step(batch, key)
            jax.block_until_ready(losses["total"])

    step()  # warmup/compile outside the trace
    with capture_trace(args.out_dir):
        for _ in range(args.steps):
            step()

    summary = summarize_trace(args.out_dir, steps=args.steps)
    print(format_table(summary, top=args.top))
    if args.json:
        with open(args.json, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "plane": summary.plane,
                    "total_ms_per_step": summary.total_ms,
                    "steps": summary.steps,
                    "families": [
                        {"name": fa.name, "ms_per_step": fa.total_ms, "count": fa.count, "example": fa.example}
                        for fa in summary.families
                    ],
                },
                f,
                indent=2,
            )
        print(f"json: {args.json}")


if __name__ == "__main__":
    main()
