"""Convergence gate for the SQA QT tier: a backend-insensitive loss-curve
arm plus a chip-calibrated held-out-mAP arm.

Why two arms: the identical seeded 30-epoch run lands at held-out mAP50
0.497 on the chip but 0.077 on CPU (both bit-reproducible) — CPU bf16
numerics shift the steep part of the learning curve ~10 epochs, so a single
mAP threshold measures backend numerics as much as "training works"
(2026-08-19 QT-001 incident, CLAUDE.md). The loss curve is far less
backend-sensitive: calibrated on the same two runs, total loss falls
757.9 -> 22.5 (ratio 0.030) on CPU and 753.6 -> 16.1 (ratio 0.021) on the
chip, with 28/29 and 28/30 epoch-over-epoch decreases respectively
(reports/convergence-r3-backends.md). Gates are set with >=2x margin:

  loss arm (always):   mean(last 3 epochs) / first epoch <= 0.08
                       and >=80% of epoch-to-epoch steps decrease
  mAP arm:             last val.csv map_50 >= --map50-min, enforced only
                       when the run executed on the strict backend
                       (default: any non-CPU backend); on CPU it prints
                       the value informationally.

Reference counterpart: the reference gates convergence with a single
fixed-backend mAP threshold (reference sqa.yaml:154-197); it never runs on
more than one backend so the question does not arise there.

Exit status: 0 when every enforced arm passes, 1 otherwise.

Example (the sqa.yaml QT-001 step):
    python tools/convergence_gate.py --history runs/sqa/conv/run/history.jsonl \
        --val-csv runs/sqa/conv/val.csv --map50-min 0.2
"""

from __future__ import annotations

import argparse
import csv
import json
import sys


def loss_curve_stats(history_rows: list[dict]) -> dict:
    """Compute the loss-arm statistics from per-epoch history rows
    (tools/train.py history.jsonl schema: epoch, loss_total, ...)."""
    losses = [float(r["loss_total"]) for r in sorted(history_rows, key=lambda r: r["epoch"])]
    if len(losses) < 4:
        raise ValueError(f"need >=4 epochs of history, got {len(losses)}")
    first = losses[0]
    tail = sum(losses[-3:]) / 3.0
    steps = len(losses) - 1
    decreasing = sum(1 for a, b in zip(losses, losses[1:]) if b < a)
    return {
        "epochs": len(losses),
        "first": first,
        "tail_mean3": tail,
        "ratio": tail / first if first > 0 else float("inf"),
        "decreasing_frac": decreasing / steps,
    }


def evaluate(
    history_rows: list[dict],
    map50: float | None,
    *,
    backend: str,
    loss_ratio_max: float = 0.08,
    min_decreasing_frac: float = 0.8,
    map50_min: float = 0.2,
    strict_backends: tuple = ("tpu", "axon"),
) -> tuple[list[str], list[str]]:
    """Return (report_lines, failures)."""
    lines, failures = [], []
    s = loss_curve_stats(history_rows)
    lines.append(
        f"loss arm: {s['epochs']} epochs, first={s['first']:.2f} "
        f"tail_mean3={s['tail_mean3']:.2f} ratio={s['ratio']:.4f} "
        f"(max {loss_ratio_max}), decreasing {s['decreasing_frac'] * 100:.0f}% "
        f"(min {min_decreasing_frac * 100:.0f}%)"
    )
    if s["ratio"] > loss_ratio_max:
        failures.append(f"loss ratio {s['ratio']:.4f} > {loss_ratio_max} — training did not learn")
    if s["decreasing_frac"] < min_decreasing_frac:
        failures.append(
            f"only {s['decreasing_frac'] * 100:.0f}% of epochs improved "
            f"(min {min_decreasing_frac * 100:.0f}%) — loss curve not descending"
        )
    strict = backend in strict_backends
    if map50 is None:
        lines.append("mAP arm: no val.csv given — skipped")
    elif strict:
        lines.append(f"mAP arm (STRICT, backend={backend}): map_50={map50:.4f} (min {map50_min})")
        if map50 < map50_min:
            failures.append(f"held-out mAP50 {map50:.4f} < {map50_min} on backend '{backend}'")
    else:
        lines.append(
            f"mAP arm (informational, backend={backend} not in {list(strict_backends)}): "
            f"map_50={map50:.4f} — threshold {map50_min} is chip-calibrated, not enforced here"
        )
    return lines, failures


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--history", required=True, help="train run history.jsonl")
    p.add_argument("--val-csv", default=None, help="val.py --log-csv output; last row's map_50 is gated")
    p.add_argument("--loss-ratio-max", type=float, default=0.08)
    p.add_argument("--min-decreasing-frac", type=float, default=0.8)
    p.add_argument("--map50-min", type=float, default=0.2)
    p.add_argument(
        "--backend",
        default="auto",
        help="backend the run executed on; 'auto' asks jax.default_backend()",
    )
    args = p.parse_args(argv)

    with open(args.history, "r", encoding="utf-8") as f:
        rows = [json.loads(line) for line in f if line.strip()]
    map50 = None
    if args.val_csv:
        with open(args.val_csv, "r", encoding="utf-8", newline="") as f:
            recs = list(csv.DictReader(f))
        map50 = float(recs[-1]["map_50"])
    backend = args.backend
    if backend == "auto":
        import jax

        backend = jax.default_backend()

    lines, failures = evaluate(
        rows,
        map50,
        backend=backend,
        loss_ratio_max=args.loss_ratio_max,
        min_decreasing_frac=args.min_decreasing_frac,
        map50_min=args.map50_min,
    )
    for line in lines:
        print(line)
    for fail in failures:
        print(f"FAIL: {fail}", file=sys.stderr)
    print("convergence gate:", "FAILED" if failures else "PASSED")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
