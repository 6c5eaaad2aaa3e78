"""Multi-chip scaling model: collective volumes from the REAL programs.

Walks the jaxpr of the actual forward (what DP-val/SP/TP shard) and counts,
per conv_general_dilated equation, the bytes each parallelism axis must move:

- DP train: gradient all-reduce payload = fp32 param bytes (ring traffic
  2*(n-1)/n * payload), plus the per-BN-layer batch-stat psums (2 floats per
  channel) the one-pass E[x^2]-E[x]^2 formulation emits under a sharded batch.
- SP (H-sharded activations): every conv with kh>1 exchanges (kh-1) halo rows
  of its INPUT per shard boundary; bytes = rows * W * Cin * dtype.
- TP (output-channel-sharded filters): every dense conv whose input channels
  arrive sharded contracts partially and psums its OUTPUT map; depthwise convs
  (feature_group_count == Cin) are communication-free.

No reference counterpart (single-GPU, SURVEY.md §2.3). Numbers feed PERF.md's
"Multi-chip scaling model" section; run on CPU (trace only, nothing executes).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from leanyolo_tpu.models.yolov10.decode import decode_topk  # noqa: E402
from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply  # noqa: E402

BF16 = 2
F32 = 4


def conv_inventory(variant: str, imgsz: int):
    """[(lhs_shape NHWC, rhs_shape HWIO, strides, feature_groups), ...] of the
    bf16 inference forward at batch 1, straight from the traced jaxpr."""
    model = YOLOv10.create(variant, class_names=[f"c{i}" for i in range(80)])
    cfg = model.cfg

    def fwd(p, x):
        return model_apply(p, x.astype(jnp.bfloat16), cfg, train=False, branches=("one2one",))

    jaxpr = jax.make_jaxpr(fwd)(model.params, jnp.zeros((1, imgsz, imgsz, 3), jnp.uint8))
    convs = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
                convs.append(
                    (
                        tuple(lhs),
                        tuple(rhs),
                        tuple(eqn.params["window_strides"]),
                        int(eqn.params["feature_group_count"]),
                    )
                )
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for item in v:
                        if hasattr(item, "jaxpr"):
                            walk(item.jaxpr)

    walk(jaxpr.jaxpr)
    n_params = sum(x.size for x in jax.tree.leaves(model.params))
    # BN channel count: every rank-1 'scale' leaf is one BN layer's C.
    flat, _ = jax.tree_util.tree_flatten_with_path(model.params)
    bn_channels = sum(
        x.size for p, x in flat if p and getattr(p[-1], "key", None) == "scale"
    )
    return convs, n_params, bn_channels


def sp_halo_bytes_per_image(convs) -> int:
    """Halo-exchange bytes per image per shard boundary (bf16 activations).

    H-sharded NHWC: a kh-tall window needs (kh-1) input rows from the
    neighbor per boundary (kh=3 -> 1 row each direction), independent of
    stride. Row bytes = W * Cin * 2. Depthwise convs halo too (spatial)."""
    total = 0
    for lhs, rhs, strides, fg in convs:
        kh = rhs[0]
        if kh > 1:
            total += (kh - 1) * lhs[2] * lhs[3] * BF16
    return total


def tp_psum_bytes_per_image(convs) -> int:
    """Output-map psum bytes per image for output-channel TP (bf16).

    A dense conv whose input channels are sharded (i.e. produced by a
    previous output-sharded conv) computes a partial [H',W',O] everywhere
    and all-reduces it. First conv (Cin=3, replicated input) and depthwise
    convs contract nothing sharded. Ring all-reduce traffic is
    2*(n-1)/n * this payload."""
    total = 0
    for lhs, rhs, strides, fg in convs:
        cin_total = rhs[2] * fg
        if fg > 1 or cin_total <= 3:
            continue
        h_out = lhs[1] // strides[0]
        w_out = lhs[2] // strides[1]
        total += h_out * w_out * rhs[3] * BF16
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="yolov10n,yolov10s,yolov10m,yolov10b,yolov10l,yolov10x")
    ap.add_argument("--imgsz", type=int, default=640)
    args = ap.parse_args()

    out = {}
    for v in args.variants.split(","):
        convs, n_params, bn_c = conv_inventory(v, args.imgsz)
        out[v] = {
            "imgsz": args.imgsz,
            "n_convs": len(convs),
            "params": n_params,
            "dp_grad_payload_mb": round(n_params * F32 / 1e6, 2),
            "dp_bnstat_payload_kb": round(2 * bn_c * F32 / 1e3, 2),
            "sp_halo_mb_per_image_per_boundary": round(sp_halo_bytes_per_image(convs) / 1e6, 3),
            "tp_psum_payload_mb_per_image": round(tp_psum_bytes_per_image(convs) / 1e6, 2),
        }
        print(v, json.dumps(out[v]))
    with open("experiments/scaling_model.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
