"""Inference-time parameter folding: BN -> conv bias, RepVGGDW -> single conv.

Two standard serving transforms, done ahead-of-time on the parameter pytree
(the forward functions in layers.py dispatch on tree structure):

1. BatchNorm folding: w' = w * gamma / sqrt(var + eps) (per output channel),
   b' = beta - mean * gamma / sqrt(var + eps). Removes every BN epilogue from
   the compiled program.
2. RepVGGDW fusion: the depthwise 7x7 + 3x3 dual branch inside long-kernel
   CIBs (reference: leanyolo/models/yolov10/layers.py:274-286) collapses into
   one 7x7 depthwise conv by zero-padding the 3x3 kernel to 7x7 and summing —
   exactly the RepVGG re-parameterization the official repo applies before
   export.

Both are exact up to fp32 rounding; parity paths keep the unfused tree.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .layers import BN_EPS

Params = Dict[str, Any]


def _fold_conv_bn(block: Params) -> Params:
    w = np.asarray(block["conv"]["w"], np.float32)
    bn = block["bn"]
    scale = np.asarray(bn["scale"], np.float32)
    bias = np.asarray(bn["bias"], np.float32)
    mean = np.asarray(bn["mean"], np.float32)
    var = np.asarray(bn["var"], np.float32)
    mul = scale / np.sqrt(var + BN_EPS)
    out = {"conv": {"w": w * mul[None, None, None, :], "b": bias - mean * mul}}
    if "b" in block["conv"]:
        out["conv"]["b"] = out["conv"]["b"] + np.asarray(block["conv"]["b"], np.float32) * mul
    return out


def _is_conv_bn(node: Any) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"conv", "bn"}


def _is_repvggdw(node: Any) -> bool:
    return (
        isinstance(node, dict)
        and set(node.keys()) == {"conv", "conv1"}
        and _is_conv_bn(node["conv"])
        and _is_conv_bn(node["conv1"])
        and np.asarray(node["conv"]["conv"]["w"]).shape[0] == 7
        and np.asarray(node["conv1"]["conv"]["w"]).shape[0] == 3
    )


def _fuse_repvggdw(node: Params) -> Params:
    f7 = _fold_conv_bn(node["conv"])["conv"]
    f3 = _fold_conv_bn(node["conv1"])["conv"]
    w7 = np.asarray(f7["w"], np.float32)
    w3 = np.asarray(f3["w"], np.float32)
    pad = (7 - 3) // 2
    w3p = np.pad(w3, ((pad, pad), (pad, pad), (0, 0), (0, 0)))
    return {"conv": {"w": w7 + w3p, "b": f7["b"] + f3["b"]}}


def _fold_norm_into_stem(params: Params) -> Params:
    """Absorb (x - sub) / div into the (already BN-folded) first conv.

    conv((x - sub) / div, w) + b == conv(x, w / div) + (b - sum(w * sub / div))
    per output channel, so the model can consume raw pixels with identity
    normalization buffers — removing an elementwise pass (and the layout copy
    XLA inserts for it) over the full-resolution input.
    """
    sub = np.asarray(params["input_subtract"], np.float32)
    div = np.asarray(params["input_divide"], np.float32)
    if np.all(sub == 0.0) and np.all(div == 1.0):
        return params
    cv0 = params["backbone"]["cv0"]["conv"]
    w = np.asarray(cv0["w"], np.float32)  # [kh, kw, cin, cout]
    b = np.asarray(cv0.get("b", np.zeros(w.shape[-1], np.float32)), np.float32)
    cv0["w"] = w / div[None, None, :, None]
    cv0["b"] = b - np.einsum("hwco,c->o", w, sub / div)
    params["input_subtract"] = np.zeros_like(sub)
    params["input_divide"] = np.ones_like(div)
    return params


def fold_params(tree: Any, *, fold_norm: bool = True, dtype: Any = None) -> Any:
    """Recursively fold a full model parameter tree for serving.

    `dtype` (e.g. jnp.bfloat16) pre-casts every float32 leaf AFTER folding
    (folding math stays f32). For the folded tree this is bitwise-identical
    to the per-call `w.astype(x.dtype)` the apply functions do — same
    round-to-nearest-even — but removes the ~85 convert ops (and, per-call,
    their dispatch cost) from every compiled serving program. Only valid on
    the folded tree: the UNFUSED path computes BN's rsqrt(var+eps)*scale in
    f32 first, where a pre-cast would change the math.
    """
    out = _fold_tree(tree)
    if fold_norm and isinstance(out, dict) and "input_subtract" in out:
        out = _fold_norm_into_stem(out)
    if dtype is not None:
        out = _cast_float_leaves(out, dtype)
    return out


def _cast_float_leaves(tree: Any, dtype: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _cast_float_leaves(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_cast_float_leaves(v, dtype) for v in tree]
    arr = np.asarray(tree)
    if arr.dtype == np.float32:
        import jax.numpy as jnp

        return jnp.asarray(tree).astype(dtype)
    return tree


def _fold_tree(tree: Any) -> Any:
    if _is_repvggdw(tree):
        return _fuse_repvggdw(tree)
    if _is_conv_bn(tree):
        return _fold_conv_bn(tree)
    if isinstance(tree, dict):
        return {k: _fold_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_fold_tree(v) for v in tree]
    return tree
