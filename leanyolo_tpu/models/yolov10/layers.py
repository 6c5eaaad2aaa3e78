"""YOLOv10 building blocks as pure functions over explicit parameter pytrees.

TPU-first re-design of the reference blocks
(reference: leanyolo/models/yolov10/layers.py:51-458). Key departures from the
torch design:

- NHWC activations and HWIO kernels (channels on the TPU lane dimension).
- No module objects: every block is `init(key, ...) -> params` plus
  `apply(params, x, ...) -> y`. Parameter pytrees mirror the torch module
  tree one-to-one (`cv1`, `m.0.cv2`, ...) so checkpoint remapping is a pure
  table (see models/yolov10/remap.py).
- BatchNorm inference is an affine epilogue that XLA fuses into the conv; a
  separate `fold` transform (fold.py) bakes BN (and the RepVGGDW dual branch)
  into conv weights for serving.
- Training-mode BN running-stat updates are collected through a `BNStats`
  recorder instead of module side effects, keeping forwards pure.

Block hyperparameters match the reference exactly: BN eps=1e-3 momentum=0.03,
SiLU activations, e=0.5 splits, SPPF k=5, attention key_dim=head_dim/2,
PSA heads = C//64, SCDown's depthwise conv has no activation.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

BN_EPS = 1e-3
BN_MOMENTUM = 0.03


class BNStats:
    """Collects per-path BatchNorm batch statistics during a training forward.

    Appending to a Python dict during tracing is safe (the forward is traced
    once); `tree()` returns {'path': {'mean': ..., 'var': ...}} to merge into
    the parameter pytree via `merge_bn_stats`.
    """

    def __init__(self) -> None:
        self.updates: Dict[str, Dict[str, jnp.ndarray]] = {}

    def record(self, path: str, mean: jnp.ndarray, var: jnp.ndarray) -> None:
        self.updates[path] = {"mean": mean, "var": var}


def merge_bn_stats(params: Params, stats) -> Params:
    """Return params with BN running stats advanced by the recorded batches.

    `stats` is a BNStats or its `.updates` dict ({'path': {'mean','var'}}),
    e.g. carried out of a grad computation as an aux output.
    """
    updates = stats.updates if isinstance(stats, BNStats) else stats
    out = jax.tree_util.tree_map(lambda x: x, params)  # fresh containers
    for path, upd in updates.items():
        node = out
        for c in path.split("/"):
            node = node[int(c)] if isinstance(node, list) else node[c]
        bn = node["bn"]
        bn["mean"] = (1.0 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * upd["mean"]
        bn["var"] = (1.0 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * upd["var"]
    return out


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------


def make_divisible(v: int, divisor: int = 8) -> int:
    return int(math.ceil(v / divisor) * divisor)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    groups: int = 1,
    padding: Optional[int] = None,
    precision=None,
) -> jnp.ndarray:
    """2D conv, NHWC x HWIO -> NHWC, torch-style explicit k//2 padding."""
    k = w.shape[0]
    p = k // 2 if padding is None else padding
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def _kaiming_uniform(key, shape_hwio: Tuple[int, int, int, int], dtype=jnp.float32) -> jnp.ndarray:
    """Torch Conv2d default init (kaiming_uniform with a=sqrt(5))."""
    kh, kw, cin_g, _ = shape_hwio
    fan_in = kh * kw * cin_g
    bound = 1.0 / math.sqrt(fan_in) * math.sqrt(3.0)  # gain for a=sqrt(5) over U(-b, b)
    return jax.random.uniform(key, shape_hwio, dtype, minval=-bound, maxval=bound)


def conv_init(key, c_in: int, c_out: int, k: int, groups: int = 1, bias: bool = False) -> Params:
    """Plain conv params {'w': HWIO[, 'b']} (torch nn.Conv2d equivalent)."""
    shape = (k, k, c_in // groups, c_out)
    p: Params = {"w": _kaiming_uniform(key, shape)}
    if bias:
        fan_in = k * k * (c_in // groups)
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(jax.random.fold_in(key, 1), (c_out,), jnp.float32, -bound, bound)
    return p


def cba_init(key, c_in: int, c_out: int, k: int, groups: int = 1) -> Params:
    """Conv+BN(+SiLU) block params, mirroring reference `Conv`.

    Parity: leanyolo/models/yolov10/layers.py:80-88 (conv bias=False,
    BN eps=1e-3 momentum=0.03).
    """
    return {
        "conv": conv_init(key, c_in, c_out, k, groups, bias=False),
        "bn": {
            "scale": jnp.ones((c_out,), jnp.float32),
            "bias": jnp.zeros((c_out,), jnp.float32),
            "mean": jnp.zeros((c_out,), jnp.float32),
            "var": jnp.ones((c_out,), jnp.float32),
        },
    }


import os as _os

_BARRIER_MODE = _os.environ.get("LEANYOLO_CONV_BARRIER", "auto")


def _barrier_applies(c_in: int, x_shape) -> bool:
    """Whether the conv-input optimization_barrier applies (see cba_apply).

    'auto' = the measured rule set; 'all' / 'off' are probe overrides
    (LEANYOLO_CONV_BARRIER) used by the emitter-pathology experiments.
    """
    if _BARRIER_MODE == "all":
        return True
    if _BARRIER_MODE == "off":
        return False
    return bool(c_in >= 80 and c_in % 128)


def cba_apply(
    p: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    groups: int = 1,
    act: bool = True,
    padding: Optional[int] = None,
    train: bool = False,
    stats: Optional[BNStats] = None,
    scope: str = "",
    precision=None,
) -> jnp.ndarray:
    """Conv -> BN -> SiLU. Handles both unfused ('bn') and folded ('b') params."""
    w = p["conv"]["w"]
    if not train and groups == 1 and (w.shape[0] > 1 or w.shape[1] > 1) and _barrier_applies(w.shape[2], x.shape):
        # XLA conv-emitter workaround (PERF.md round 4): when the previous
        # block's bias/SiLU epilogue fuses into a spatial conv's INPUT side
        # and the input channels pad the 128-lane tile (192, 320, 576...),
        # XLA's TPU conv emitter can pick a catastrophic schedule — yolov10m
        # shipped one 3x3 192->192 @40x40 instance at 18.7x its roofline
        # floor (15.6 of 97 ms/step, EmitInputBatchInLanes, 145M estimated
        # cycles, vs 1.1M for its sibling convs). An optimization_barrier
        # keeps the producer out of the conv fusion: measured +44% on the
        # standalone 192-channel conv chain and NEUTRAL at 256 channels
        # (experiments/exp_conv192_emitter.py). Numerically the identity.
        # Inference-only: the train step never showed the pathology and the
        # barrier cost it 1.7% (237.9 -> 233.9 img/s on yolov10m bs64).
        x = jax.lax.optimization_barrier(x)
    y = conv2d(x, w, stride=stride, groups=groups, padding=padding, precision=precision)
    return _bn_act(p, y, act=act, train=train, stats=stats, scope=scope)


def _bn_act(p: Params, y: jnp.ndarray, *, act: bool, train=False, stats=None, scope="") -> jnp.ndarray:
    """The BN/bias + SiLU tail of cba_apply, on a precomputed conv output."""
    if "bn" in p:
        bn = p["bn"]
        if train:
            # One-pass batch stats: sum and sum-of-squares reduce in a
            # single fused read of the conv output (jnp.var's
            # E[(x-mean)^2] needs a second full pass after the mean — at
            # bs128 the two-pass form costs ~22 ms/step across the net,
            # profile_step families: convert_reduce_fusion). f32
            # accumulation; clamp guards the E[x^2]-E[x]^2 cancellation.
            xf = y.astype(jnp.float32)
            n = y.shape[0] * y.shape[1] * y.shape[2]
            s1 = jnp.sum(xf, axis=(0, 1, 2))
            s2 = jnp.sum(xf * xf, axis=(0, 1, 2))
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if stats is not None:
                unbiased = var * (n / max(n - 1, 1))
                stats.record(scope, mean, unbiased)
            mul = jax.lax.rsqrt(var + BN_EPS) * bn["scale"]
            add = bn["bias"] - mean * mul
        else:
            mul = jax.lax.rsqrt(bn["var"] + BN_EPS) * bn["scale"]
            add = bn["bias"] - bn["mean"] * mul
        y = y * mul.astype(y.dtype) + add.astype(y.dtype)
    elif "b" in p["conv"]:
        y = y + p["conv"]["b"].astype(y.dtype)
    return jax.nn.silu(y) if act else y


def cba_apply_upcat(p: Params, a: jnp.ndarray, b: jnp.ndarray, *, act=True, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """`cba_apply(p, concat([upsample2x_nearest(a), b]))` for a 1x1 conv,
    with the conv distributed over the concat: conv(cat(up(a), b)) ==
    up(conv_a(a)) + conv_b(b). The upsampled tensor — the largest neck
    intermediate — never materializes, and the a-half of the matmul runs at
    quarter resolution. Exact up to fp reassociation (the MXU accumulates
    each half in fp32; the halves sum once more).
    """
    w = p["conv"]["w"]
    assert w.shape[0] == 1 and w.shape[1] == 1, "upcat distribution needs a 1x1 conv"
    ca = a.shape[-1]
    ya = conv2d(a, w[:, :, :ca], precision=precision)
    yb = conv2d(b, w[:, :, ca:], precision=precision)
    # Phase-add instead of `upsample2x_nearest(ya) + yb`: viewing yb as
    # [B, h, 2, w, 2, C] lets the x2 broadcast of ya fuse into the add as an
    # implicit-broadcast elementwise op (the standalone 6D broadcast
    # materialized 157 MB at bs128 before the add could run).
    bn, h, wd, c = ya.shape
    y = ya[:, :, None, :, None, :] + yb.reshape(bn, h, 2, wd, 2, c)
    if not train:
        # Apply the BN/bias + SiLU epilogue while still in 6D so the
        # broadcast-add + epilogue + reshape stay one fusion (the 4D reshape
        # between add and epilogue left one materialized [B,h,2,w,2,C]
        # broadcast in the profile). Elementwise ops commute with reshape;
        # channels stay on the last dim either way. Train mode needs the 4D
        # view first for the (0,1,2)-axis batch-stat reductions.
        return _bn_act(p, y, act=act).reshape(bn, 2 * h, 2 * wd, c)
    y = y.reshape(bn, 2 * h, 2 * wd, c)
    return _bn_act(p, y, act=act, train=train, stats=stats, scope=scope)


def maxpool2d_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k max pool, stride 1, same padding (NHWC)."""
    pad = k // 2
    # -inf init keeps XLA's select-and-scatter VJP rule applicable.
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample in NHWC via broadcast (no gather).

    Parity: leanyolo/models/yolov10/layers.py:220-240 (mode='nearest').
    """
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)


# ---------------------------------------------------------------------------
# Composite blocks. Each has init(key, ...) -> params and
# apply(params, x, cfg..., train, stats, scope) -> y.
# ---------------------------------------------------------------------------


def bottleneck_init(key, c_in: int, c_out: int, e: float = 1.0) -> Params:
    k1, k2 = jax.random.split(key)
    c_hidden = int(c_out * e)
    return {
        "cv1": cba_init(k1, c_in, c_hidden, 3),
        "cv2": cba_init(k2, c_hidden, c_out, 3),
    }


def bottleneck_apply(p: Params, x: jnp.ndarray, *, shortcut: bool, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """3x3 -> 3x3 with residual (reference layers.py:91-126)."""
    y = cba_apply(p["cv1"], x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    y = cba_apply(p["cv2"], y, train=train, stats=stats, scope=f"{scope}/cv2", precision=precision)
    add = shortcut and x.shape[-1] == y.shape[-1]
    return x + y if add else y


def c2f_init(key, c_in: int, c_out: int, n: int, e: float = 0.5) -> Params:
    keys = jax.random.split(key, n + 2)
    c = int(c_out * e)
    return {
        "cv1": cba_init(keys[0], c_in, 2 * c, 1),
        "cv2": cba_init(keys[1], (2 + n) * c, c_out, 1),
        "m": [bottleneck_init(keys[2 + i], c, c, 1.0) for i in range(n)],
    }


def c2f_apply(p: Params, x, *, shortcut: bool, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """Split-transform-merge C2f (reference layers.py:129-173).

    `x` may be an `(a, b)` tuple meaning `concat([upsample2x(a), b])` — the
    cv1 1x1 conv then distributes over the concat (see cba_apply_upcat).
    """
    if isinstance(x, tuple):
        y = cba_apply_upcat(p["cv1"], *x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    else:
        y = cba_apply(p["cv1"], x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    y1, y2 = jnp.split(y, 2, axis=-1)
    ys = [y1, y2]
    for i, mp in enumerate(p["m"]):
        y2 = bottleneck_apply(mp, y2, shortcut=shortcut, train=train, stats=stats, scope=f"{scope}/m/{i}", precision=precision)
        ys.append(y2)
    return cba_apply(p["cv2"], jnp.concatenate(ys, axis=-1), train=train, stats=stats, scope=f"{scope}/cv2", precision=precision)


def sppf_init(key, c_in: int, c_out: int) -> Params:
    k1, k2 = jax.random.split(key)
    c_hidden = c_in // 2
    return {
        "cv1": cba_init(k1, c_in, c_hidden, 1),
        "cv2": cba_init(k2, c_hidden * 4, c_out, 1),
    }


def sppf_apply(p: Params, x: jnp.ndarray, *, k: int = 5, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """SPPF: 1x1 -> 3 chained max pools -> concat -> 1x1 (reference layers.py:176-217)."""
    x = cba_apply(p["cv1"], x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    y1 = maxpool2d_same(x, k)
    y2 = maxpool2d_same(y1, k)
    y3 = maxpool2d_same(y2, k)
    return cba_apply(p["cv2"], jnp.concatenate([x, y1, y2, y3], axis=-1), train=train, stats=stats, scope=f"{scope}/cv2", precision=precision)


def repvggdw_init(key, ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv": cba_init(k1, ch, ch, 7, groups=ch),
        "conv1": cba_init(k2, ch, ch, 3, groups=ch),
    }


def repvggdw_apply(p: Params, x: jnp.ndarray, *, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """Depthwise 7x7 + 3x3 dual branch, SiLU on the sum (reference layers.py:274-286).

    A folded tree (single 'conv' entry with bias, produced by fold.py) takes
    the single-branch fast path.
    """
    ch = x.shape[-1]
    if "conv1" not in p:
        # Fused tree: the node IS a single folded conv block {'conv': {w, b}}.
        return cba_apply(p, x, groups=ch, act=True, padding=3, precision=precision)
    a = cba_apply(p["conv"], x, groups=ch, act=False, padding=3, train=train, stats=stats, scope=f"{scope}/conv", precision=precision)
    b = cba_apply(p["conv1"], x, groups=ch, act=False, padding=1, train=train, stats=stats, scope=f"{scope}/conv1", precision=precision)
    return jax.nn.silu(a + b)


def cib_init(key, c_in: int, c_out: int, e: float = 1.0, lk: bool = False) -> Params:
    keys = jax.random.split(key, 5)
    c_hidden = int(c_out * e)
    mid = 2 * c_hidden
    return {
        "cv1": [
            cba_init(keys[0], c_in, c_in, 3, groups=c_in),
            cba_init(keys[1], c_in, mid, 1),
            repvggdw_init(keys[2], mid) if lk else cba_init(keys[2], mid, mid, 3, groups=mid),
            cba_init(keys[3], mid, c_out, 1),
            cba_init(keys[4], c_out, c_out, 3, groups=c_out),
        ],
    }


def cib_apply(p: Params, x: jnp.ndarray, *, shortcut: bool, lk: bool, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """Compact inverted block (reference layers.py:243-300)."""
    seq = p["cv1"]
    c_in = x.shape[-1]
    y = cba_apply(seq[0], x, groups=c_in, train=train, stats=stats, scope=f"{scope}/cv1/0", precision=precision)
    y = cba_apply(seq[1], y, train=train, stats=stats, scope=f"{scope}/cv1/1", precision=precision)
    mid = y.shape[-1]
    if lk:
        y = repvggdw_apply(seq[2], y, train=train, stats=stats, scope=f"{scope}/cv1/2", precision=precision)
    else:
        y = cba_apply(seq[2], y, groups=mid, train=train, stats=stats, scope=f"{scope}/cv1/2", precision=precision)
    y = cba_apply(seq[3], y, train=train, stats=stats, scope=f"{scope}/cv1/3", precision=precision)
    c_out = y.shape[-1]
    y = cba_apply(seq[4], y, groups=c_out, train=train, stats=stats, scope=f"{scope}/cv1/4", precision=precision)
    add = shortcut and c_in == c_out
    return x + y if add else y


def c2fcib_init(key, c_in: int, c_out: int, n: int, lk: bool, e: float = 0.5) -> Params:
    keys = jax.random.split(key, n + 2)
    c = int(c_out * e)
    return {
        "cv1": cba_init(keys[0], c_in, 2 * c, 1),
        "cv2": cba_init(keys[1], (2 + n) * c, c_out, 1),
        "m": [cib_init(keys[2 + i], c, c, 1.0, lk) for i in range(n)],
    }


def c2fcib_apply(p: Params, x, *, shortcut: bool, lk: bool, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """C2f scaffold with CIB inner blocks (reference layers.py:303-335).

    `x` may be an `(a, b)` tuple meaning `concat([upsample2x(a), b])` — see
    c2f_apply / cba_apply_upcat.
    """
    if isinstance(x, tuple):
        y = cba_apply_upcat(p["cv1"], *x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    else:
        y = cba_apply(p["cv1"], x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    y1, y2 = jnp.split(y, 2, axis=-1)
    ys = [y1, y2]
    for i, mp in enumerate(p["m"]):
        y2 = cib_apply(mp, y2, shortcut=shortcut, lk=lk, train=train, stats=stats, scope=f"{scope}/m/{i}", precision=precision)
        ys.append(y2)
    return cba_apply(p["cv2"], jnp.concatenate(ys, axis=-1), train=train, stats=stats, scope=f"{scope}/cv2", precision=precision)


def attention_init(key, dim: int, num_heads: int, attn_ratio: float = 0.5) -> Params:
    num_heads = max(1, num_heads)
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    h = dim + key_dim * num_heads * 2
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "qkv": cba_init(k1, dim, h, 1),
        "proj": cba_init(k2, dim, dim, 1),
        "pe": cba_init(k3, dim, dim, 3, groups=dim),
    }


def attention_apply(
    p: Params,
    x: jnp.ndarray,
    *,
    num_heads: int,
    attn_ratio: float = 0.5,
    train=False,
    stats=None,
    scope="",
    precision=None,
) -> jnp.ndarray:
    """Lightweight MHSA over spatial tokens + depthwise positional branch.

    Parity: leanyolo/models/yolov10/layers.py:338-380. Token count is at most
    (H/32)*(W/32) so a dense softmax attention is cheap; einsum contractions
    land on the MXU.
    """
    b, h, w, c = x.shape
    n = h * w
    nh = max(1, num_heads)
    hd = c // nh
    kd = int(hd * attn_ratio)
    scale = kd**-0.5

    qkv = cba_apply(p["qkv"], x, act=False, train=train, stats=stats, scope=f"{scope}/qkv", precision=precision)
    qkv = qkv.reshape(b, n, nh, 2 * kd + hd)
    q, k_, v = qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]

    # Scores accumulate in fp32 on the MXU but are STORED in the activation
    # dtype ([B, nh, N, N] is the largest attention buffer — fp32 storage
    # costs ~1 ms/step at bs128); softmax math still runs in fp32 (the
    # upcast/downcast fuse into the surrounding kernels, nothing f32
    # materializes). In fp32 mode both casts are no-ops, so parity paths are
    # untouched.
    attn = (jnp.einsum("bine,bjne->bnij", q, k_, preferred_element_type=jnp.float32) * scale).astype(x.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bnij,bjnd->bind", attn, v, preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.reshape(b, h, w, c)

    v_img = v.reshape(b, h, w, c)
    pe = cba_apply(p["pe"], v_img, groups=c, act=False, train=train, stats=stats, scope=f"{scope}/pe", precision=precision)
    return cba_apply(p["proj"], out + pe, act=False, train=train, stats=stats, scope=f"{scope}/proj", precision=precision)


def psa_init(key, c_in: int, e: float = 0.5) -> Params:
    c = int(c_in * e)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "cv1": cba_init(k1, c_in, 2 * c, 1),
        "cv2": cba_init(k2, 2 * c, c_in, 1),
        "attn": attention_init(k3, c, max(1, c // 64), 0.5),
        "ffn": [
            cba_init(k4, c, c * 2, 1),
            cba_init(k5, c * 2, c, 1),
        ],
    }


def psa_apply(p: Params, x: jnp.ndarray, *, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """Partial self-attention (reference layers.py:383-425)."""
    c = x.shape[-1] // 2
    y = cba_apply(p["cv1"], x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    a, b_half = y[..., :c], y[..., c:]
    b_half = b_half + attention_apply(
        p["attn"], b_half, num_heads=max(1, c // 64), train=train, stats=stats, scope=f"{scope}/attn", precision=precision
    )
    f = cba_apply(p["ffn"][0], b_half, train=train, stats=stats, scope=f"{scope}/ffn/0", precision=precision)
    f = cba_apply(p["ffn"][1], f, act=False, train=train, stats=stats, scope=f"{scope}/ffn/1", precision=precision)
    b_half = b_half + f
    return cba_apply(p["cv2"], jnp.concatenate((a, b_half), axis=-1), train=train, stats=stats, scope=f"{scope}/cv2", precision=precision)


def scdown_init(key, c_in: int, c_out: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "cv1": cba_init(k1, c_in, c_out, 1),
        "cv2": cba_init(k2, c_out, c_out, 3, groups=c_out),
    }


def scdown_apply(p: Params, x: jnp.ndarray, *, stride: int = 2, train=False, stats=None, scope="", precision=None) -> jnp.ndarray:
    """Spatial-channel decoupled downsample; no activation on the DW conv.

    Parity: leanyolo/models/yolov10/layers.py:428-458.
    """
    y = cba_apply(p["cv1"], x, train=train, stats=stats, scope=f"{scope}/cv1", precision=precision)
    c_out = y.shape[-1]
    return cba_apply(p["cv2"], y, stride=stride, groups=c_out, act=False, train=train, stats=stats, scope=f"{scope}/cv2", precision=precision)
