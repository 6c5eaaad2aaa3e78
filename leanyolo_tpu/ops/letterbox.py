"""Letterbox preprocessing: host (cv2) parity path + fused XLA device path.

The host path reproduces the reference letterbox exactly
(reference: leanyolo/utils/letterbox.py:9-91) for mAP-parity validation.

The device path (`letterbox_jax`) fuses resize + pad + normalize into one
XLA program for throughput: bilinear resize via `jax.image.resize`, constant
pad 114, so the whole preprocess rides HBM once. cv2's INTER_LINEAR and
XLA's bilinear differ at the LSB, so parity testing uses mAP, not tensors
(SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


def letterbox(
    img: np.ndarray,
    new_shape=640,
    color: Tuple[int, int, int] = (114, 114, 114),
    auto: bool = False,
    scale_fill: bool = False,
    scaleup: bool = True,
    stride: int = 32,
):
    """Aspect-preserving resize + centered constant pad (host, cv2).

    Returns (img_out, (gain_w, gain_h), (pad_left, pad_top)); behavior matches
    the reference including `auto` stride-multiple padding and `scaleup=False`
    capping (reference letterbox.py:41-91).
    """
    import cv2

    orig_h, orig_w = img.shape[:2]
    if isinstance(new_shape, int):
        tgt_h, tgt_w = new_shape, new_shape
    else:
        tgt_h, tgt_w = int(new_shape[0]), int(new_shape[1])

    if scale_fill:
        gain_w = tgt_w / max(orig_w, 1)
        gain_h = tgt_h / max(orig_h, 1)
        new_w, new_h = tgt_w, tgt_h
        pad_w = pad_h = 0.0
    else:
        r = min(tgt_w / max(orig_w, 1), tgt_h / max(orig_h, 1))
        if not scaleup:
            r = min(r, 1.0)
        new_w = int(round(orig_w * r))
        new_h = int(round(orig_h * r))
        gain_w = gain_h = r
        pad_w = float(tgt_w - new_w)
        pad_h = float(tgt_h - new_h)
        if auto and stride > 1:
            pad_w = pad_w % stride
            pad_h = pad_h % stride

    if (orig_w, orig_h) != (new_w, new_h):
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)

    left = int(round(pad_w / 2.0))
    right = int(round(pad_w - left))
    top = int(round(pad_h / 2.0))
    bottom = int(round(pad_h - top))
    if any(v != 0 for v in (top, bottom, left, right)):
        img = cv2.copyMakeBorder(img, top, bottom, left, right, borderType=cv2.BORDER_CONSTANT, value=color)
    return img, (float(gain_w), float(gain_h)), (left, top)


DEFAULT_SIZE_BUCKETS = (320, 416, 512, 640, 768, 896, 1088, 1280)


def choose_bucket(orig_hw: Tuple[int, int], buckets=DEFAULT_SIZE_BUCKETS, max_size: int = 1280) -> int:
    """Pick the smallest stride-32 bucket that fits the image's long side.

    The models are fully convolutional (reference yolov10s.py:31-32), but jit
    needs static shapes; a small set of bucketed sizes bounds recompiles
    (SURVEY.md §5 "sequence scaling" analog). Images larger than max_size
    downscale into the largest bucket via letterbox.
    """
    long_side = max(orig_hw)
    for b in buckets:
        if long_side <= b:
            return b
    return min(max(buckets), max_size)


def letterbox_params(orig_hw: Tuple[int, int], target: int, scaleup: bool = True):
    """Static letterbox geometry for a known original size (host math only)."""
    orig_h, orig_w = orig_hw
    r = min(target / max(orig_w, 1), target / max(orig_h, 1))
    if not scaleup:
        r = min(r, 1.0)
    new_w = int(round(orig_w * r))
    new_h = int(round(orig_h * r))
    pad_w = float(target - new_w)
    pad_h = float(target - new_h)
    left = int(round(pad_w / 2.0))
    top = int(round(pad_h / 2.0))
    return (r, r), (left, top), (new_h, new_w)


def letterbox_jax(img, target: int, *, pad_value: float = 114.0, scaleup: bool = True):
    """Device letterbox: resize + pad + (caller applies normalization in-model).

    Args:
        img: [H, W, 3] uint8/float array (device or host).
        target: square output size (static).

    Returns:
        (out [target, target, 3] float32, (gain_w, gain_h), (pad_left, pad_top))

    One fused XLA program; combined with the model's in-graph normalization,
    the whole path image -> detections is a single compile unit (north star:
    letterbox fused into one XLA preprocessing kernel).
    """
    import jax
    import jax.numpy as jnp

    h, w = int(img.shape[0]), int(img.shape[1])
    (gw, gh), (left, top), (new_h, new_w) = letterbox_params((h, w), target, scaleup)

    x = jnp.asarray(img, jnp.float32)
    x = jax.image.resize(x, (new_h, new_w, x.shape[2]), method="linear")
    out = jnp.full((target, target, x.shape[2]), pad_value, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, x, (top, left, 0))
    return out, (gw, gh), (left, top)
