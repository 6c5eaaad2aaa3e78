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


def letterbox_batch_jax(canvas, new_hw, pads, hw, target: int, *, pad_value: float = 114.0):
    """Batched device letterbox: ONE static program for arbitrary image sizes.

    Images of any original size are pasted top-left onto a fixed host canvas
    (a pure memcpy — no host resize), and the aspect-preserving resize + pad
    happens on device as a dynamic-scale separable bilinear warp. Because the
    per-image geometry (true size, scaled size, pad offsets) arrives as
    *array* inputs, every batch compiles to the same executable regardless of
    the original image sizes — the recompile-per-shape problem of a naive
    `jax.image.resize` path disappears (SURVEY.md §7 hard parts; reference
    letterbox.py:9-91 is the behavioral spec, with cv2's half-pixel centers).

    Args:
        canvas: [B, Hc, Wc, 3] uint8 or float32, image i occupying
            [:h_i, :w_i] (uint8 preferred — raw pixels are u8-exact and the
            host->device transfer is 4x smaller; cast to f32 here on device).
        new_hw: [B, 2] int32 scaled (new_h, new_w) per image.
        pads:   [B, 2] int32 (pad_left, pad_top) per image.
        hw:     [B, 2] int32 true original (h, w) per image.
        target: static square output size.

    Returns: [B, target, target, 3] float32 letterboxed batch.
    """
    import jax
    import jax.numpy as jnp

    def one(img, nhw, pad, true_hw):
        h, w = true_hw[0], true_hw[1]
        new_h, new_w = nhw[0], nhw[1]
        left, top = pad[0], pad[1]

        def axis_coords(n_new, n_true, offset, size):
            dst = jnp.arange(target) - offset
            # cv2 INTER_LINEAR convention: src = (dst + 0.5) * (old/new) - 0.5
            src = (dst.astype(jnp.float32) + 0.5) * (n_true / n_new) - 0.5
            src = jnp.clip(src, 0.0, n_true.astype(jnp.float32) - 1.0)
            i0 = jnp.floor(src).astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, n_true - 1)
            frac = src - i0.astype(jnp.float32)
            valid = (dst >= 0) & (dst < n_new)
            return i0, i1, frac, valid

        y0, y1, fy, vy = axis_coords(new_h, h, top, img.shape[0])
        x0, x1, fx, vx = axis_coords(new_w, w, left, img.shape[1])
        rows = jnp.take(img, y0, axis=0) * (1.0 - fy)[:, None, None] + jnp.take(img, y1, axis=0) * fy[:, None, None]
        out = jnp.take(rows, x0, axis=1) * (1.0 - fx)[None, :, None] + jnp.take(rows, x1, axis=1) * fx[None, :, None]
        return jnp.where((vy[:, None] & vx[None, :])[..., None], out, pad_value)

    return jax.vmap(one)(jnp.asarray(canvas, jnp.float32), new_hw, pads, hw)


def canvas_batch(images, target: int, *, canvas_size: Optional[int] = None, scaleup: bool = True):
    """Host prep for `letterbox_batch_jax`: paste images onto a fixed canvas.

    A pure memcpy per image (no host resize/interpolation — that moves to the
    device warp). Returns (canvas [B, C, C, 3] uint8 — raw pixels are exact
    in u8 and ship 4x fewer host->device bytes than f32; the device warp
    casts — new_hw [B,2] i32, pads [B,2] i32, hw [B,2] i32, metas) where
    metas carry the same (gain, pad) contract as the host `letterbox` for
    unletterboxing. Float input images fall back to an f32 canvas.
    """
    if canvas_size is None:
        longest = max(max(int(im.shape[0]), int(im.shape[1])) for im in images)
        # The canvas must FIT the raw image (the device warp then downscales
        # to `target`), so it cannot be capped at choose_bucket's max_size —
        # a 2000px image on a 1280 canvas would be a hard error, where the
        # host path simply downscales. Past-the-buckets sizes round up to a
        # coarse 256 step so mixed oversize batches share few compiles.
        canvas_size = max(target, choose_bucket((longest, longest)), (longest + 255) // 256 * 256)
    b = len(images)
    cdt = np.uint8 if all(np.asarray(im).dtype == np.uint8 for im in images) else np.float32
    canvas = np.zeros((b, canvas_size, canvas_size, 3), cdt)
    new_hw = np.zeros((b, 2), np.int32)
    pads = np.zeros((b, 2), np.int32)
    hw = np.zeros((b, 2), np.int32)
    metas = []
    for i, img in enumerate(images):
        h, w = int(img.shape[0]), int(img.shape[1])
        if h > canvas_size or w > canvas_size:
            raise ValueError(f"image {h}x{w} exceeds canvas {canvas_size}")
        (gw, gh), (left, top), (nh, nw) = letterbox_params((h, w), target, scaleup)
        canvas[i, :h, :w] = img[..., :3]
        new_hw[i] = (nh, nw)
        pads[i] = (left, top)
        hw[i] = (h, w)
        metas.append(((gw, gh), (left, top), (h, w)))
    return canvas, new_hw, pads, hw, metas


def dataset_canvas_size(images_meta, target: int) -> int:
    """Canvas bucket for a whole COCO dataset from annotation-declared sizes.

    The canvas must FIT the largest raw image (the device warp downscales to
    `target`); sizing it once per dataset means ONE compiled program for the
    epoch. Fails fast on entries missing height/width — a too-small canvas
    would otherwise surface minutes later as a misleading 'image exceeds
    canvas' crash mid-run.
    """
    missing = [im for im in images_meta if not (im.get("height") and im.get("width"))]
    if missing:
        raise ValueError(
            f"device preprocessing sizes the canvas from the annotations, but "
            f"{len(missing)} image entries lack height/width (first: "
            f"{missing[0].get('file_name', missing[0].get('id'))}); use "
            f"preprocess='host' or fix the annotation json"
        )
    longest = 1
    for im in images_meta:
        longest = max(longest, int(im["height"]), int(im["width"]))
    return max(target, choose_bucket((longest, longest)), (longest + 255) // 256 * 256)


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
