"""Training engine: jitted train step, optax AdamW, freeze/unfreeze, bf16.

TPU-native counterpart of the reference trainers
(reference: tools/train.py:135-309 baseline; tools/transfer_learn_aquarium.py
best-practice: param groups with backbone lr-mult 417-424, warmup->cosine
LambdaLR 427-435, AMP 436/450-461, grad-clip 1.0, in-graph augmentations
326-353, gradual unfreeze 487-491).

Design notes:
- one jitted train step PER FREEZE PHASE (at most two per run): the frozen
  program stop-gradients backbone/neck params, so XLA never compiles their
  backward convs — the same work-skipping torch gets from
  requires_grad=False — while producing bit-identical state to computing
  those grads and zeroing them (grads of stopped leaves are exact zeros,
  AdamW moments stay cold, updates are zeroed after the optimizer);
- BN running stats ride along as grad aux and merge after the optimizer step;
- mixed precision = bf16 activations with fp32 params/grads (the TPU analog
  of the reference's CUDA AMP), selected per-step via a static flag;
- augmentations (hflip + brightness/contrast, reference transfer:326-353)
  run inside the same compiled step on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.yolov10.layers import BNStats, merge_bn_stats
from ..models.yolov10.losses import detection_loss_v10
from ..models.yolov10.model import YOLOv10, model_apply

Params = Dict[str, Any]


@dataclass
class TrainConfig:
    lr: float = 1e-3
    weight_decay: float = 5e-4
    epochs: int = 10
    warmup_epochs: int = 1
    bb_lr_mult: float = 0.1  # backbone+neck LR multiplier (transfer default)
    freeze_backbone: bool = False
    unfreeze_epoch: int = 5
    grad_clip: float = 1.0
    bf16: bool = False
    augment: bool = False
    p_hflip: float = 0.5
    p_bc: float = 0.5
    steps_per_epoch: int = 100  # for the per-epoch schedule
    #: 'none' leaves rematerialization to XLA's scheduler; 'full' wraps the
    #: model forward in jax.checkpoint (backward recomputes all activations
    #: instead of storing them — trades one extra forward for HBM pressure).
    remat: str = "none"
    #: Device-side letterboxing: the step takes a DeviceBatch (raw pixels on
    #: a fixed canvas + geometry) and fuses the letterbox warp + the affine
    #: GT-box transform into the compiled train step — the 1-core host
    #: pipeline then only decodes JPEGs and memcpys (north star: letterbox
    #: fused for infer/val/train; reference letterbox.py:9-91 is the spec).
    device_preprocess: bool = False
    #: Square letterbox size for the device warp (only used when
    #: device_preprocess is set; host mode gets its size from the dataset).
    imgsz: int = 640


def _is_stats_leaf(path: Tuple) -> bool:
    """BN running stats + input-normalization buffers are never optimized."""
    if path and path[0] in ("input_subtract", "input_divide"):
        return True
    if len(path) >= 2 and path[-2] == "bn" and path[-1] in ("mean", "var"):
        return True
    return False


def _is_backbone_leaf(path: Tuple) -> bool:
    """Reference freeze covers backbone AND neck (tools/train.py:213-217)."""
    return bool(path) and path[0] in ("backbone", "neck")


def label_params(params: Params) -> Params:
    """'stats' | 'backbone' | 'head' label tree for optax.multi_transform."""
    from ..models.yolov10.remap import flatten_param_paths, _set_path, _clone_structure

    labels = _clone_structure(params)
    for path, _ in flatten_param_paths(params):
        if _is_stats_leaf(path):
            lbl = "stats"
        elif _is_backbone_leaf(path):
            lbl = "backbone"
        else:
            lbl = "head"
        _set_path(labels, path, lbl)
    return labels


def warmup_cosine_schedule(lr: float, *, epochs: int, warmup_epochs: int, steps_per_epoch: int) -> Callable:
    """Per-epoch warmup->cosine, stepped per epoch like the reference LambdaLR
    (transfer_learn_aquarium.py:427-435): lr is constant within an epoch."""
    e_total = max(1, epochs)
    wu = max(0, min(warmup_epochs, e_total))

    def schedule(step):
        epoch = step // max(1, steps_per_epoch)
        warm = (epoch + 1.0) / max(wu, 1)
        t = (epoch - wu) / max(1, e_total - wu)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return lr * jnp.where((wu > 0) & (epoch < wu), warm, cos)

    return schedule


def make_optimizer(params: Params, cfg: TrainConfig) -> Tuple[optax.GradientTransformation, Params]:
    labels = label_params(params)
    head_sched = warmup_cosine_schedule(cfg.lr, epochs=cfg.epochs, warmup_epochs=cfg.warmup_epochs, steps_per_epoch=cfg.steps_per_epoch)
    bb_sched = warmup_cosine_schedule(cfg.lr * cfg.bb_lr_mult, epochs=cfg.epochs, warmup_epochs=cfg.warmup_epochs, steps_per_epoch=cfg.steps_per_epoch)

    def group(sched):
        steps = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip and cfg.grad_clip > 0 else []
        steps.append(optax.adamw(sched, weight_decay=cfg.weight_decay))
        return optax.chain(*steps)

    tx = optax.multi_transform(
        {"head": group(head_sched), "backbone": group(bb_sched), "stats": optax.set_to_zero()},
        labels,
    )
    return tx, labels


def augment_batch(key, images: jnp.ndarray, gt_boxes: jnp.ndarray, *, p_hflip: float, p_bc: float, dtype=None):
    """On-device hflip + brightness/contrast in letterbox space.

    Parity: transfer_learn_aquarium.py:326-353 (alpha in [0.8, 1.2],
    beta in [-16, 16], clamp to [0, 255]; boxes mirror on flip).

    `dtype` is the compute dtype the result is cast to. The hflip select is
    a pure index permutation, so it runs BEFORE the cast — on a uint8 batch
    the reverse+select passes move 1/2 the bytes (flip(cast(x)) ==
    cast(flip(x)) exactly; integers <= 255 are exact in bf16).
    """
    if dtype is None and jnp.issubdtype(images.dtype, jnp.integer):
        raise ValueError(
            "augment_batch: integer (uint8) images need an explicit float `dtype` — "
            "the brightness jitter in integer arithmetic would truncate alpha to 0/1 "
            "and wrap beta"
        )
    b = images.shape[0]
    w = images.shape[2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    do_flip = jax.random.uniform(k1, (b,)) < p_hflip
    flipped = images[:, :, ::-1, :]
    images = jnp.where(do_flip[:, None, None, None], flipped, images)
    if dtype is not None:
        images = images.astype(dtype)
    x1, y1, x2, y2 = (gt_boxes[..., i] for i in range(4))
    fb = jnp.stack([w - x2, y1, w - x1, y2], axis=-1)
    gt_boxes = jnp.where(do_flip[:, None, None], fb, gt_boxes)

    do_bc = jax.random.uniform(k2, (b,)) < p_bc
    alpha = (0.8 + 0.4 * jax.random.uniform(k3, (b,))).astype(images.dtype)
    beta = (jax.random.uniform(k4, (b,)) * 32.0 - 16.0).astype(images.dtype)
    jittered = jnp.clip(images * alpha[:, None, None, None] + beta[:, None, None, None], 0.0, 255.0)
    images = jnp.where(do_bc[:, None, None, None], jittered, images)
    return images, gt_boxes


class Trainer:
    """Owns the optimizer state and the single compiled train step.

    With `mesh` set, the step runs data-parallel: params/optimizer state are
    replicated, the batch is sharded on axis 0, and XLA reduces gradients
    over ICI (GSPMD inserts the psum — nothing manual).
    """

    def __init__(self, model: YOLOv10, cfg: TrainConfig, *, mesh=None) -> None:
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.tx, self.labels = make_optimizer(model.params, cfg)
        if mesh is not None:
            from ..parallel.mesh import shard_params

            model.params = shard_params(mesh, model.params)
        self.opt_state = self.tx.init(model.params)
        # One compiled program per freeze phase (at most two per run): the
        # frozen program stop-gradients backbone/neck params so XLA never
        # emits their backward convs at all — torch's requires_grad=False
        # skips that work too, while a traced 0/1 flag must compute full
        # grads and then zero them.
        self._steps: Dict[bool, Callable] = {}
        self._step_raw = self._build_step(False, jit=False)
        self.global_step = 0

    def _build_step(self, frozen: bool, *, jit: bool = True):
        model_cfg = self.model.cfg
        nc = self.model.nc
        cfg = self.cfg
        tx = self.tx
        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32

        def fwd(params, images):
            # BN batch stats ride the return value (not a closure) so the
            # recorder's tracers stay inside the (possibly checkpointed)
            # forward scope.
            stats = BNStats()
            raw = model_apply(params, images, model_cfg, train=True, stats=stats, concat_head=False)
            return raw, stats.updates

        if cfg.remat == "full":
            fwd = jax.checkpoint(fwd)
        elif cfg.remat != "none":
            raise ValueError(f"unknown remat mode {cfg.remat!r} (use 'none' or 'full')")

        def loss_fn(params, images, gt_labels, gt_boxes, gt_mask):
            if frozen:
                # Sever the gradient path at the frozen params: their grads
                # come back as exact zeros WITHOUT the backbone/neck backward
                # ever being compiled (stop_gradient transposes to symbolic
                # zero, so XLA DCEs the dead dconv work). Numerically
                # identical to computing the grads and multiplying by 0.
                params = jax.tree_util.tree_map(
                    lambda lbl, p: jax.lax.stop_gradient(p) if lbl == "backbone" else p,
                    self.labels,
                    params,
                )
            raw, bn_stats = fwd(params, images)
            # Per-level (reg, cls) tuples: the 144-channel per-level concat +
            # global [B, A, 144] concat + f32 upcast of the packed form
            # materialized ~9 ms/step of pure data movement at bs128. The
            # per-tensor f32 upcasts fuse into the head conv epilogues; loss
            # math runs in f32 exactly as before.
            raw = {
                k: [(r.astype(jnp.float32), c.astype(jnp.float32)) for r, c in v]
                for k, v in raw.items()
            }
            losses = detection_loss_v10(raw, gt_labels, gt_boxes, gt_mask, num_classes=nc)
            return losses["total"], (losses, bn_stats)

        def step(params, opt_state, images, gt_labels, gt_boxes, gt_mask, key):
            # Batches arrive uint8 (data/dataset.py): 4x fewer host->device
            # bytes than the reference's float32 pipeline, and the augment
            # hflip runs pre-cast at 1/4 the f32 bytes. The u8 -> compute
            # dtype cast fuses into the brightness jitter / conv0 input.
            if cfg.device_preprocess:
                # `images` is (canvas, new_hw, pads, hw, gainpad): warp the
                # raw canvas to the letterbox square on device and map GT
                # boxes affinely into letterbox space (x' = x*gain + pad) —
                # the same geometry the host path bakes into the dataset.
                from ..ops.letterbox import letterbox_batch_jax

                canvas, new_hw, pads_i, hw, gainpad = images
                images = letterbox_batch_jax(canvas, new_hw, pads_i, hw, cfg.imgsz)
                mult = gainpad[:, None, jnp.array([0, 1, 0, 1])]
                add = gainpad[:, None, jnp.array([2, 3, 2, 3])]
                gt_boxes = gt_boxes * mult + add
            if cfg.augment:
                images, gt_boxes = augment_batch(
                    key, images, gt_boxes, p_hflip=cfg.p_hflip, p_bc=cfg.p_bc, dtype=dtype
                )
            else:
                images = images.astype(dtype)
            (_, (losses, bn_updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, images, gt_labels, gt_boxes, gt_mask
            )
            # Frozen phase (static — its own compiled program): backbone/neck
            # grads are exact zeros via loss_fn's stop_gradient, so AdamW
            # moments stay cold while frozen (matching the reference's
            # requires_grad=False freeze, tools/train.py:213-217 — a warm,
            # stale moment at unfreeze would bias the first live updates),
            # and updates are zeroed AFTER the optimizer so weight decay
            # cannot move frozen parameters either.
            updates, opt_state = tx.update(grads, opt_state, params)
            if frozen:
                # The backbone group's moments stay zero while frozen, but
                # scale_by_adam still increments its bias-correction count —
                # at unfreeze the stale count makes mu_hat ~(1-b1)g instead
                # of ~g, a ~3x oversized first update. Rewind the count on
                # frozen steps so unfreeze starts at 0, matching torch's
                # requires_grad freeze (fresh per-param step). The
                # lr-schedule count is NOT rewound: the reference steps its
                # scheduler globally, so the backbone joins at the current
                # schedule position.
                def _rewind(s):
                    if isinstance(s, optax.ScaleByAdamState):
                        return s._replace(count=s.count - 1)
                    return s

                bb_state = jax.tree_util.tree_map(
                    _rewind,
                    opt_state.inner_states["backbone"],
                    is_leaf=lambda z: isinstance(z, optax.ScaleByAdamState),
                )
                opt_state = opt_state._replace(
                    inner_states={**opt_state.inner_states, "backbone": bb_state}
                )
                updates = jax.tree_util.tree_map(
                    lambda lbl, u: jnp.zeros_like(u) if lbl == "backbone" else u,
                    self.labels,
                    updates,
                )
            params = optax.apply_updates(params, updates)
            params = merge_bn_stats(params, bn_updates)
            return params, opt_state, losses

        if not jit:
            return step

        if self.mesh is not None:
            from ..parallel.mesh import batch_sharded, replicated

            rep = replicated(self.mesh)
            dat = batch_sharded(self.mesh)
            rep_tree = lambda t: jax.tree_util.tree_map(lambda _: rep, t)
            in_shardings = (
                rep_tree(self.model.params),
                rep_tree(self.opt_state),
                dat,  # images
                dat,  # gt_labels
                dat,  # gt_boxes
                dat,  # gt_mask
                rep,  # key
            )
            return jax.jit(step, in_shardings=in_shardings, donate_argnums=(0, 1))
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _get_step(self, frozen: bool) -> Callable:
        if frozen not in self._steps:
            self._steps[frozen] = self._build_step(frozen)
        return self._steps[frozen]

    #: GT-count buckets: the TAL assignment is O(B * Nmax * A), and real COCO
    #: batches rarely exceed ~32 boxes/image, so padding every batch to the
    #: loader's max_boxes (128) wastes ~4x of the assignment work. Each
    #: bucket compiles once (bounded set), most steps run the small ones.
    NMAX_BUCKETS = (8, 16, 32, 64, 128)

    def _nmax_bucket(self, gt_mask) -> int:
        import numpy as np

        nmax = gt_mask.shape[1]
        need = int(np.max(np.sum(np.asarray(gt_mask), axis=1))) if nmax else 0
        for b in self.NMAX_BUCKETS:
            if need <= b <= nmax:
                return b
        return nmax

    def train_step(self, batch, key) -> Dict[str, float]:
        cfg = self.cfg
        epoch = self.global_step // max(1, cfg.steps_per_epoch)
        frozen = cfg.freeze_backbone and epoch < cfg.unfreeze_epoch
        multiproc = self.mesh is not None and jax.process_count() > 1
        # Multi-process: every process must compile the IDENTICAL program or
        # the GSPMD collectives deadlock, so the data-dependent GT-pad bucket
        # is pinned to the loader ceiling; batch arrays are per-host shards
        # assembled into global jax.Arrays.
        nb = batch.gt_mask.shape[1] if multiproc else self._nmax_bucket(batch.gt_mask)
        is_device_batch = hasattr(batch, "canvas")
        if is_device_batch != cfg.device_preprocess:
            raise ValueError(
                "batch/preprocess mismatch: TrainConfig.device_preprocess="
                f"{cfg.device_preprocess} but the loader produced a "
                f"{'DeviceBatch' if is_device_batch else 'host Batch'} — build "
                "the dataset with the matching preprocess= mode"
            )
        imgs = (
            (batch.canvas, batch.new_hw, batch.pads, batch.hw, batch.gainpad)
            if is_device_batch
            else batch.images
        )
        arrays = (
            imgs,
            batch.gt_labels[:, :nb],
            batch.gt_boxes[:, :nb],
            batch.gt_mask[:, :nb],
        )
        if multiproc:
            from ..parallel.distributed import global_batch

            # Flatten first: the device-preprocess image slot is itself a
            # tuple (canvas + geometry arrays), and every leaf is a per-host
            # batch shard that must become a global jax.Array.
            flat, treedef = jax.tree_util.tree_flatten(arrays)
            flat = global_batch(self.mesh, *flat)
            arrays = jax.tree_util.tree_unflatten(treedef, flat if isinstance(flat, tuple) else (flat,))
        else:
            arrays = jax.tree_util.tree_map(jnp.asarray, arrays)
        params, self.opt_state, losses = self._get_step(frozen)(
            self.model.params,
            self.opt_state,
            *arrays,
            key,
        )
        self.model.params = params
        self.global_step += 1
        return losses

    # -- resume support (an extension beyond the reference, which saves model
    # -- weights only and has no --resume; SURVEY §5 checkpoint notes) -------

    def save_train_state(self, path: str) -> None:
        """Optimizer state + step counter -> one .npz (model weights are
        checkpointed separately via registry.save_checkpoint)."""
        import numpy as np

        leaves = jax.tree_util.tree_leaves(self.opt_state)
        arrs = {f"opt_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
        arrs["global_step"] = np.asarray(self.global_step, np.int64)
        np.savez(path if path.endswith(".npz") else path + ".npz", **arrs)

    def load_train_state(self, path: str) -> None:
        """Strict restore into this trainer's optimizer-state structure."""
        import numpy as np

        leaves, treedef = jax.tree_util.tree_flatten(self.opt_state)
        with np.load(path, allow_pickle=False) as z:
            new = []
            for i, old in enumerate(leaves):
                arr = z[f"opt_{i}"]
                if tuple(arr.shape) != tuple(np.shape(old)):
                    raise ValueError(f"opt state leaf {i}: shape {arr.shape} != {np.shape(old)}")
                # .dtype reads device-array metadata; np.asarray(old) here
                # would pull every moment leaf (~2x model size) host-side
                # through the tunnel just to ask its dtype.
                old_dtype = old.dtype if hasattr(old, "dtype") else np.asarray(old).dtype
                new.append(jnp.asarray(arr, dtype=old_dtype))
            self.global_step = int(z["global_step"])
        self.opt_state = jax.tree_util.tree_unflatten(treedef, new)
        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            self.opt_state = shard_params(self.mesh, self.opt_state)
