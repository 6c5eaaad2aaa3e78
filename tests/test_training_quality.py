"""Training-path quality tests: loss ordering and short-horizon overfitting.

Mirrors the reference loss-behavior tier (reference: leanyolo/tests/
test_losses_v10.py:15-247 — loss improves with better predictions) and adds
an end-to-end overfit smoke test for the full jitted train step.
"""

import numpy as np
import pytest


def _synth_feats_for_target(box, label, nc=4, reg_max=16, shapes=((8, 8), (4, 4), (2, 2)), strides=(8, 16, 32), good=True):
    """Construct head outputs that either match a GT box well or are random."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    feats = []
    for (h, w), s in zip(shapes, strides):
        f = rng.randn(1, h, w, 4 * reg_max + nc).astype(np.float32) * (0.01 if good else 2.0)
        if good:
            f[..., 4 * reg_max :] = -8.0  # all classes near zero prob
        feats.append(f)
    if good:
        # Put a confident, well-localized prediction at the anchor whose cell
        # center is inside the box, on the right level.
        x1, y1, x2, y2 = box
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        lvl, s = 0, strides[0]
        gi, gj = int(cy // s), int(cx // s)
        ax, ay = gj + 0.5, gi + 0.5  # anchor center in cells
        dist = np.asarray([ax - x1 / s, ay - y1 / s, x2 / s - ax, y2 / s - ay])
        for side, d in enumerate(np.clip(dist, 0, reg_max - 1.01)):
            lo = int(np.floor(d))
            feats[lvl][0, gi, gj, side * reg_max + lo] = 12.0 * (1 - (d - lo))
            feats[lvl][0, gi, gj, side * reg_max + min(lo + 1, reg_max - 1)] = 12.0 * (d - lo)
        feats[lvl][0, gi, gj, 4 * reg_max + label] = 8.0
    return [jnp.asarray(f) for f in feats]


def test_loss_lower_for_better_predictions():
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.losses import detection_loss_v10

    box = np.asarray([8.0, 8.0, 40.0, 40.0], np.float32)
    gl = jnp.asarray([[2]], jnp.int32).reshape(1, 1)
    gb = jnp.asarray(box).reshape(1, 1, 4)
    gm = jnp.ones((1, 1), bool)

    good = detection_loss_v10(_synth_feats_for_target(box, 2, good=True), gl, gb, gm, num_classes=4)
    bad = detection_loss_v10(_synth_feats_for_target(box, 2, good=False), gl, gb, gm, num_classes=4)
    assert float(good["total"]) < float(bad["total"])
    assert float(good["cls"]) < float(bad["cls"])


def test_lambda_scaling():
    """reg term scales with lambda_dfl/lambda_iou (reference test_losses_v10)."""
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.losses import _branch_loss

    box = np.asarray([8.0, 8.0, 40.0, 40.0], np.float32)
    feats = _synth_feats_for_target(box, 2, good=False)
    gl = jnp.asarray([[2]], jnp.int32).reshape(1, 1)
    gb = jnp.asarray(box).reshape(1, 1, 4)
    gm = jnp.ones((1, 1), bool)
    kw = dict(num_classes=4, reg_max=16, strides=(8, 16, 32), tal_topk=10)
    base = _branch_loss(feats, gl, gb, gm, **kw)
    doubled = _branch_loss(feats, gl, gb, gm, lambda_iou=2.0, lambda_dfl=3.0, **kw)
    assert float(doubled["reg"]) > float(base["reg"])
    assert float(doubled["cls"]) == pytest.approx(float(base["cls"]))


@pytest.mark.slow
def test_overfit_single_image():
    """30 jitted train steps on one synthetic image must slash the loss."""
    import jax

    from leanyolo_tpu.data.dataset import Batch
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    rng = np.random.RandomState(0)
    img = np.full((1, 64, 64, 3), 100, np.float32)
    img[0, 16:40, 8:32] = 220.0
    boxes = np.asarray([[8.0, 16.0, 32.0, 40.0]], np.float32)
    batch = Batch(
        img,
        np.asarray([[0]], np.int32),
        boxes.reshape(1, 1, 4),
        np.ones((1, 1), bool),
        [None],
    )

    model = YOLOv10.create("yolov10n", class_names=["thing"], seed=0)
    cfg = TrainConfig(lr=2e-3, epochs=1, steps_per_epoch=30, warmup_epochs=0, augment=False, grad_clip=10.0)
    tr = Trainer(model, cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        out = tr.train_step(batch, sub)
        losses.append(float(out["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_frozen_backbone_keeps_moments_cold():
    """While frozen, backbone params must not move AND the AdamW moments for
    backbone leaves must stay exactly zero (reference requires_grad freeze,
    tools/train.py:213-217 — a warm, stale moment at unfreeze would bias the
    first live updates)."""
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.data.dataset import Batch
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    w0_shape = np.asarray(model.params["backbone"]["cv0"]["conv"]["w"]).shape
    w0_before = np.asarray(model.params["backbone"]["cv0"]["conv"]["w"]).copy()

    cfg = TrainConfig(
        epochs=4, steps_per_epoch=1, freeze_backbone=True, unfreeze_epoch=2,
        augment=False, grad_clip=0.0, lr=1e-2,
    )
    tr = Trainer(model, cfg)
    rng = np.random.RandomState(0)
    b = 2
    batch = Batch(
        rng.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32),
        np.zeros((b, 4), np.int32),
        np.tile(np.asarray([4, 4, 30, 30], np.float32), (b, 4, 1)),
        np.concatenate([np.ones((b, 1), bool), np.zeros((b, 3), bool)], axis=1),
        [None] * b,
    )

    head_before = np.asarray(tr.model.params["head"]["cv2"][0]["2"]["w"]).copy()

    tr.train_step(batch, jax.random.PRNGKey(0))
    tr.train_step(batch, jax.random.PRNGKey(1))  # still frozen (epochs 0,1)

    w0_frozen = np.asarray(tr.model.params["backbone"]["cv0"]["conv"]["w"])
    np.testing.assert_array_equal(w0_frozen, w0_before)
    # The frozen program stop-gradients ONLY backbone/neck: the head must
    # keep training through it (its grads flow, its moments warm up).
    head_frozen = np.asarray(tr.model.params["head"]["cv2"][0]["2"]["w"])
    assert np.abs(head_frozen - head_before).max() > 0

    # cv0's kernel shape is unique in the tree; any optimizer-state leaf with
    # that shape is one of its AdamW moments and must be identically zero.
    moment_leaves = [
        np.asarray(leaf)
        for leaf in jax.tree_util.tree_leaves(tr.opt_state)
        if hasattr(leaf, "shape") and tuple(leaf.shape) == tuple(w0_shape)
    ]
    assert moment_leaves, "expected AdamW moment leaves for backbone cv0"
    for leaf in moment_leaves:
        assert np.all(leaf == 0.0)

    # The backbone Adam bias-correction count must NOT advance while frozen:
    # a stale count at unfreeze makes mu_hat ~(1-b1)g instead of ~g (a ~3x
    # oversized first live update vs torch's fresh per-param step).
    import optax

    def bb_adam_count(opt_state):
        counts = [
            int(s.count)
            for s in jax.tree_util.tree_leaves(
                opt_state.inner_states["backbone"],
                is_leaf=lambda z: isinstance(z, optax.ScaleByAdamState),
            )
            if isinstance(s, optax.ScaleByAdamState)
        ]
        assert len(counts) == 1
        return counts[0]

    assert bb_adam_count(tr.opt_state) == 0, "count advanced during freeze"

    # After the unfreeze epoch the backbone must move again, and the count
    # starts from a fresh 0 -> 1.
    tr.train_step(batch, jax.random.PRNGKey(2))  # epoch 2: unfrozen
    w0_after = np.asarray(tr.model.params["backbone"]["cv0"]["conv"]["w"])
    assert np.abs(w0_after - w0_before).max() > 0
    assert bb_adam_count(tr.opt_state) == 1


def test_augment_batch_rejects_uint8_without_dtype():
    """Integer batches need an explicit compute dtype: brightness jitter in
    uint8 arithmetic would truncate alpha to 0/1 and wrap beta."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from leanyolo_tpu.engine.trainer import augment_batch

    imgs = jnp.asarray(np.zeros((2, 8, 8, 3), np.uint8))
    boxes = jnp.zeros((2, 1, 4), jnp.float32)
    with pytest.raises(ValueError, match="dtype"):
        augment_batch(jax.random.PRNGKey(0), imgs, boxes, p_hflip=0.5, p_bc=0.5)
    out, _ = augment_batch(jax.random.PRNGKey(0), imgs, boxes, p_hflip=0.5, p_bc=0.5, dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
