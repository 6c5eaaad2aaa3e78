"""Loss and NMS parity vs the torch reference on synthetic inputs."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _synth(seed=0, b=2, nc=80, reg_max=16, shapes=((8, 8), (4, 4), (2, 2)), n_gt=(3, 5)):
    rng = np.random.RandomState(seed)
    feats = [rng.randn(b, 4 * reg_max + nc, h, w).astype(np.float32) for h, w in shapes]
    targets = []
    img = 64
    for i in range(b):
        n = n_gt[i % len(n_gt)]
        xy = rng.uniform(0, img - 8, (n, 2)).astype(np.float32)
        wh = rng.uniform(4, img / 2, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, np.minimum(xy + wh, img)], axis=1)
        labels = rng.randint(0, nc, (n,))
        targets.append({"boxes": boxes, "labels": labels})
    return feats, targets


@pytest.mark.parametrize("dual", [True, False])
def test_detection_loss_parity(dual):
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.models.yolov10.losses import detection_loss_v10 as ref_loss

    from leanyolo_tpu.models.yolov10.losses import build_padded_targets, detection_loss_v10

    nc = 80
    feats, targets = _synth()
    feats2, _ = _synth(seed=3)

    tt = [{k: torch.from_numpy(np.asarray(v)).float() if k == "boxes" else torch.from_numpy(np.asarray(v)).long() for k, v in t.items()} for t in targets]
    t_feats = [torch.from_numpy(f) for f in feats]
    t_feats2 = [torch.from_numpy(f) for f in feats2]
    if dual:
        ref = ref_loss({"one2many": t_feats, "one2one": t_feats2}, tt, num_classes=nc)
    else:
        ref = ref_loss(t_feats, tt, num_classes=nc)

    j_feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats]
    j_feats2 = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats2]
    gl, gb, gm = build_padded_targets(targets, max_boxes=8)
    raw = {"one2many": j_feats, "one2one": j_feats2} if dual else j_feats
    got = detection_loss_v10(raw, jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm), num_classes=nc)

    for k in ("total", "cls", "reg"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=2e-4, atol=2e-4)


def test_zero_targets_loss():
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.losses import detection_loss_v10

    feats, _ = _synth(b=1)
    j_feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats]
    gl = jnp.zeros((1, 4), jnp.int32)
    gb = jnp.zeros((1, 4, 4), jnp.float32)
    gm = jnp.zeros((1, 4), bool)
    out = detection_loss_v10(j_feats, gl, gb, gm, num_classes=80)
    assert float(out["reg"]) == 0.0
    assert np.isfinite(float(out["total"]))


def test_nms_fixed_matches_reference_greedy():
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.utils.box_ops import nms as ref_nms

    from leanyolo_tpu.ops.boxes import nms_fixed

    rng = np.random.RandomState(0)
    n = 200
    xy = rng.uniform(0, 600, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(0.01, 1.0, (n,)).astype(np.float32)

    keep_ref = ref_nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.45).numpy()
    keep_mask = np.asarray(nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.45))
    got = set(np.nonzero(keep_mask)[0].tolist())
    assert got == set(keep_ref.tolist())
