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


def test_nms_schedules_agree_with_reference_greedy_fuzz():
    """Blocked substitution == global Jacobi == the reference Python-loop
    greedy, across overlap densities, block-boundary sizes, and -inf padding
    (the blocked schedule's intra/inter split and padded zero-boxes are the
    risky edges)."""
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.utils.box_ops import nms as ref_nms

    from leanyolo_tpu.ops.boxes import nms_fixed

    for seed, n, spread, block in [
        (1, 64, 600, 128),     # n < block
        (2, 128, 600, 128),    # n == block
        (3, 200, 600, 128),    # n not divisible by block
        (4, 300, 120, 64),     # DENSE overlaps -> deep suppression chains
        (5, 257, 40, 128),     # near-total overlap, worst-case chains
        (6, 512, 2000, 128),   # sparse, nearly no suppression
    ]:
        rng = np.random.RandomState(seed)
        xy = rng.uniform(0, spread, (n, 2)).astype(np.float32)
        wh = rng.uniform(10, 120, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], axis=1)
        scores = rng.uniform(0.01, 1.0, (n,)).astype(np.float32)
        # -inf padding tail like decode_nms's conf-masked candidates.
        n_pad = 32
        boxes_p = np.concatenate([boxes, np.zeros((n_pad, 4), np.float32)])
        scores_p = np.concatenate([scores, np.full((n_pad,), -np.inf, np.float32)])

        want = set(ref_nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.45).numpy().tolist())
        for schedule in ("blocked", "jacobi"):
            keep = np.asarray(
                nms_fixed(jnp.asarray(boxes_p), jnp.asarray(scores_p), 0.45,
                          schedule=schedule, block=block)
            )
            got = set(np.nonzero(keep[:n])[0].tolist())
            assert got == want, (seed, schedule, len(got ^ want))

        # Presorted + valid-mask path (what decode_nms actually calls):
        # candidates sorted by score desc, ~25% conf-masked via `valid`.
        # Oracle: reference greedy over ONLY the valid candidates.
        order = np.argsort(-scores, kind="stable")
        boxes_sorted, scores_sorted = boxes[order], scores[order]
        vmask = np.random.RandomState(seed + 100).uniform(size=n) > 0.25
        vb, vs = boxes_sorted[vmask], scores_sorted[vmask]
        want_v = set(ref_nms(torch.from_numpy(vb), torch.from_numpy(vs), 0.45).numpy().tolist())
        keep_ps = np.asarray(
            nms_fixed(jnp.asarray(boxes_sorted), jnp.asarray(scores_sorted), 0.45,
                      presorted=True, valid=jnp.asarray(vmask), block=block)
        )
        got_v = set(np.nonzero(keep_ps[vmask])[0].tolist())
        assert got_v == want_v, (seed, "presorted", len(got_v ^ want_v))
        assert not np.any(keep_ps & ~vmask), "conf-masked candidate kept"

        # valid WITHOUT presorted (public-API path) must have the same
        # force-dead semantics: identical keep mask as the presorted path on
        # the same (sorted) inputs, and no invalid entry ever kept.
        keep_unsorted = np.asarray(
            nms_fixed(jnp.asarray(boxes_sorted), jnp.asarray(scores_sorted), 0.45,
                      valid=jnp.asarray(vmask), block=block)
        )
        assert keep_unsorted.tolist() == keep_ps.tolist(), (seed, "valid-unsorted")

    # Exact duplicates must suppress (the later one dies), incl. across a
    # block boundary and under the presorted path.
    dup = np.array([[10, 10, 50, 50]] * 3 + [[200, 200, 240, 240]], np.float32)
    sc = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    for kw in ({}, {"presorted": True, "valid": jnp.asarray([True] * 4)}):
        keep = np.asarray(nms_fixed(jnp.asarray(dup), jnp.asarray(sc), 0.45, block=2, **kw))
        assert keep.tolist() == [True, False, False, True], (kw, keep)
