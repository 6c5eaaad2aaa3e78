"""Gradient parity of the detection loss vs torch autograd.

Loss VALUE parity (test_losses_parity.py) does not pin down training
dynamics: the reference runs its TaskAlignedAssigner under @torch.no_grad()
(reference leanyolo/utils/tal.py:98) and detaches the DFL bin weights
(losses.py:48-49), so targets are constants w.r.t. predictions. Our jnp
assignment reaches its outputs exclusively through int/bool ops (argmax,
comparisons, one-hot masks), which autodiff treats as zero-gradient — these
tests prove that claim by differentiating both implementations end-to-end
and comparing d(loss)/d(raw head maps) elementwise.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available
from test_losses_parity import _synth

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _ref_grads(feats, feats2, targets, nc, dual):
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.models.yolov10.losses import detection_loss_v10 as ref_loss

    tt = [
        {
            "boxes": torch.from_numpy(np.asarray(t["boxes"])).float(),
            "labels": torch.from_numpy(np.asarray(t["labels"])).long(),
        }
        for t in targets
    ]
    t_feats = [torch.from_numpy(f).requires_grad_(True) for f in feats]
    t_feats2 = [torch.from_numpy(f).requires_grad_(True) for f in feats2]
    if dual:
        out = ref_loss({"one2many": t_feats, "one2one": t_feats2}, tt, num_classes=nc)
    else:
        out = ref_loss(t_feats, tt, num_classes=nc)
    out["total"].backward()
    g1 = [f.grad.numpy() for f in t_feats]
    g2 = [f.grad.numpy() for f in t_feats2] if dual else None
    return g1, g2


def _jax_grads(feats, feats2, targets, nc, dual):
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.losses import build_padded_targets, detection_loss_v10

    gl, gb, gm = build_padded_targets(targets, max_boxes=8)
    gl, gb, gm = jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm)

    def total(j_feats, j_feats2):
        raw = {"one2many": j_feats, "one2one": j_feats2} if dual else j_feats
        return detection_loss_v10(raw, gl, gb, gm, num_classes=nc)["total"]

    j_feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats]
    j_feats2 = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats2]
    g1, g2 = jax.grad(total, argnums=(0, 1))(j_feats, j_feats2)
    # NHWC -> NCHW to line up with the torch maps.
    g1 = [np.asarray(g).transpose(0, 3, 1, 2) for g in g1]
    g2 = [np.asarray(g).transpose(0, 3, 1, 2) for g in g2]
    return g1, (g2 if dual else None)


def _assert_close(got, ref, what):
    scale = max(float(np.max(np.abs(ref))), 1e-8)
    np.testing.assert_allclose(
        got, ref, rtol=1e-3, atol=2e-4 * scale, err_msg=f"{what}: grad mismatch (scale {scale:.3e})"
    )


@pytest.mark.parametrize("dual", [True, False])
def test_loss_grad_parity(dual):
    nc = 80
    feats, targets = _synth()
    feats2, _ = _synth(seed=3)
    rg1, rg2 = _ref_grads(feats, feats2, targets, nc, dual)
    jg1, jg2 = _jax_grads(feats, feats2, targets, nc, dual)
    for i, (a, b) in enumerate(zip(jg1, rg1)):
        _assert_close(a, b, f"one2many level {i}")
    if dual:
        for i, (a, b) in enumerate(zip(jg2, rg2)):
            _assert_close(a, b, f"one2one level {i}")


def test_loss_grad_parity_zero_and_single_gt():
    """Degenerate GT configurations exercise the has_any fallback and the
    denominator clamp (denom = max(sum target_scores, 1))."""
    nc = 80
    feats, targets = _synth(seed=7, n_gt=(1, 1))
    # One image keeps a single GT, the other gets none.
    targets[1] = {"boxes": np.zeros((0, 4), np.float32), "labels": np.zeros((0,), np.int64)}
    feats2, _ = _synth(seed=9, n_gt=(1, 1))
    rg1, rg2 = _ref_grads(feats, feats2, targets, nc, dual=True)
    jg1, jg2 = _jax_grads(feats, feats2, targets, nc, dual=True)
    for i, (a, b) in enumerate(zip(jg1, rg1)):
        _assert_close(a, b, f"one2many level {i}")
    for i, (a, b) in enumerate(zip(jg2, rg2)):
        _assert_close(a, b, f"one2one level {i}")
