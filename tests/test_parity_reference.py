"""Architecture + weight-converter parity vs the torch reference oracle.

The official pretrained checkpoints are not available offline, so these tests
build the *reference torch implementation* (imported read-only from
/root/reference) with seeded random weights, convert its state_dict through
our remap pipeline, and require the JAX model to reproduce the torch outputs
within the reference fidelity tolerances (rtol/atol 1e-4, max_abs 5e-4;
reference: leanyolo/tests/fidelity/rubric.py:28-45).

This exercises every layer, the full graph wiring, and the OIHW->HWIO
conversion in one shot.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

RTOL = 1e-4
ATOL = 1e-4
MAX_ABS = 5e-4


def _build_reference_model(name: str, nc: int = 80, seed: int = 0):
    sys.path.insert(0, REFERENCE_ROOT)
    import torch

    from leanyolo.models import get_model as ref_get_model

    torch.manual_seed(seed)
    model = ref_get_model(
        name,
        weights=None,
        class_names=[f"c{i}" for i in range(nc)],
        input_norm_subtract=[0.0],
        input_norm_divide=[1.0],
    )
    model.eval()
    return model


def _convert_to_jax(torch_model, name: str, nc: int = 80):
    import jax

    from leanyolo_tpu.models.yolov10.config import VARIANTS
    from leanyolo_tpu.models.yolov10.model import model_init
    from leanyolo_tpu.models.yolov10.remap import torch_sd_to_params

    sd = {k: v for k, v in torch_model.state_dict().items() if k != "head.dfl.bins"}
    cfg = VARIANTS[name]
    template = model_init(jax.random.PRNGKey(1), cfg, nc)
    params, stats = torch_sd_to_params(sd, template, official=False, strict=True)
    assert not stats["missing"], stats["missing"][:5]
    assert not stats["unused_src"], stats["unused_src"][:5]
    return cfg, params


@pytest.mark.parametrize("name", ["yolov10n", "yolov10s", "yolov10m", "yolov10b", "yolov10l", "yolov10x"])
def test_forward_parity_random_weights(name):
    import jax
    import jax.numpy as jnp
    import torch

    from leanyolo_tpu.models.yolov10.model import model_apply

    ref = _build_reference_model(name)
    cfg, params = _convert_to_jax(ref, name)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 320, 320).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))  # eval: list of 3 one2many maps
        ref_o2o = ref._eval_branches["one2one"]

    fwd = jax.jit(lambda p, xx: model_apply(p, xx, cfg, precision=jax.lax.Precision.HIGHEST))
    out = fwd(params, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for lvl in range(3):
        for branch, ref_maps in (("one2many", ref_out), ("one2one", ref_o2o)):
            got = np.asarray(out[branch][lvl]).transpose(0, 3, 1, 2)
            want = ref_maps[lvl].numpy()
            assert got.shape == want.shape
            max_abs = np.abs(got - want).max()
            assert max_abs < MAX_ABS, f"{name} {branch} P{lvl+3} max_abs={max_abs}"


def test_decode_topk_parity_synthetic():
    """Two-stage top-k decode vs the reference on synthetic head outputs.

    Random logits make every score distinct, so selection order is
    deterministic and rows must match exactly (up to float tolerance).
    """
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.models.yolov10.postprocess import decode_v10_official_topk

    from leanyolo_tpu.models.yolov10.decode import decode_topk

    nc, reg_max = 80, 16
    rng = np.random.RandomState(7)
    shapes = [(40, 40), (20, 20), (10, 10)]
    preds_nchw = [rng.randn(2, 4 * reg_max + nc, h, w).astype(np.float32) for h, w in shapes]

    with torch.no_grad():
        ref_out = decode_v10_official_topk(
            [torch.from_numpy(p) for p in preds_nchw], num_classes=nc, strides=(8, 16, 32), max_det=300
        )

    preds_nhwc = [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in preds_nchw]
    dets = np.asarray(decode_topk(preds_nhwc, num_classes=nc, strides=(8, 16, 32), max_det=300))

    for i in range(2):
        want = ref_out[i][0].numpy()
        got = dets[i]
        assert got.shape == want.shape
        np.testing.assert_allclose(got[:, 4], want[:, 4], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got[:, 5], want[:, 5])
        np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-4, atol=1e-3)
