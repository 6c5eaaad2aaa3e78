"""Variant configuration integrity + checkpoint roundtrip forward-equality.

Mirrors the reference tests (reference: leanyolo/tests/
test_state_dict_roundtrip.py:10-14 and the variant constant tables).
"""

import numpy as np
import pytest


def test_variant_tables():
    from leanyolo_tpu.models.yolov10.config import VARIANTS

    assert set(VARIANTS) == {f"yolov10{v}" for v in "nsmblx"}
    for name, cfg in VARIANTS.items():
        assert set(cfg.ch) == set(range(11))
        assert set(cfg.hch) == {13, 16, 19, 22}
        assert cfg.reg_max == 16 and cfg.strides == (8, 16, 32)
        assert cfg.types["p4_p5"] == "C2fCIB"  # every variant uses CIB on P4->P5
    # spot-check the distinguishing entries
    assert VARIANTS["yolov10n"].ch[10] == 256 and not VARIANTS["yolov10n"].use_lk_c8
    assert VARIANTS["yolov10s"].use_lk_c8 and VARIANTS["yolov10s"].use_lk_p4_p5
    assert VARIANTS["yolov10m"].reps[4] == 4 and VARIANTS["yolov10m"].ch[8] == 576
    assert VARIANTS["yolov10b"].hch[13] == 512 and VARIANTS["yolov10b"].reps[2] == 2
    assert VARIANTS["yolov10l"].reps[2] == 3
    assert VARIANTS["yolov10x"].types["c6"] == "C2fCIB" and VARIANTS["yolov10x"].ch[0] == 80


def test_head_channel_formula():
    from leanyolo_tpu.models.yolov10.model import head_branch_channels

    # c2 = max(16, ch0//4, 64); c3 = max(ch0, min(nc, 100))
    assert head_branch_channels(80, (64, 128, 256), 16) == (64, 80)
    assert head_branch_channels(80, (320, 640, 640), 16) == (80, 320)
    assert head_branch_channels(3, (64, 128, 256), 16) == (64, 64)


@pytest.mark.parametrize("name", ["yolov10n", "yolov10s", "yolov10m", "yolov10b", "yolov10l", "yolov10x"])
def test_checkpoint_roundtrip_forward_equal(name, tmp_path):
    """Save -> load must reproduce identical forward outputs."""
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu import get_model
    from leanyolo_tpu.models.registry import load_checkpoint_into, save_checkpoint
    from leanyolo_tpu.models.yolov10.model import model_apply

    m1 = get_model(name, weights=None, class_names=["a", "b"], seed=5)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(m1, path)
    m2 = get_model(name, weights=None, class_names=["a", "b"], seed=99)
    load_checkpoint_into(m2, path)

    x = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    fwd = jax.jit(lambda p, xx: model_apply(p, xx, m1.cfg)["one2one"][0])
    np.testing.assert_array_equal(np.asarray(fwd(m1.params, x)), np.asarray(fwd(m2.params, x)))


def test_all_variants_init_param_counts():
    """Every variant builds; parameter counts are strictly ordered n<s<m<b<=l<x."""
    import jax

    from leanyolo_tpu.models.yolov10.config import VARIANTS
    from leanyolo_tpu.models.yolov10.model import model_init
    from leanyolo_tpu.models.yolov10.remap import flatten_param_paths

    counts = {}
    for name, cfg in VARIANTS.items():
        params = model_init(jax.random.PRNGKey(0), cfg, 80)
        counts[name] = sum(int(np.prod(np.asarray(leaf).shape)) for _, leaf in flatten_param_paths(params))
    assert counts["yolov10n"] < counts["yolov10s"] < counts["yolov10m"] < counts["yolov10b"]
    assert counts["yolov10b"] <= counts["yolov10l"] < counts["yolov10x"]
    # sanity vs published sizes (n ~2.8M total incl. dual head; x ~31.7M)
    assert 2e6 < counts["yolov10n"] < 4.5e6
    assert 25e6 < counts["yolov10x"] < 40e6
