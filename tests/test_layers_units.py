"""Layer unit tests: shapes, grouping, residuals, head contract, DFL.

Mirrors the reference unit tier (reference: leanyolo/tests/test_layers_v10.py:
23-110, test_head_v10.py:14-41) on the JAX blocks. CPU, tiny shapes.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    import jax

    return jax.random.PRNGKey(0)


class TestBlocks:
    def test_cba_shapes_and_stride(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        p = L.cba_init(rng, 8, 16, 3)
        x = jnp.ones((1, 16, 16, 8))
        assert L.cba_apply(p, x).shape == (1, 16, 16, 16)
        assert L.cba_apply(p, x, stride=2).shape == (1, 8, 8, 16)

    def test_cba_silu_vs_identity(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        p = L.cba_init(rng, 4, 4, 1)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 4).astype(np.float32))
        with_act = np.asarray(L.cba_apply(p, x, act=True))
        without = np.asarray(L.cba_apply(p, x, act=False))
        expected = without * (1.0 / (1.0 + np.exp(-without)))
        np.testing.assert_allclose(with_act, expected, rtol=1e-5, atol=1e-6)

    def test_bottleneck_residual(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        p = L.bottleneck_init(rng, 8, 8)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8).astype(np.float32))
        y_res = np.asarray(L.bottleneck_apply(p, x, shortcut=True))
        y_plain = np.asarray(L.bottleneck_apply(p, x, shortcut=False))
        np.testing.assert_allclose(y_res, np.asarray(x) + y_plain, rtol=1e-5, atol=1e-6)

    def test_c2f_channels(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        p = L.c2f_init(rng, 16, 24, n=2)
        x = jnp.ones((2, 8, 8, 16))
        assert L.c2f_apply(p, x, shortcut=True).shape == (2, 8, 8, 24)
        # cv2 input channels = (2 + n) * c where c = 24 // 2
        assert p["cv2"]["conv"]["w"].shape == (1, 1, 4 * 12, 24)

    def test_sppf_maxpool_chain(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        p = L.sppf_init(rng, 16, 16)
        x = jnp.ones((1, 8, 8, 16))
        assert L.sppf_apply(p, x).shape == (1, 8, 8, 16)

    def test_scdown_no_act_on_dw(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        p = L.scdown_init(rng, 8, 16)
        x = jnp.ones((1, 8, 8, 8))
        y = L.scdown_apply(p, x)
        assert y.shape == (1, 4, 4, 16)
        assert np.asarray(y).min() < 0  # no activation: negatives survive

    def test_cib_depthwise_shapes(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        for lk in (False, True):
            p = L.cib_init(rng, 16, 16, lk=lk)
            x = jnp.ones((1, 8, 8, 16))
            assert L.cib_apply(p, x, shortcut=True, lk=lk).shape == (1, 8, 8, 16)
            # depthwise kernels have cin/g == 1
            assert p["cv1"][0]["conv"]["w"].shape == (3, 3, 1, 16)

    def test_psa_attention_heads(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        p = L.psa_init(rng, 128)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 128).astype(np.float32))
        assert L.psa_apply(p, x).shape == (1, 4, 4, 128)
        # qkv output channels = c + 2 * num_heads * key_dim = 64 + 2*1*32
        assert p["attn"]["qkv"]["conv"]["w"].shape[-1] == 128

    def test_upsample_nearest(self):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10 import layers as L

        x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
        y = np.asarray(L.upsample2x_nearest(x))[0, :, :, 0]
        np.testing.assert_array_equal(y, [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])


class TestHead:
    def test_output_contract(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10.model import head_apply, head_init

        nc, ch = 7, (32, 64, 128)
        p = head_init(rng, nc, ch, reg_max=16)
        feats = [jnp.ones((2, s, s, c)) for s, c in zip((8, 4, 2), ch)]
        for branch in ("one2many", "one2one"):
            out = head_apply(p, feats, branch=branch)
            assert [o.shape for o in out] == [(2, 8, 8, 71), (2, 4, 4, 71), (2, 2, 2, 71)]

    def test_one2one_initially_identical(self, rng):
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10.model import head_apply, head_init

        p = head_init(rng, 3, (16, 32, 64), reg_max=16)
        feats = [jnp.asarray(np.random.RandomState(0).randn(1, s, s, c).astype(np.float32)) for s, c in zip((8, 4, 2), (16, 32, 64))]
        a = head_apply(p, feats, branch="one2many")
        b = head_apply(p, feats, branch="one2one")
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)

    def test_dfl_expectation_manual(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.anchors import dfl_expectation

        logits = np.zeros((1, 4 * 16), np.float32)
        logits[0, 0:16] = -1e9
        logits[0, 5] = 1e9  # side 0 -> bin 5 certain
        out = np.asarray(dfl_expectation(jnp.asarray(logits), 16))
        assert abs(out[0, 0] - 5.0) < 1e-4
        # uniform logits -> expectation = (reg_max - 1) / 2
        out2 = np.asarray(dfl_expectation(jnp.zeros((1, 64)), 16))
        np.testing.assert_allclose(out2[0], 7.5, atol=1e-5)


class TestDecodeGeometry:
    def test_topk_decode_box_geometry(self):
        """A synthetic certain DFL distribution decodes to the expected box."""
        import jax.numpy as jnp

        from leanyolo_tpu.models.yolov10.decode import decode_topk

        nc, reg_max, s = 3, 16, 8
        h = w = 4
        p = np.full((1, h, w, 4 * reg_max + nc), -20.0, np.float32)
        # anchor (1,1) at stride 8: center (12, 12); distances l=2,t=3,r=4,b=5
        for side, d in enumerate((2, 3, 4, 5)):
            p[0, 1, 1, side * reg_max + d] = 20.0
        p[0, 1, 1, 4 * reg_max + 1] = 10.0  # class 1 confident
        dets = np.asarray(decode_topk([jnp.asarray(p)], num_classes=nc, strides=(s,), max_det=5))
        top = dets[0, 0]
        np.testing.assert_allclose(top[:4], [12 - 16, 12 - 24, 12 + 32, 12 + 40], atol=1e-2)
        assert top[5] == 1.0
        assert top[4] > 0.99
