"""Unit tests for ops: letterbox, boxes, anchors, coco_eval, val_log.

Mirrors the reference unit-test tiers (reference: leanyolo/tests/
test_letterbox.py, test_box_ops_extra.py, test_val_log_unit.py).
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available


class TestLetterbox:
    def test_square_upscale(self):
        from leanyolo_tpu.ops.letterbox import letterbox

        img = np.zeros((100, 200, 3), np.uint8)
        out, (gw, gh), (px, py) = letterbox(img, 640)
        assert out.shape == (640, 640, 3)
        assert gw == gh == pytest.approx(3.2)
        assert (px, py) == (0, 160)
        assert out[0, 0, 0] == 114  # pad color

    def test_no_scaleup(self):
        from leanyolo_tpu.ops.letterbox import letterbox

        img = np.zeros((100, 200, 3), np.uint8)
        out, (gw, gh), _ = letterbox(img, 640, scaleup=False)
        assert gw == gh == 1.0
        assert out.shape == (640, 640, 3)

    @pytest.mark.parametrize("stride", [32, 64])
    def test_auto_stride(self, stride):
        from leanyolo_tpu.ops.letterbox import letterbox

        img = np.zeros((100, 200, 3), np.uint8)
        out, _, _ = letterbox(img, 640, auto=True, stride=stride)
        assert out.shape[0] % stride == 0 and out.shape[1] % stride == 0

    def test_scale_fill(self):
        from leanyolo_tpu.ops.letterbox import letterbox

        img = np.zeros((100, 200, 3), np.uint8)
        out, (gw, gh), (px, py) = letterbox(img, 640, scale_fill=True)
        assert out.shape == (640, 640, 3)
        assert (px, py) == (0, 0)
        assert gw == pytest.approx(3.2) and gh == pytest.approx(6.4)

    @pytest.mark.skipif(not reference_available(), reason="reference not mounted")
    def test_parity_with_reference(self):
        sys.path.insert(0, REFERENCE_ROOT)
        from leanyolo.utils.letterbox import letterbox as ref_lb

        from leanyolo_tpu.ops.letterbox import letterbox

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (123, 457, 3), np.uint8)
        for kwargs in ({}, {"auto": True}, {"scaleup": False}, {"scale_fill": True}):
            a, ga, pa = letterbox(img, 320, **kwargs)
            b, gb, pb = ref_lb(img, 320, **kwargs)
            np.testing.assert_array_equal(a, b)
            assert ga == gb and pa == pb

    def test_choose_bucket(self):
        from leanyolo_tpu.ops.letterbox import choose_bucket

        assert choose_bucket((100, 200)) == 320
        assert choose_bucket((480, 640)) == 640
        assert choose_bucket((641, 100)) == 768
        assert choose_bucket((4000, 3000)) == 1280  # clamped to max bucket

    def test_jax_letterbox_geometry(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.letterbox import letterbox, letterbox_jax

        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        host, gh_, ph_ = letterbox(img, 160)
        dev, gd, pd = letterbox_jax(jnp.asarray(img), 160)
        assert gd == gh_ and pd == ph_
        assert dev.shape == host.shape
        # XLA bilinear vs cv2 INTER_LINEAR: close but not bit-equal.
        assert np.abs(np.asarray(dev) - host.astype(np.float32)).mean() < 8.0


class TestBoxes:
    def test_roundtrip(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.boxes import box_xywh_to_xyxy, box_xyxy_to_xywh

        b = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
        np.testing.assert_allclose(np.asarray(box_xywh_to_xyxy(box_xyxy_to_xywh(b))), np.asarray(b), atol=1e-5)

    def test_iou_identity(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.boxes import box_iou

        b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
        m = np.asarray(box_iou(b, b))
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
        assert 0.1 < m[0, 1] < 0.2  # 25/175

    def test_unletterbox(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.boxes import unletterbox_coords

        boxes = jnp.asarray([[160.0, 170.0, 480.0, 490.0]])
        out = np.asarray(unletterbox_coords(boxes, (3.2, 3.2), (0, 160), (100, 200)))
        np.testing.assert_allclose(out, [[50.0, 3.125, 150.0, 100.0]], atol=1e-3)

    def test_ciou_paired_matches_pairwise_diag(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.boxes import box_ciou_paired, box_ciou_pairwise

        rng = np.random.RandomState(0)
        xy = rng.uniform(0, 50, (16, 2)).astype(np.float32)
        wh = rng.uniform(5, 40, (16, 2)).astype(np.float32)
        a = jnp.asarray(np.concatenate([xy, xy + wh], axis=1))
        xy2 = rng.uniform(0, 50, (16, 2)).astype(np.float32)
        b = jnp.asarray(np.concatenate([xy2, xy2 + wh], axis=1))
        np.testing.assert_allclose(
            np.asarray(box_ciou_paired(a, b)), np.diag(np.asarray(box_ciou_pairwise(a, b))), atol=1e-5
        )


class TestAnchors:
    def test_make_anchors(self):
        from leanyolo_tpu.ops.anchors import make_anchors

        pts, strides = make_anchors([(4, 4), (2, 2)], (8, 16))
        assert pts.shape == (20, 2)
        np.testing.assert_allclose(np.asarray(pts)[0], [0.5, 0.5])
        np.testing.assert_allclose(np.asarray(strides)[:16], 8.0)
        np.testing.assert_allclose(np.asarray(strides)[16:], 16.0)

    def test_dist_roundtrip(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.anchors import bbox2dist, dist2bbox

        anchors = jnp.asarray([[10.0, 10.0]])
        dist = jnp.asarray([[2.0, 3.0, 4.0, 5.0]])
        box = dist2bbox(dist, anchors)
        np.testing.assert_allclose(np.asarray(box), [[8.0, 7.0, 14.0, 15.0]])
        back = bbox2dist(anchors, box, 16)
        np.testing.assert_allclose(np.asarray(back), np.asarray(dist))


class TestCocoEval:
    def _gt(self):
        return {
            "images": [{"id": 1, "width": 100, "height": 100}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
                {"id": 2, "image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20], "area": 400, "iscrowd": 0},
            ],
            "categories": [{"id": 1, "name": "a"}],
        }

    def test_perfect_detections(self):
        from leanyolo_tpu.utils.coco_eval import CocoEvaluator

        ev = CocoEvaluator(self._gt())
        ev.add_detections(
            [
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
                {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20], "score": 0.8},
            ]
        )
        stats = ev.evaluate()
        assert stats["map_50_95"] == pytest.approx(1.0)
        assert stats["map_50"] == pytest.approx(1.0)

    def test_missed_one(self):
        from leanyolo_tpu.utils.coco_eval import CocoEvaluator

        ev = CocoEvaluator(self._gt())
        ev.add_detections([{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9}])
        stats = ev.evaluate()
        # Recall caps at 0.5 -> AP ≈ 0.5 (101-pt: ~0.50495)
        assert 0.45 < stats["map_50"] < 0.55

    def test_false_positive_ranked_below(self):
        from leanyolo_tpu.utils.coco_eval import CocoEvaluator

        ev = CocoEvaluator(self._gt())
        ev.add_detections(
            [
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
                {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20], "score": 0.8},
                {"image_id": 1, "category_id": 1, "bbox": [0, 70, 10, 10], "score": 0.1},
            ]
        )
        assert ev.evaluate()["map_50"] == pytest.approx(1.0)

    def test_iou_threshold_sensitivity(self):
        from leanyolo_tpu.utils.coco_eval import CocoEvaluator

        ev = CocoEvaluator(self._gt())
        # Boxes shifted so IoU ≈ 0.6: TP at [email protected], FP at @0.75+.
        ev.add_detections(
            [
                {"image_id": 1, "category_id": 1, "bbox": [15, 10, 20, 20], "score": 0.9},
                {"image_id": 1, "category_id": 1, "bbox": [55, 50, 20, 20], "score": 0.8},
            ]
        )
        stats = ev.evaluate()
        assert stats["map_50"] == pytest.approx(1.0)
        assert stats["map_75"] == pytest.approx(0.0)

    def test_crowd_ignored(self):
        from leanyolo_tpu.utils.coco_eval import CocoEvaluator

        gt = self._gt()
        gt["annotations"].append(
            {"id": 3, "image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100], "area": 10000, "iscrowd": 1}
        )
        ev = CocoEvaluator(gt)
        ev.add_detections(
            [
                {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
                {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20], "score": 0.8},
            ]
        )
        assert ev.evaluate()["map_50_95"] == pytest.approx(1.0)


class TestValLog:
    def test_create_append_migrate(self, tmp_path):
        from leanyolo_tpu.utils.val_log import COLUMNS, append_row, ensure_csv

        path = tmp_path / "log.csv"
        append_row(path, {"model": "yolov10s", "map_50": "0.5"})
        append_row(path, {"model": "yolov10n"})
        lines = path.read_text().strip().split("\n")
        assert lines[0].split(",") == COLUMNS
        assert len(lines) == 3

        # Header migration: old schema rows remap into the new column order.
        old = tmp_path / "old.csv"
        old.write_text("model,fps\nyolov10s,42\n")
        ensure_csv(old)
        lines = old.read_text().strip().split("\n")
        assert lines[0].split(",") == COLUMNS
        row = dict(zip(COLUMNS, lines[1].split(",")))
        assert row["model"] == "yolov10s" and row["fps"] == "42"


class TestBlockedTopK:
    """ops/topk.py: blocked exact top-k must match lax.top_k bit-for-bit,
    including tie index ordering (ascending among equal values)."""

    def test_matches_lax_topk_random(self):
        import jax
        import jax.numpy as jnp

        from leanyolo_tpu.ops.topk import topk_lastdim

        rng = np.random.RandomState(0)
        for shape, k in [((4, 8400), 300), ((2, 3, 8400), 10), ((5, 24000), 300), ((3, 1000), 300)]:
            x = jnp.asarray(rng.randn(*shape).astype(np.float32))
            wv, wi = jax.lax.top_k(x, k)
            gv, gi = topk_lastdim(x, k)
            np.testing.assert_array_equal(np.asarray(wv), np.asarray(gv))
            np.testing.assert_array_equal(np.asarray(wi), np.asarray(gi))

    def test_matches_lax_topk_ties(self):
        import jax
        import jax.numpy as jnp

        from leanyolo_tpu.ops.topk import topk_lastdim

        rng = np.random.RandomState(1)
        # Heavy ties: few distinct values spread across blocks.
        x = jnp.asarray(rng.randint(0, 5, (6, 8400)).astype(np.float32))
        wv, wi = jax.lax.top_k(x, 300)
        gv, gi = topk_lastdim(x, 300)
        np.testing.assert_array_equal(np.asarray(wv), np.asarray(gv))
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(gi))

    def test_packed_bf16_matches_lax_topk(self):
        """bf16 inputs take the packed single-key-sort path; must stay exact."""
        import jax
        import jax.numpy as jnp

        from leanyolo_tpu.ops.topk import topk_lastdim

        rng = np.random.RandomState(2)
        for shape, k in [((4, 8400), 300), ((5, 24000), 300), ((3, 1000), 7)]:
            x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
            wv, wi = jax.lax.top_k(x, k)
            gv, gi = topk_lastdim(x, k)
            np.testing.assert_array_equal(np.asarray(wv, np.float32), np.asarray(gv, np.float32))
            np.testing.assert_array_equal(np.asarray(wi), np.asarray(gi))
        # Heavy ties (few distinct values) + special values: -inf mask, zeros
        # of both signs, subnormals — the u16 radix map must order them all.
        x = jnp.asarray(rng.randint(-3, 3, (6, 8400)).astype(np.float32)).astype(jnp.bfloat16)
        x = x.at[:, ::17].set(-jnp.inf).at[:, 5].set(-0.0).at[:, 6].set(0.0).at[:, 7].set(1e-40)
        wv, wi = jax.lax.top_k(x, 300)
        gv, gi = topk_lastdim(x, 300)
        np.testing.assert_array_equal(np.asarray(wv, np.float32), np.asarray(gv, np.float32))
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(gi))

    def test_max_argmax_fused_matches_two_reduce(self):
        """bf16 inputs take the packed one-reduce path; must equal
        max + argmax (first-occurrence ties) bit-for-bit, and f32 inputs
        must take the exact fallback."""
        import jax.numpy as jnp

        from leanyolo_tpu.ops.topk import max_argmax_lastdim

        rng = np.random.RandomState(5)
        for shape in [(4, 100, 80), (2, 8400, 80), (3, 7)]:
            for dtype in (jnp.bfloat16, jnp.float32):
                x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
                v, i = max_argmax_lastdim(x)
                np.testing.assert_array_equal(
                    np.asarray(v, np.float32), np.asarray(jnp.max(x, axis=-1), np.float32))
                np.testing.assert_array_equal(
                    np.asarray(i), np.asarray(jnp.argmax(x, axis=-1)))
        # Ties + special values: duplicated maxima must pick the FIRST.
        x = jnp.asarray([[1.0, 5.0, 5.0, -0.0, 0.0, 5.0], [-jnp.inf] * 6]).astype(jnp.bfloat16)
        v, i = max_argmax_lastdim(x)
        assert float(v[0]) == 5.0 and int(i[0]) == 1
        assert int(i[1]) == 0 and np.isneginf(float(v[1]))
        # Signed-zero maximum: -0.0 == +0.0 numerically, so the tie must
        # resolve to the FIRST occurrence like jnp.argmax (the pack step
        # canonicalizes -0.0; without it the +0.0 slot would win).
        z = jnp.asarray([[-0.0, 0.0, -1.0], [0.0, -0.0, -1.0], [-1.0, -0.0, 0.0]]).astype(jnp.bfloat16)
        v, i = max_argmax_lastdim(z)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(jnp.argmax(z, axis=-1)))
        np.testing.assert_array_equal(np.asarray(v, np.float32), np.asarray(jnp.max(z, axis=-1), np.float32))

    def test_k1_and_degenerate(self):
        import jax
        import jax.numpy as jnp

        from leanyolo_tpu.ops.topk import topk_lastdim

        x = jnp.asarray([[3.0, 7.0, 7.0, 1.0]])
        v, i = topk_lastdim(x, 1)
        assert float(v[0, 0]) == 7.0 and int(i[0, 0]) == 1  # first max, like top_k
        v4, i4 = topk_lastdim(x, 4)  # k == n: fall through to lax.top_k
        wv, wi = jax.lax.top_k(x, 4)
        np.testing.assert_array_equal(np.asarray(v4), np.asarray(wv))
        np.testing.assert_array_equal(np.asarray(i4), np.asarray(wi))


class TestTopkMembership:
    """ops/topk.py::topk_membership — the set-only top-k used by TAL must
    equal the presence mask of lax.top_k indices, including the
    first-occurrence tie rule."""

    def test_matches_lax_topk_set(self):
        import jax
        import jax.numpy as jnp

        from leanyolo_tpu.ops.topk import topk_membership

        rng = np.random.RandomState(3)
        for shape, k in [((4, 6, 8400), 10), ((3, 500), 1), ((2, 64), 7)]:
            x = rng.randn(*shape).astype(np.float32)
            # exact ties across positions + a constant row
            x[..., 10:20] = x[..., 30:40]
            x[0] = 0.25
            xj = jnp.asarray(x)
            _, wi = jax.lax.top_k(xj, k)
            want = np.zeros(shape, bool)
            np.put_along_axis(want, np.asarray(wi), True, axis=-1)
            got = np.asarray(topk_membership(xj, k))
            np.testing.assert_array_equal(got, want)
            assert got.sum(-1).min() == k == got.sum(-1).max()

    def test_k_ge_n_all_true(self):
        import jax.numpy as jnp

        from leanyolo_tpu.ops.topk import topk_membership

        x = jnp.asarray(np.random.RandomState(0).randn(3, 5).astype(np.float32))
        assert bool(np.asarray(topk_membership(x, 5)).all())
        assert bool(np.asarray(topk_membership(x, 9)).all())


class TestCompileCache:
    """enable_persistent_compile_cache precedence and guard rails.

    The test suite's conftest already configures a cache dir, so the helper
    must be a no-op here (that IS the documented behavior for in-process tool
    mains); the override branches are exercised by faking the config state.
    """

    def test_noop_when_already_configured(self):
        import jax

        from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

        before = jax.config.jax_compilation_cache_dir
        assert before  # conftest set it
        assert enable_persistent_compile_cache() is None
        assert jax.config.jax_compilation_cache_dir == before

    def test_env_disable_and_dir_selection(self, tmp_path, monkeypatch):
        import jax

        from leanyolo_tpu.utils import compile_cache

        before = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            monkeypatch.setenv(compile_cache.ENV_VAR, "0")
            assert compile_cache.enable_persistent_compile_cache() is None
            assert jax.config.jax_compilation_cache_dir is None

            env_dir = str(tmp_path / "envcache")
            monkeypatch.setenv(compile_cache.ENV_VAR, env_dir)
            # The env dir is the BASE; the host fingerprint subdir is
            # appended so AOT artifacts never cross a host change.
            import os

            scoped = os.path.join(env_dir, compile_cache.host_fingerprint())
            assert compile_cache.enable_persistent_compile_cache() == scoped
            assert jax.config.jax_compilation_cache_dir == scoped
            assert os.path.isdir(scoped)

            # explicit arg wins over env; but an existing config is kept
            assert compile_cache.enable_persistent_compile_cache(str(tmp_path / "x")) is None
        finally:
            jax.config.update("jax_compilation_cache_dir", before)
