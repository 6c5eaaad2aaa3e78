"""Folded (BN->conv, RepVGGDW-fused) inference must match the unfused model."""

import numpy as np


def test_fold_params_inference_parity():
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.fold import fold_params
    from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply

    # yolov10s exercises RepVGGDW (use_lk_c8 + lk_p4_p5).
    model = YOLOv10.create("yolov10s", class_names=[f"c{i}" for i in range(5)], seed=0)
    # Perturb BN stats so folding is non-trivial.
    rng = np.random.RandomState(0)

    def perturb(tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "bn":
                    v["mean"] = jnp.asarray(rng.randn(*np.asarray(v["mean"]).shape).astype(np.float32) * 0.1)
                    v["var"] = jnp.asarray(1.0 + 0.5 * rng.rand(*np.asarray(v["var"]).shape).astype(np.float32))
                else:
                    perturb(v)
        elif isinstance(tree, list):
            for v in tree:
                perturb(v)

    perturb(model.params)
    folded = fold_params(model.params)

    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    fwd = jax.jit(lambda p, xx: model_apply(p, xx, model.cfg)["one2one"][0])
    a = np.asarray(fwd(model.params, x))
    b = np.asarray(fwd(folded, x))
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()


def test_fold_shrinks_tree():
    from leanyolo_tpu.models.yolov10.fold import fold_params
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.models.yolov10.remap import flatten_param_paths

    model = YOLOv10.create("yolov10s", class_names=["a"], seed=0)
    n_before = len(flatten_param_paths(model.params))
    n_after = len(flatten_param_paths(fold_params(model.params)))
    assert n_after < n_before / 2  # 4 BN leaves + w -> w + b


def test_fold_idempotent():
    """Re-folding folded params is a bit-exact no-op: the conv/bn and
    RepVGGDW patterns no longer match, and the norm fold zeroed the
    input_subtract/divide buffers it consumed (export_serving_bucketed's
    prefolded skip relies on this being safe, not on avoiding corruption)."""
    import jax
    import numpy as np

    from leanyolo_tpu.models.yolov10.fold import fold_params
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    model = YOLOv10.create("yolov10n", class_names=["a"], seed=0)
    f1 = fold_params(model.params)
    f2 = fold_params(f1)
    l1, t1 = jax.tree.flatten(f1)
    l2, t2 = jax.tree.flatten(f2)
    assert t1 == t2
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_predictor_update_params_refolds():
    """update_params on a fuse=True predictor must accept ORDINARY unfolded
    weights: the compiled program skips normalization and expects BN folded
    into convs, so staging raw params verbatim would silently produce garbage.
    The predictor re-folds on update (idempotent for already-folded input)."""
    import jax.numpy as jnp
    import numpy as np

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    m1 = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    m2 = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=7)
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (1, 64, 64, 3), np.uint8)
    )

    fused = Predictor(m1, imgsz=64, decode="topk", fuse=True, donate=False)
    ref = Predictor(m2, imgsz=64, decode="topk", fuse=True, donate=False)
    want, _ = ref.run_batch(x)

    # Hot-swap m2's UNFOLDED weights into the fused predictor.
    fused.update_params(m2.params)
    got, _ = fused.run_batch(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    # Already-folded input passes through bit-identically (idempotence).
    fused.update_params(ref.params)
    got2, _ = fused.run_batch(x)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))


def test_fold_dtype_precast_bitwise_identical():
    """fold_params(dtype=bf16) must be BITWISE equal to the per-call
    w.astype(x.dtype) path on the folded tree (same round-to-nearest-even),
    so bf16 serving can stage weights once with zero numeric change.
    (Only the folded tree: unfused BN computes rsqrt(var+eps)*scale in f32.)"""
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.models.yolov10.fold import fold_params
    from leanyolo_tpu.models.yolov10.model import YOLOv10, model_apply

    model = YOLOv10.create("yolov10n", class_names=[f"c{i}" for i in range(3)], seed=3)
    f32 = fold_params(model.params)
    b16 = fold_params(model.params, dtype=jnp.bfloat16)

    # Every float leaf is staged bf16 (shape/tree unchanged).
    l32, t32 = jax.tree.flatten(f32)
    l16, t16 = jax.tree.flatten(b16)
    assert t32 == t16
    assert all(b.dtype == jnp.bfloat16 for a, b in zip(l32, l16)
               if np.asarray(a).dtype == np.float32)

    x = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (2, 64, 64, 3), np.uint8)
    ).astype(jnp.bfloat16)
    fwd = jax.jit(lambda p, xx: model_apply(p, xx, model.cfg, train=False,
                                            normalize=False)["one2one"][0])
    a = np.asarray(fwd(f32, x), np.float32)
    b = np.asarray(fwd(b16, x), np.float32)
    np.testing.assert_array_equal(a, b)


def test_fused_bf16_predictor_staged_and_update_keeps_dtype():
    """fuse=True + bfloat16 stages folded weights in bf16, and update_params
    restages in bf16 (a dtype flip would retrace the compiled program)."""
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    m = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    pred = Predictor(m, imgsz=64, decode="topk", dtype="bfloat16", fuse=True, donate=False)

    def float_leaf_dtypes(tree):
        return {str(a.dtype) for a in jax.tree.leaves(tree)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)}

    assert float_leaf_dtypes(pred.params) == {"bfloat16"}

    x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (1, 64, 64, 3), np.uint8))
    d1, _ = pred.run_batch(x)

    m2 = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=9)
    pred.update_params(m2.params)  # unfolded f32 in -> folded bf16 staged
    assert float_leaf_dtypes(pred.params) == {"bfloat16"}
    d2, _ = pred.run_batch(x)
    assert np.asarray(d2).shape == np.asarray(d1).shape
