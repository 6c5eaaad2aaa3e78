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
