"""Data-parallel sharding tests on a virtual 8-device CPU mesh."""

import numpy as np
import pytest


def _n_devices():
    import jax

    return len(jax.devices())


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_mesh_train_step_matches_single_device():
    """A DP train step over 8 devices must produce the same loss as 1 device."""
    import jax

    from leanyolo_tpu.data.dataset import Batch
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    b = 8
    batch = Batch(
        rng.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32),
        np.zeros((b, 4), np.int32),
        np.tile(np.asarray([4, 4, 30, 30], np.float32), (b, 4, 1)),
        np.concatenate([np.ones((b, 1), bool), np.zeros((b, 3), bool)], axis=1),
        [None] * b,
    )
    cfg = TrainConfig(epochs=1, steps_per_epoch=1, augment=False, grad_clip=0.0)

    def run(mesh):
        model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
        tr = Trainer(model, cfg, mesh=mesh)
        losses = tr.train_step(batch, jax.random.PRNGKey(0))
        return float(losses["total"]), model

    loss_dp, model_dp = run(make_mesh(8))
    loss_1, model_1 = run(None)
    assert loss_dp == pytest.approx(loss_1, rel=1e-4)

    w_dp = np.asarray(model_dp.params["head"]["cv2"][0]["2"]["w"])
    w_1 = np.asarray(model_1.params["head"]["cv2"][0]["2"]["w"])
    np.testing.assert_allclose(w_dp, w_1, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_shard_batch_layout():
    import jax

    from leanyolo_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    mesh = make_mesh(8)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(xs), x)

    p = {"a": np.ones((3, 3), np.float32)}
    ps = shard_params(mesh, p)
    assert ps["a"].sharding.num_devices == 8


def test_dryrun_multichip_entry():
    """The driver-facing dry run must work on whatever devices exist."""
    import jax

    import __graft_entry__ as g

    n = min(len(jax.devices()), 8)
    g.dryrun_multichip(n)


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_dp_validation_matches_single_device(tmp_path):
    """Sharded eval over an 8-device mesh must reproduce single-device mAP
    and per-detection outputs (VERDICT: DP for val, SURVEY §2.3)."""
    import sys

    sys.path.insert(0, "tests")
    from synth_coco import make_synth_coco

    from leanyolo_tpu import get_model
    from leanyolo_tpu.engine.validator import validate_coco
    from leanyolo_tpu.parallel.mesh import make_mesh

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=6)
    model = get_model("yolov10n", weights=None, class_names=["a", "b", "c"], seed=3)

    kw = dict(images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=8, workers=2)
    s1 = validate_coco(model, **kw)
    s8 = validate_coco(model, mesh=make_mesh(8), **kw)
    assert s8["map_50_95"] == pytest.approx(s1["map_50_95"], abs=1e-9)
    assert s8["n_images"] == s1["n_images"] == 6


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_dp_predictor_run_batch_sharded():
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import make_mesh

    model = YOLOv10.create("yolov10n", class_names=["a"], seed=0)
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (8, 64, 64, 3)).astype(np.float32))
    p1 = Predictor(model, imgsz=64, decode="topk", donate=False)
    p8 = Predictor(model, imgsz=64, decode="topk", donate=False, mesh=make_mesh(8))
    d1, n1 = p1.run_batch(x)
    d8, n8 = p8.run_batch(x)
    assert d8.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d8), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n8))


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_hybrid_mesh_train_step_matches_single_device():
    """DP over a 2-D (dcn, ici) hybrid mesh — 2 host granules x 4 chips —
    must match the single-device step (GSPMD hierarchical all-reduce)."""
    import jax

    from leanyolo_tpu.data.dataset import Batch
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import make_hybrid_mesh

    rng = np.random.RandomState(1)
    b = 8
    batch = Batch(
        rng.randint(0, 256, (b, 64, 64, 3)).astype(np.uint8),
        np.zeros((b, 4), np.int32),
        np.tile(np.asarray([4, 4, 30, 30], np.float32), (b, 4, 1)),
        np.concatenate([np.ones((b, 1), bool), np.zeros((b, 3), bool)], axis=1),
        [None] * b,
    )
    cfg = TrainConfig(epochs=1, steps_per_epoch=1, augment=False, grad_clip=0.0)

    def run(mesh):
        model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
        tr = Trainer(model, cfg, mesh=mesh)
        losses = tr.train_step(batch, jax.random.PRNGKey(0))
        return float(losses["total"])

    mesh = make_hybrid_mesh(2)
    assert mesh.devices.shape == (2, 4) and mesh.axis_names == ("dcn", "data")
    assert run(mesh) == pytest.approx(run(None), rel=1e-4)


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_hybrid_mesh_predictor_matches_single_device():
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import make_hybrid_mesh

    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (8, 64, 64, 3)).astype(np.uint8)
    model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    p1 = Predictor(model, imgsz=64, decode="topk", donate=False)
    d1, n1 = p1.run_batch(jnp.asarray(imgs))
    pm = Predictor(model, imgsz=64, decode="topk", donate=False, mesh=make_hybrid_mesh(2))
    dm, nm = pm.run_batch(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dm), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(nm))


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_spatial_partition_predictor_matches_single_device():
    """(2 data, 4 space) mesh: images shard on H over `space`, so GSPMD
    partitions every conv spatially (halo exchanges over ICI on hardware).
    Detections must match the single-device forward."""
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import make_sp_mesh

    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    p1 = Predictor(model, imgsz=64, decode="topk", donate=False)
    d1, n1 = p1.run_batch(jnp.asarray(imgs))
    mesh = make_sp_mesh(2, 4)
    assert mesh.devices.shape == (2, 4) and mesh.axis_names == ("data", "space")
    sp = Predictor(model, imgsz=64, decode="topk", donate=False, mesh=mesh)
    ds, ns = sp.run_batch(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(ds), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(ns))


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_spatial_partition_latency_mesh_single_image():
    """Pure latency mode: a (1, 8) mesh runs ONE image spread across all
    8 chips — the config DP cannot express (DP needs B >= n_devices)."""
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import make_sp_mesh

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (1, 64, 64, 3)).astype(np.uint8)
    model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    p1 = Predictor(model, imgsz=64, decode="topk", donate=False)
    d1, n1 = p1.run_batch(jnp.asarray(img))
    sp = Predictor(model, imgsz=64, decode="topk", donate=False, mesh=make_sp_mesh(1, 8))
    ds, ns = sp.run_batch(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(ds), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(ns))


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_tensor_parallel_predictor_matches_single_device():
    """(2 data, 4 model) mesh: conv kernels shard on output channels over
    `model` (each chip applies a filter slice; GSPMD threads the channel
    sharding through the net). Detections must match single-device."""
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import MODEL_AXIS, make_tp_mesh

    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    p1 = Predictor(model, imgsz=64, decode="topk", donate=False)
    d1, n1 = p1.run_batch(jnp.asarray(imgs))
    mesh = make_tp_mesh(2, 4)
    assert mesh.axis_names == ("data", "model")
    tp = Predictor(model, imgsz=64, decode="topk", donate=False, mesh=mesh)
    dt, nt = tp.run_batch(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dt), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(nt))
    # at least one parameter leaf must actually be sharded over `model`
    import jax

    sharded = [
        x for x in jax.tree.leaves(tp.params)
        if hasattr(x, "sharding") and MODEL_AXIS in getattr(x.sharding, "spec", ())
    ]
    assert sharded, "no parameter ended up model-sharded"


def test_predictors_sharing_a_model_stay_isolated():
    """Constructing a TP-meshed Predictor must NOT reshard the shared model's
    params in place: a previously-built plain Predictor (jitted against
    replicated/default placement) keeps producing identical results, and its
    update_params keeps working from the untouched host pytree."""
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.engine.predictor import Predictor
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.parallel.mesh import make_tp_mesh

    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    model = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    plain = Predictor(model, imgsz=64, decode="topk", donate=False)
    before, nb_before = plain.run_batch(jnp.asarray(imgs))
    before = np.asarray(before)

    tp = Predictor(model, imgsz=64, decode="topk", donate=False, mesh=make_tp_mesh(2, 4))
    tp.run_batch(jnp.asarray(imgs))
    # model.params placement is untouched (no multi-device committed leaves)
    for leaf in jax.tree.leaves(model.params):
        if hasattr(leaf, "sharding"):
            assert len(leaf.sharding.device_set) == 1, "shared model got resharded in place"

    after, nb_after = plain.run_batch(jnp.asarray(imgs))
    np.testing.assert_array_equal(before, np.asarray(after))
    np.testing.assert_array_equal(np.asarray(nb_before), np.asarray(nb_after))
    # weight refresh through the private staging path still works
    plain.update_params(model.params)
    again, _ = plain.run_batch(jnp.asarray(imgs))
    np.testing.assert_array_equal(before, np.asarray(again))


def test_distributed_single_process_degrades():
    """init_distributed with no coordinator is a local no-op; global_batch
    falls back to a sharded device_put; process_local_slice covers the batch."""
    from leanyolo_tpu.parallel import distributed as dist
    from leanyolo_tpu.parallel.mesh import make_mesh

    assert dist.init_distributed() == 1
    assert dist.init_distributed() == 1  # idempotent

    n = _n_devices()
    mesh = make_mesh(n)
    x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    xs = dist.global_batch(mesh, x)
    np.testing.assert_array_equal(np.asarray(xs), x)
    assert dist.process_local_slice(n) == slice(0, n)  # 1 process owns all rows
