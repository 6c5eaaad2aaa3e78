"""Exact checkpoint-resume tests (extension beyond the save-only reference).

A resumed run must be bit-identical to an uninterrupted one: optimizer
moments and step counter restore from train_state.npz, the augmentation PRNG
stream is derived from the step counter, and the loader replays the shuffle
order via set_epoch.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def _make_batch(seed, b=2, nmax=4):
    from leanyolo_tpu.data.dataset import Batch

    rng = np.random.RandomState(seed)
    return Batch(
        rng.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32),
        rng.randint(0, 2, (b, nmax)).astype(np.int32),
        np.tile(np.asarray([4, 4, 30, 30], np.float32), (b, nmax, 1)),
        np.concatenate([np.ones((b, 1), bool), np.zeros((b, nmax - 1), bool)], axis=1),
        [None] * b,
    )


def _run_steps(trainer, start, stop):
    import jax

    base = jax.random.PRNGKey(0)
    for s in range(start, stop):
        batch = _make_batch(s % 3)  # deterministic batch sequence
        trainer.train_step(batch, jax.random.fold_in(base, trainer.global_step))


def test_resume_bit_identical(tmp_path):
    import jax

    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.registry import load_checkpoint_into, save_checkpoint
    from leanyolo_tpu.models.yolov10.model import YOLOv10
    from leanyolo_tpu.models.yolov10.remap import flatten_param_paths

    cfg = TrainConfig(epochs=2, steps_per_epoch=3, augment=True, grad_clip=1.0, lr=1e-3)

    # Uninterrupted: 6 steps.
    model_a = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    tr_a = Trainer(model_a, cfg)
    _run_steps(tr_a, 0, 6)

    # Interrupted at step 4, saved, restored into FRESH objects, continued.
    model_b = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=0)
    tr_b = Trainer(model_b, cfg)
    _run_steps(tr_b, 0, 4)
    save_checkpoint(model_b, str(tmp_path / "last.npz"))
    tr_b.save_train_state(str(tmp_path / "train_state.npz"))

    model_c = YOLOv10.create("yolov10n", class_names=["a", "b"], seed=123)  # different init
    tr_c = Trainer(model_c, cfg)
    load_checkpoint_into(model_c, str(tmp_path / "last.npz"))
    tr_c.load_train_state(str(tmp_path / "train_state.npz"))
    assert tr_c.global_step == 4
    _run_steps(tr_c, 4, 6)

    for (pa, la), (pc, lc) in zip(
        flatten_param_paths(model_a.params), flatten_param_paths(model_c.params)
    ):
        assert pa == pc
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lc), err_msg=str(pa))


def test_train_state_shape_mismatch_rejected(tmp_path):
    from leanyolo_tpu.engine.trainer import TrainConfig, Trainer
    from leanyolo_tpu.models.yolov10.model import YOLOv10

    cfg = TrainConfig(epochs=1, steps_per_epoch=1)
    tr_n = Trainer(YOLOv10.create("yolov10n", class_names=["a"], seed=0), cfg)
    tr_n.save_train_state(str(tmp_path / "state.npz"))
    tr_s = Trainer(YOLOv10.create("yolov10s", class_names=["a"], seed=0), cfg)
    with pytest.raises((ValueError, KeyError)):
        tr_s.load_train_state(str(tmp_path / "state.npz"))


def test_train_cli_resume_smoke(tmp_path, monkeypatch, capsys):
    """CLI: train 1 epoch, then --resume finishes epoch 2 of the same run."""
    from synth_coco import make_synth_coco

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=4, size=(64, 64))
    out = str(tmp_path / "run")
    import tools.train as train_cli

    base = [
        "train.py", "--model", "yolov10n", "--train-images", img_dir, "--train-ann", ann,
        "--imgsz", "64", "--batch-size", "2", "--max-boxes", "8",
        "--out-dir", out, "--workers", "2",
    ]
    argv = base + ["--epochs", "2"]
    # Produce last.npz/train_state.npz with a 1-epoch run, then resume the
    # 2-epoch config from it (smoke test of the CLI wiring; bit-exactness is
    # proven in test_resume_bit_identical).
    monkeypatch.setattr(sys, "argv", base + ["--epochs", "1"])
    train_cli.main()
    assert (tmp_path / "run" / "last.npz").exists()
    assert (tmp_path / "run" / "train_state.npz").exists()

    monkeypatch.setattr(sys, "argv", argv + ["--resume"])
    train_cli.main()
    cap = capsys.readouterr().out
    assert "resumed from" in cap
    assert (tmp_path / "run" / "epoch002.npz").exists()
