"""Regression tests for the DataLoader's producer/consumer OVERLAP.

The end-to-end pipeline rate (PERF.md round 4, input-pipeline roofline)
depends on the loader actually hiding host decode behind device compute:
a producer thread decodes batch N+1..N+prefetch while the consumer waits on
the device for batch N. These tests pin that property with sleep-based
stand-ins (sleeps release the GIL exactly like cv2 decode and device waits
do), so a refactor that silently serializes the pipeline fails loudly.

Reference counterpart: torch DataLoader(num_workers=2) in
reference tools/train.py:182-189 / tools/val.py:118-126.
"""

import time

import numpy as np

from leanyolo_tpu.data.dataset import DataLoader


class _SleepDataset:
    """Items cost `item_s` of GIL-released wall time (like JPEG decode)."""

    def __init__(self, n: int, item_s: float, size: int = 8):
        self.n = n
        self.item_s = item_s
        self.size = size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.item_s)
        img = np.zeros((self.size, self.size, 3), np.uint8)
        t = {
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int32),
            "image_id": i,
        }
        return img, t


def _drive(loader, consume_s: float) -> float:
    t0 = time.perf_counter()
    n = 0
    for _ in loader:
        time.sleep(consume_s)  # stand-in for the device step wait
        n += 1
    wall = time.perf_counter() - t0
    assert n == len(loader)
    return wall


def _best_of(measure, attempts: int = 3) -> float:
    """Min over a few attempts: wall-clock assertions on the single shared
    core can lose one attempt to an unrelated burst (another test's XLA
    compile); overlap is a property of the BEST run, so one clean attempt
    proves it while a real serialization regression fails all of them."""
    return min(measure() for _ in range(attempts))


def test_producer_hides_item_cost_behind_consumer():
    """With prefetch + intra-batch worker fan-out, the epoch wall must be far
    below the serial sum (here: 16 batches x (4 x 30 ms decode + 60 ms step)
    serial = ~2.9 s; overlapped with 4 workers the decode of a whole batch
    fits inside one consumer step, so wall ~= 16 x 60 ms + pipeline fill)."""
    item_s, consume_s, bs, n = 0.03, 0.06, 4, 64
    n_batches = n // bs
    serial = n_batches * (bs * item_s + consume_s)  # no fan-out, no overlap
    ideal = n_batches * consume_s  # decode fully hidden

    def measure():
        ds = _SleepDataset(n, item_s)
        loader = DataLoader(ds, batch_size=bs, shuffle=False, workers=4, prefetch=2, max_boxes=1)
        return _drive(loader, consume_s)

    wall = _best_of(measure)
    # Generous margin for a saturated 1-core CI host: demand we beat serial
    # by at least the decode time of half the batches.
    assert wall < serial - 0.5 * n_batches * bs * item_s, (wall, serial, ideal)


def test_first_batch_available_while_consumer_busy():
    """The producer must keep filling the queue while the consumer sleeps:
    after the consumer spends one long step on batch 0, batches 1..prefetch
    must arrive with ~zero additional wait."""
    item_s, bs = 0.02, 4

    def measure():
        ds = _SleepDataset(16, item_s)
        loader = DataLoader(ds, batch_size=bs, shuffle=False, workers=4, prefetch=3, max_boxes=1)
        it = iter(loader)
        next(it)  # pipeline fill
        time.sleep(0.5)  # consumer "computes"; producer prefetches 3 batches
        t0 = time.perf_counter()
        next(it)
        next(it)
        dt = time.perf_counter() - t0
        for _ in it:
            pass
        return dt

    # Two prefetched batches must be dequeue-only (<< 2 x batch decode time).
    dt = _best_of(measure)
    assert dt < 2 * bs * item_s * 0.5, dt


def test_early_break_does_not_hang():
    ds = _SleepDataset(64, 0.005)
    loader = DataLoader(ds, batch_size=4, shuffle=False, workers=2, prefetch=2, max_boxes=1)
    t0 = time.perf_counter()
    for i, _ in enumerate(loader):
        if i == 1:
            break
    assert time.perf_counter() - t0 < 5.0


class _DelayedHandle:
    """Device-array stand-in: materializing it (np.asarray) blocks until
    `ready_at`, like a d2h readback on an in-flight computation."""

    def __init__(self, arr, ready_at):
        self._arr = arr
        self._ready_at = ready_at

    def __array__(self, dtype=None, copy=None):
        dt = self._ready_at - time.perf_counter()
        if dt > 0:
            time.sleep(dt)
        return self._arr if dtype is None else self._arr.astype(dtype)


class _StubPredictor:
    """run_batch dispatches 'asynchronously': returns immediately with
    handles that become ready step_s later (like a dispatched XLA program)."""

    def __init__(self, step_s: float, max_det: int = 8):
        self.step_s = step_s
        self.max_det = max_det
        self.calls = 0

    def update_params(self, params):
        pass

    def run_batch(self, images):
        self.calls += 1
        b = int(images.shape[0])
        ready = time.perf_counter() + self.step_s
        dets = np.zeros((b, self.max_det, 6), np.float32)
        num = np.zeros((b,), np.int32)
        return _DelayedHandle(dets, ready), _DelayedHandle(num, ready)


def test_validation_conversion_overlaps_device_step(tmp_path, monkeypatch):
    """The round-5 host-tail fix (PERF.md input-pipeline roofline): the
    validation loop must run COCO-result conversion + incremental scoring
    of batch N while batch N+1 executes on device. With a conversion leg
    artificially inflated to ~the device step time, the wall must stay near
    n_batches x step (overlapped), far below n_batches x (step + convert)
    (the round-4 serial shape)."""
    import sys
    from pathlib import Path
    from types import SimpleNamespace

    sys.path.insert(0, str(Path(__file__).parent))
    from synth_coco import make_synth_coco

    import leanyolo_tpu.engine.validator as validator_mod

    n_images, bs, step_s, conv_s = 16, 2, 0.08, 0.07
    img_dir, ann_json = make_synth_coco(str(tmp_path), n_images=n_images, size=(32, 32))

    real_convert = validator_mod.detections_to_coco_arrays

    def slow_convert(*args, **kwargs):
        time.sleep(conv_s)  # stand-in for a heavyweight conversion leg
        return real_convert(*args, **kwargs)

    monkeypatch.setattr(validator_mod, "detections_to_coco_arrays", slow_convert)

    def measure():
        pred = _StubPredictor(step_s)
        t0 = time.perf_counter()
        stats = validator_mod.validate_coco(
            SimpleNamespace(params={}),
            images_dir=img_dir,
            ann_json=ann_json,
            imgsz=32,
            batch_size=bs,
            decode="topk",
            workers=2,
            predictor=pred,
        )
        wall = time.perf_counter() - t0
        assert stats["n_images"] == n_images
        assert pred.calls == n_images // bs
        return wall

    n_batches = n_images // bs
    serial = n_batches * (step_s + conv_s)
    wall = _best_of(measure)
    # Overlapped: ~n_batches*step + one trailing convert. Demand at least
    # half of the conversion legs hidden (generous for a saturated host).
    assert wall < serial - 0.5 * n_batches * conv_s, (wall, serial)
