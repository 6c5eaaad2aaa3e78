"""COCO detection dataset + prefetching fixed-shape batch loader.

TPU-native counterpart of the reference data layer
(reference: leanyolo/data/coco_simple.py:26-102 + torch DataLoader usage in
tools/train.py:182-189). Differences by design:

- annotations are indexed ONCE at construction (the reference re-reads the
  full annotation JSON on every __getitem__, coco_simple.py:68-70 — a noted
  perf bug; fixed here);
- batches are fixed-shape: images [B, S, S, 3] uint8 NHWC plus padded
  targets (labels [B, Nmax], boxes [B, Nmax, 4], mask [B, Nmax]) so the
  jitted train step never recompiles;
- prefetching uses a thread pool feeding a bounded queue (host-side only;
  device transfer happens in the training loop via device_put/donation).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.letterbox import letterbox


class CocoDetection:
    """Minimal COCO-format detection dataset (host side, numpy out)."""

    def __init__(
        self,
        images_dir: str,
        ann_json: str,
        *,
        img_size: int = 640,
        max_images: Optional[int] = None,
        preprocess: str = "host",
    ) -> None:
        if preprocess not in ("host", "device"):
            raise ValueError(f"preprocess must be 'host' or 'device', got {preprocess!r}")
        self.images_dir = images_dir
        self.img_size = int(img_size)
        #: 'host': __getitem__ letterboxes on CPU (reference-exact pixels).
        #: 'device': __getitem__ returns the RAW image with boxes in ORIGINAL
        #: pixel coordinates; the loader pastes onto a fixed canvas and the
        #: train step warps + transforms boxes inside the compiled program
        #: (boxes transform affinely: x' = x*gain + pad).
        self.preprocess = preprocess
        with open(ann_json, "r", encoding="utf-8") as f:
            ann = json.load(f)

        self.images = sorted(ann.get("images", []), key=lambda im: im["id"])
        if max_images:
            self.images = self.images[: int(max_images)]
        keep_ids = {im["id"] for im in self.images}

        # Category ids -> contiguous indices by sorted id (reference
        # coco_simple.py:47-54 uses the same convention).
        self.cat_ids = sorted(c["id"] for c in ann.get("categories", []))
        self.cat_id_to_idx = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.class_names = [c["name"] for c in sorted(ann.get("categories", []), key=lambda c: c["id"])]

        self.anns_by_image: Dict[int, List[dict]] = {im["id"]: [] for im in self.images}
        for a in ann.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            if a["image_id"] in keep_ids:
                self.anns_by_image[a["image_id"]].append(a)

        self.canvas_size: Optional[int] = None
        if preprocess == "device":
            from ..ops.letterbox import dataset_canvas_size

            # Computed at CONSTRUCTION, before any multi-host sharding trims
            # self.images: every process must use the same canvas bucket or
            # the distributed train steps compile different programs and the
            # collectives deadlock.
            self.canvas_size = dataset_canvas_size(self.images, self.img_size)

    def __len__(self) -> int:
        return len(self.images)

    def load_image(self, idx: int) -> np.ndarray:
        import cv2

        info = self.images[idx]
        path = os.path.join(self.images_dir, info["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """Returns (letterboxed HWC uint8 image, target dict in letterbox space).

        uint8 end-to-end: decoded pixels are integers, so staying in uint8
        costs nothing in precision (integers <= 255 are exact in bf16 after
        the on-device cast) and moves 4x fewer bytes host->device than the
        float32 batches the reference pipeline ships.
        """
        img = self.load_image(idx)
        if self.preprocess == "device":
            return self._getitem_raw(img, idx)
        lb, (gw, gh), (px, py) = letterbox(img, self.img_size)
        info = self.images[idx]
        anns = self.anns_by_image.get(info["id"], [])
        boxes, labels = [], []
        for a in anns:
            x, y, w, h = a["bbox"]  # COCO xywh in original pixels
            x1 = x * gw + px
            y1 = y * gh + py
            x2 = (x + w) * gw + px
            y2 = (y + h) * gh + py
            boxes.append([x1, y1, x2, y2])
            labels.append(self.cat_id_to_idx[a["category_id"]])
        target = {
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32).reshape(-1),
            "image_id": info["id"],
            "orig_hw": (info.get("height"), info.get("width")),
            "gain": (gw, gh),
            "pad": (px, py),
        }
        return np.ascontiguousarray(lb, dtype=np.uint8), target

    def _getitem_raw(self, img: np.ndarray, idx: int) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """Device-preprocess item: raw pixels + boxes in ORIGINAL coordinates.

        The letterbox geometry is computed here (host float math, same
        letterbox_params the predictor's device path uses) but APPLIED on
        device: the train step warps the canvas and maps boxes affinely.
        """
        from ..ops.letterbox import letterbox_params

        info = self.images[idx]
        h, w = int(img.shape[0]), int(img.shape[1])
        (gw, gh), (px, py), (nh, nw) = letterbox_params((h, w), self.img_size)
        anns = self.anns_by_image.get(info["id"], [])
        boxes, labels = [], []
        for a in anns:
            x, y, bw, bh = a["bbox"]  # COCO xywh in original pixels
            boxes.append([x, y, x + bw, y + bh])
            labels.append(self.cat_id_to_idx[a["category_id"]])
        target = {
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32).reshape(-1),
            "image_id": info["id"],
            "orig_hw": (h, w),
            "gain": (gw, gh),
            "pad": (px, py),
            "new_hw": (nh, nw),
        }
        return np.ascontiguousarray(img[..., :3], dtype=np.uint8), target


class Batch:
    """Fixed-shape host batch ready for device_put."""

    __slots__ = ("images", "gt_labels", "gt_boxes", "gt_mask", "meta")

    def __init__(self, images, gt_labels, gt_boxes, gt_mask, meta):
        self.images = images
        self.gt_labels = gt_labels
        self.gt_boxes = gt_boxes
        self.gt_mask = gt_mask
        self.meta = meta


class DeviceBatch:
    """Fixed-shape host batch for DEVICE-side letterboxing: raw pixels on a
    fixed canvas + per-image geometry arrays + boxes in original coords.
    The train step warps the canvas and maps boxes inside the compiled
    program (Trainer with TrainConfig.device_preprocess=True)."""

    __slots__ = ("canvas", "new_hw", "pads", "hw", "gainpad",
                 "gt_labels", "gt_boxes", "gt_mask", "meta")

    def __init__(self, canvas, new_hw, pads, hw, gainpad, gt_labels, gt_boxes, gt_mask, meta):
        self.canvas = canvas
        self.new_hw = new_hw
        self.pads = pads
        self.hw = hw
        self.gainpad = gainpad  # [B, 4] f32 (gain_w, gain_h, pad_left, pad_top)
        self.gt_labels = gt_labels
        self.gt_boxes = gt_boxes  # ORIGINAL pixel coords; device maps to letterbox space
        self.gt_mask = gt_mask
        self.meta = meta


def collate_device(items: Sequence[Tuple[np.ndarray, dict]], max_boxes: int, canvas_size: int) -> DeviceBatch:
    """Paste raw images onto the fixed canvas (pure memcpy) + pad targets."""
    b = len(items)
    canvas = np.zeros((b, canvas_size, canvas_size, 3), np.uint8)
    new_hw = np.zeros((b, 2), np.int32)
    pads = np.zeros((b, 2), np.int32)
    hw = np.zeros((b, 2), np.int32)
    gainpad = np.zeros((b, 4), np.float32)
    gl = np.zeros((b, max_boxes), np.int32)
    gb = np.zeros((b, max_boxes, 4), np.float32)
    gm = np.zeros((b, max_boxes), bool)
    meta = []
    for i, (img, t) in enumerate(items):
        h, w = int(img.shape[0]), int(img.shape[1])
        if h > canvas_size or w > canvas_size:
            raise ValueError(f"image {h}x{w} exceeds canvas {canvas_size}")
        canvas[i, :h, :w] = img
        new_hw[i] = t["new_hw"]
        pads[i] = t["pad"]
        hw[i] = (h, w)
        gainpad[i] = (*t["gain"], *t["pad"])
        n = min(len(t["labels"]), max_boxes)
        if n:
            gl[i, :n] = t["labels"][:n]
            gb[i, :n] = t["boxes"][:n]
            gm[i, :n] = True
        meta.append(t)
    return DeviceBatch(canvas, new_hw, pads, hw, gainpad, gl, gb, gm, meta)


def collate(items: Sequence[Tuple[np.ndarray, dict]], max_boxes: int) -> Batch:
    imgs = np.stack([it[0] for it in items])  # [B, S, S, 3]
    b = len(items)
    gl = np.zeros((b, max_boxes), np.int32)
    gb = np.zeros((b, max_boxes, 4), np.float32)
    gm = np.zeros((b, max_boxes), bool)
    meta = []
    for i, (_, t) in enumerate(items):
        n = min(len(t["labels"]), max_boxes)
        if n:
            gl[i, :n] = t["labels"][:n]
            gb[i, :n] = t["boxes"][:n]
            gm[i, :n] = True
        meta.append(t)
    return Batch(imgs, gl, gb, gm, meta)


class DataLoader:
    """Threaded prefetching loader producing fixed-shape batches.

    Pads the final partial batch by repeating item 0 with an all-False GT
    mask flagging padding images in `meta` (entry is None), so shapes are
    constant across the epoch.
    """

    def __init__(
        self,
        dataset: CocoDetection,
        *,
        batch_size: int = 16,
        shuffle: bool = False,
        max_boxes: int = 128,
        workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = False,
    ) -> None:
        self.ds = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.max_boxes = int(max_boxes)
        self.workers = max(1, int(workers))
        self.prefetch = max(1, int(prefetch))
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0
        # One canvas bucket for the whole dataset -> one compiled train step
        # per epoch regardless of raw image sizes (set by CocoDetection at
        # construction when preprocess='device').
        self.canvas_size = getattr(dataset, "canvas_size", None)
        if getattr(dataset, "preprocess", "host") == "device" and self.canvas_size is None:
            from ..ops.letterbox import dataset_canvas_size

            self.canvas_size = dataset_canvas_size(dataset.images, dataset.img_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (resume support: a fresh loader replays the
        exact shuffle order of epoch N)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        batches: List[List[int]] = []
        for s in range(0, len(order), self.batch_size):
            chunk = order[s : s + self.batch_size].tolist()
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that keeps polling the stop flag: an abandoned
            consumer (early break, exception in the train loop) would
            otherwise leave this thread parked forever on a full queue,
            leaking the pool and the decoded batches it holds."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # Any decode error (missing/corrupt file) is shipped to the
            # consumer and re-raised there: a silently dead producer would
            # leave the training loop blocked on q.get() forever.
            try:
                with ThreadPoolExecutor(max_workers=self.workers) as pool:
                    for chunk in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.ds.__getitem__, chunk))
                        n_pad = self.batch_size - len(items)
                        if n_pad > 0:
                            pad_img = items[0][0]
                            # Repeat item 0 (incl. its geometry in device
                            # mode — the warp must stay in-bounds) with an
                            # empty, all-masked target.
                            empty = {
                                **items[0][1],
                                "boxes": np.zeros((0, 4), np.float32),
                                "labels": np.zeros((0,), np.int32),
                                "image_id": -1,
                            }
                            items += [(pad_img, empty)] * n_pad
                        if self.canvas_size is not None:
                            batch = collate_device(items, self.max_boxes, self.canvas_size)
                        else:
                            batch = collate(items, self.max_boxes)
                        for j in range(self.batch_size - n_pad, self.batch_size):
                            batch.meta[j] = None
                        if not put_or_stop(batch):
                            return
                put_or_stop(None)
            except BaseException as e:  # noqa: BLE001 — relayed, not swallowed
                put_or_stop(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
