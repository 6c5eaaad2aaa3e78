"""Synthetic tiny COCO dataset builder for end-to-end tests.

Mirrors the reference test fixtures (reference: leanyolo/tests/
test_eval_synthetic.py:11-41): small solid-color images + a minimal COCO
JSON, enough to drive the full val/train pipelines without network.
"""

from __future__ import annotations

import json
import os

import numpy as np


def make_synth_coco(root, *, n_images=4, size=(96, 128), n_classes=3, boxes_per_image=2, seed=0):
    """Create images/ and annotations.json under root; returns (img_dir, ann_path)."""
    import cv2

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    h, w = size

    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        img = np.full((h, w, 3), 64 + 10 * i, np.uint8)
        for j in range(boxes_per_image):
            x = int(rng.uniform(0, w * 0.6))
            y = int(rng.uniform(0, h * 0.6))
            bw = int(rng.uniform(10, w * 0.3))
            bh = int(rng.uniform(10, h * 0.3))
            color = tuple(int(c) for c in rng.randint(0, 255, 3))
            cv2.rectangle(img, (x, y), (min(x + bw, w - 1), min(y + bh, h - 1)), color, -1)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": (j % n_classes) + 1,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": k + 1, "name": f"class{k}"} for k in range(n_classes)],
    }
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump(ann, f)
    return img_dir, ann_path


def make_learnable_coco(root, *, n_images=240, size=(160, 160), seed=0):
    """Synthetic dataset where class IS predictable from appearance:
    class0 = red rectangle, class1 = green circle, class2 = blue triangle,
    on noise backgrounds. Used by the convergence demo (SQA QT-001) to prove
    the training stack LEARNS (the reference proves this on Aquarium,
    reference todo.md:4 — not reachable offline)."""
    import cv2

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    h, w = size

    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        img = rng.randint(90, 130, (h, w, 3)).astype(np.uint8)  # gray noise bg
        for _ in range(int(rng.randint(1, 4))):
            cls = int(rng.randint(0, 3))
            s = int(rng.uniform(0.18, 0.4) * min(h, w))
            x = int(rng.uniform(0, w - s - 1))
            y = int(rng.uniform(0, h - s - 1))
            jit = rng.randint(-25, 26, 3)
            base = {0: (40, 40, 200), 1: (40, 200, 40), 2: (200, 40, 40)}[cls]  # BGR-ish in RGB order is fine: it's consistent
            color = tuple(int(np.clip(c + j, 0, 255)) for c, j in zip(base, jit))
            if cls == 0:
                cv2.rectangle(img, (x, y), (x + s, y + s), color, -1)
            elif cls == 1:
                cv2.circle(img, (x + s // 2, y + s // 2), s // 2, color, -1)
            else:
                pts = np.asarray([[x + s // 2, y], [x, y + s], [x + s, y + s]], np.int32)
                cv2.fillPoly(img, [pts], color)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": cls + 1,
                    "bbox": [float(x), float(y), float(s + 1), float(s + 1)],
                    "area": float((s + 1) * (s + 1)),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": k + 1, "name": n} for k, n in enumerate(("rect", "circle", "triangle"))],
    }
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump(ann, f)
    return img_dir, ann_path


def _draw_shape(img, shape, x, y, s, color):
    import cv2

    if shape == "rect":
        cv2.rectangle(img, (x, y), (x + s, y + s), color, -1)
    elif shape == "circle":
        cv2.circle(img, (x + s // 2, y + s // 2), s // 2, color, -1)
    elif shape == "triangle":
        pts = np.asarray([[x + s // 2, y], [x, y + s], [x + s, y + s]], np.int32)
        cv2.fillPoly(img, [pts], color)
    elif shape == "ellipse":
        cv2.ellipse(img, (x + s // 2, y + s // 2), (s // 2, s // 3), 0, 0, 360, color, -1)
    elif shape == "plus":
        t = max(2, s // 3)
        cv2.rectangle(img, (x + (s - t) // 2, y), (x + (s + t) // 2, y + s), color, -1)
        cv2.rectangle(img, (x, y + (s - t) // 2), (x + s, y + (s + t) // 2), color, -1)
    elif shape == "ring":
        cv2.circle(img, (x + s // 2, y + s // 2), s // 2, color, max(2, s // 5))
    else:
        raise ValueError(shape)


def _make_shape_coco(root, specs, *, n_images, size, seed, min_obj, max_obj, noise_lo, noise_hi, smin, smax):
    """Shared generator: `specs` = [(class_name, shape, base RGB color), ...]."""
    import cv2

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    h, w = size

    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        img = rng.randint(noise_lo, noise_hi, (h, w, 3)).astype(np.uint8)
        for _ in range(int(rng.randint(min_obj, max_obj + 1))):
            cls = int(rng.randint(0, len(specs)))
            _, shape, base = specs[cls]
            s = int(rng.uniform(smin, smax) * min(h, w))
            x = int(rng.uniform(0, w - s - 1))
            y = int(rng.uniform(0, h - s - 1))
            jit = rng.randint(-25, 26, 3)
            color = tuple(int(np.clip(c + j, 0, 255)) for c, j in zip(base, jit))
            _draw_shape(img, shape, x, y, s, color)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": cls + 1,
                    "bbox": [float(x), float(y), float(s + 1), float(s + 1)],
                    "area": float((s + 1) * (s + 1)),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, name), img)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": k + 1, "name": spec[0]} for k, spec in enumerate(specs)],
    }
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump(ann, f)
    return img_dir, ann_path


# QT-002 transfer tier distributions (offline analog of the reference's
# COCO->Aquarium transfer demonstration, reference todo.md:4,
# tools/transfer_learn_aquarium.py:487-491):
#
# A (pretrain): 6 classes, 2-5 objects/image, heavier background noise —
# "more classes / more clutter". B (target): the 3 familiar shapes in NEW
# colors, few images — pretrainable low-level features (shape/edge
# detectors) transfer; the colors and the head do not.

PRETRAIN_SPECS = [
    ("rect", "rect", (40, 40, 200)),
    ("circle", "circle", (40, 200, 40)),
    ("triangle", "triangle", (200, 40, 40)),
    ("ellipse", "ellipse", (200, 200, 40)),
    ("plus", "plus", (200, 40, 200)),
    ("ring", "ring", (40, 200, 200)),
]

TRANSFER_SPECS = [
    ("rect", "rect", (230, 140, 20)),  # orange
    ("circle", "circle", (20, 180, 230)),  # cyan-ish
    ("triangle", "triangle", (150, 60, 230)),  # violet
]


def make_pretrain_coco(root, *, n_images=240, size=(160, 160), seed=0):
    return _make_shape_coco(
        root, PRETRAIN_SPECS, n_images=n_images, size=size, seed=seed,
        min_obj=2, max_obj=5, noise_lo=70, noise_hi=150, smin=0.14, smax=0.38,
    )


def make_transfer_coco(root, *, n_images=24, size=(160, 160), seed=0):
    return _make_shape_coco(
        root, TRANSFER_SPECS, n_images=n_images, size=size, seed=seed,
        min_obj=1, max_obj=3, noise_lo=90, noise_hi=130, smin=0.18, smax=0.4,
    )


def make_synth_aquarium_tree(root, *, seed=0):
    """Create a raw Kaggle-Aquarium-style extracted tree for prepare_aquarium:
    nested split dirs each holding `_annotations.coco.json` plus images whose
    `file_name` entries carry subdirectory prefixes (so the tool must rewrite
    them to basenames and resolve files by search)."""
    import cv2

    rng = np.random.RandomState(seed)
    for split in ("train", "valid"):
        split_dir = os.path.join(root, "Aquarium Combined", split)
        sub = os.path.join(split_dir, "imgs")
        os.makedirs(sub, exist_ok=True)
        images, annotations = [], []
        for i in range(3):
            name = f"{split}_{i}.jpg"
            cv2.imwrite(os.path.join(sub, name), np.full((64, 80, 3), 100 + 5 * i, np.uint8))
            images.append({"id": i + 1, "file_name": f"imgs/{name}", "width": 80, "height": 64})
            annotations.append(
                {
                    "id": i + 1,
                    "image_id": i + 1,
                    "category_id": 1 + (i % 2),
                    "bbox": [4.0, 4.0, 20.0, 16.0],
                    "area": 320.0,
                    "iscrowd": 0,
                }
            )
        ann = {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "fish"}, {"id": 2, "name": "ray"}],
        }
        with open(os.path.join(split_dir, "_annotations.coco.json"), "w", encoding="utf-8") as f:
            json.dump(ann, f)
    return root
