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
