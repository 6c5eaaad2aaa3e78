"""COCO dataset helpers: class names and val2017 acquisition.

Parity with reference: leanyolo/data/coco.py:15-89.
"""

from __future__ import annotations

import os
import zipfile
from typing import List
from urllib.request import urlretrieve

COCO_VAL_IMAGES_URL = "http://images.cocodataset.org/zips/val2017.zip"
COCO_ANN_URL = "http://images.cocodataset.org/annotations/annotations_trainval2017.zip"


def coco80_class_names() -> List[str]:
    """The canonical 80-class COCO name order (reference coco.py:74-89)."""
    return [
        "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train", "truck", "boat",
        "traffic light", "fire hydrant", "stop sign", "parking meter", "bench", "bird", "cat",
        "dog", "horse", "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
        "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball",
        "kite", "baseball bat", "baseball glove", "skateboard", "surfboard", "tennis racket",
        "bottle", "wine glass", "cup", "fork", "knife", "spoon", "bowl", "banana", "apple",
        "sandwich", "orange", "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
        "couch", "potted plant", "bed", "dining table", "toilet", "tv", "laptop", "mouse",
        "remote", "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
        "refrigerator", "book", "clock", "vase", "scissors", "teddy bear", "hair drier",
        "toothbrush",
    ]


def ensure_coco_val(root: str) -> tuple:
    """Download + extract COCO val2017 images and annotations if missing.

    Returns (images_dir, ann_json_path). Mirrors reference coco.py:15-61.
    """
    os.makedirs(root, exist_ok=True)
    images_dir = os.path.join(root, "val2017")
    ann_json = os.path.join(root, "annotations", "instances_val2017.json")

    if not os.path.isdir(images_dir):
        zip_path = os.path.join(root, "val2017.zip")
        if not os.path.exists(zip_path):
            urlretrieve(COCO_VAL_IMAGES_URL, zip_path)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(root)

    if not os.path.exists(ann_json):
        zip_path = os.path.join(root, "annotations_trainval2017.zip")
        if not os.path.exists(zip_path):
            urlretrieve(COCO_ANN_URL, zip_path)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(root)

    return images_dir, ann_json
