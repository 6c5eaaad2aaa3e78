"""Dump the OPTIMIZED HLO of the exact train-step program profile_step.py
profiles (yolov10s bs128 640 bf16, augment, grad-clip, max_boxes 32), so
profile op names (fusion.NNNN) can be mapped to shapes/layers.

Usage: python experiments/dump_train_hlo.py [out.txt] [variant] [batch_size]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import numpy as np

from leanyolo_tpu import get_model
from leanyolo_tpu.engine.trainer import Trainer, TrainConfig

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_hlo.txt"
variant = sys.argv[2] if len(sys.argv) > 2 else "yolov10s"
bs = int(sys.argv[3]) if len(sys.argv) > 3 else 128

model = get_model(variant, weights=None, class_names=[f"c{i}" for i in range(80)])
cfg = TrainConfig(epochs=1, steps_per_epoch=1, augment=True, grad_clip=1.0, bf16=True)
trainer = Trainer(model, cfg)

b, n, imgsz = bs, 32, 640
rng = np.random.RandomState(0)
images = rng.randint(0, 256, (b, imgsz, imgsz, 3)).astype(np.uint8)
gt_labels = rng.randint(0, 80, (b, n)).astype(np.int32)
gt_boxes = np.tile(np.asarray([4.0, 4.0, imgsz / 2, imgsz / 2], np.float32), (b, n, 1))
gt_mask = np.ones((b, n), bool)
key = jax.random.PRNGKey(0)

step = trainer._get_step(False)
lowered = step.lower(model.params, trainer.opt_state, images, gt_labels, gt_boxes, gt_mask, key)
compiled = lowered.compile()
txt = compiled.as_text()
Path(out).write_text(txt)
print(f"wrote {out}: {len(txt.splitlines())} lines")
