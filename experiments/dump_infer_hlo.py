"""Dump the OPTIMIZED HLO of the serving program profile_step.py profiles
(Predictor fuse=True dtype=bf16, exact topk decode), so the FLOP-aware
roofline (roofline_flops.py) can bound the inference step the same way it
bounded the train step.

Usage: python experiments/dump_infer_hlo.py [out.txt] [variant] [batch_size] [imgsz]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax.numpy as jnp
import numpy as np

from leanyolo_tpu import get_model
from leanyolo_tpu.engine.predictor import Predictor

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/infer_hlo.txt"
variant = sys.argv[2] if len(sys.argv) > 2 else "yolov10s"
bs = int(sys.argv[3]) if len(sys.argv) > 3 else 128
imgsz = int(sys.argv[4]) if len(sys.argv) > 4 else 640

model = get_model(variant, weights=None, class_names=[f"c{i}" for i in range(80)])
pred = Predictor(model, imgsz=imgsz, decode="topk", dtype="bf16", donate=False, fuse=True)

x = jnp.asarray(np.random.RandomState(0).randint(0, 256, (bs, imgsz, imgsz, 3)).astype(np.uint8))
compiled = pred._fn.lower(pred.params, x).compile()
txt = compiled.as_text()
Path(out).write_text(txt)
print(f"wrote {out}: {len(txt.splitlines())} lines")
