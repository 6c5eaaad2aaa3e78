import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from leanyolo_tpu.engine.predictor import Predictor
from leanyolo_tpu.engine.validator import measure_fps
from leanyolo_tpu.models.yolov10.model import YOLOv10

model = YOLOv10.create("yolov10s", class_names=[f"c{i}" for i in range(80)])
pred = Predictor(model, imgsz=640, decode="topk", dtype="bf16", fuse=True, donate=False)
fps = measure_fps(pred, batch_size=128, iters=16)
print(f"measure_fps bs128: {fps:.1f} img/s (bench.py headline: ~3200)")
