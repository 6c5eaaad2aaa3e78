from .config import VARIANTS, VariantCfg
from .model import YOLOv10, model_apply, model_init

__all__ = ["VARIANTS", "VariantCfg", "YOLOv10", "model_apply", "model_init"]
