from .predictor import Predictor
from .validator import validate_coco

__all__ = ["Predictor", "validate_coco"]
