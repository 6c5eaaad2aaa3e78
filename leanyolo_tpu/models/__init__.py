from .registry import get_model, get_model_weights, list_models

__all__ = ["get_model", "get_model_weights", "list_models"]
