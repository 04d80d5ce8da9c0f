from . import mask_gru, params_io
from .registry import get_model, MODEL_REGISTRY

__all__ = ["mask_gru", "params_io", "get_model", "MODEL_REGISTRY"]
