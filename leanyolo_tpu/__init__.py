"""leanyolo_tpu — a TPU-native (JAX/XLA/Pallas) YOLOv10 framework.

Re-implements the capabilities of the `leanyolo` reference (pure-PyTorch
YOLOv10: registry, official-weight loading, NMS-free top-k + NMS decode,
COCO validation, training/transfer-learning, fixed-shape serving export)
as an idiomatic JAX framework:

- NHWC everywhere, bf16 compute with fp32 accumulation on the MXU
- functional models over explicit parameter pytrees (jit/vmap/pjit-friendly)
- fixed-shape, fully jitted decode paths (top-k and masked class-wise NMS)
- single-host data parallelism over a `jax.sharding.Mesh`

Public API mirrors the reference (reference: leanyolo/__init__.py:1-7):
    get_model, list_models, get_model_weights
"""

from .models.registry import get_model, get_model_weights, list_models
from .version import __version__

__all__ = ["get_model", "get_model_weights", "list_models", "__version__"]
