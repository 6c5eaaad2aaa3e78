"""Device mesh + data-parallel sharding helpers.

The reference has no distributed support at all (SURVEY.md §2.3); this is a
new, first-class component of the TPU framework: single-host data
parallelism over the batch dimension of a `jax.sharding.Mesh`. Parameters
are replicated, batches are split on axis 0, and XLA inserts the psum for
gradient reduction over ICI automatically under jit (GSPMD).

For a ≤32M-parameter CNN, DP is the only parallelism dimension that pays —
TP/PP would shard tiny convolutions below MXU tile sizes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, *, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all local devices)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, *, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Replicate a parameter pytree across the mesh."""
    s = replicated(mesh)
    return jax.device_put(params, s)


def shard_batch(mesh: Mesh, *arrays, axis: str = DATA_AXIS):
    """Split host arrays along dim 0 across the mesh.

    Batch size must be divisible by the mesh size (fixed-shape pipeline).
    """
    s = batch_sharded(mesh, axis=axis)
    out = tuple(jax.device_put(np.asarray(a), s) for a in arrays)
    return out if len(out) > 1 else out[0]
