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


DCN_AXIS = "dcn"

SPACE_AXIS = "space"

MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, *, axis: str = DATA_AXIS, local: bool = False) -> Mesh:
    """1-D mesh over the first n devices (default: all).

    local=True restricts to THIS process's devices — in a multi-process
    runtime that yields a mesh whose programs run without cross-process
    collectives (e.g. per-host local DP inside sharded multi-host eval).
    """
    devices = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_hybrid_mesh(
    n_hosts: Optional[int] = None,
    *,
    dcn_axis: str = DCN_AXIS,
    ici_axis: str = DATA_AXIS,
) -> Mesh:
    """2-D (dcn, ici) mesh for multi-host data parallelism.

    Outer axis = host granules connected over DCN, inner axis = the chips of
    one host connected over ICI. The batch shards over BOTH axes (see
    batch_sharded); GSPMD then reduces gradients hierarchically — an ICI
    all-reduce per host ring plus one small cross-host DCN all-reduce —
    instead of a flat ring over the slow links.

    Multi-process (after distributed.init_distributed): device order groups
    each process's local chips contiguously, so reshaping to
    [num_processes, local] puts whole hosts on the outer axis. Single
    process: `n_hosts` slices the local devices into granules — a topology
    rehearsal for tests and dryruns.
    """
    devices = jax.devices()
    procs = jax.process_count()
    if n_hosts is None:
        n_hosts = procs if procs > 1 else 1
    if len(devices) % n_hosts:
        raise ValueError(f"{len(devices)} devices not divisible into {n_hosts} hosts")
    grid = np.asarray(devices).reshape(n_hosts, len(devices) // n_hosts)
    return Mesh(grid, (dcn_axis, ici_axis))


def _make_2d_mesh(n_data: int, n_second: int, second_axis: str) -> Mesh:
    devices = jax.devices()
    need = n_data * n_second
    if need > len(devices):
        raise ValueError(f"requested {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_second)
    return Mesh(grid, (DATA_AXIS, second_axis))


def make_sp_mesh(n_data: int, n_space: int) -> Mesh:
    """2-D (data, space) mesh for latency-oriented inference.

    DP alone cannot reduce the latency of ONE image; sharding the image's
    height across chips can. Activations live as NHWC with H split over the
    `space` axis — XLA GSPMD partitions every convolution spatially and
    inserts the halo exchanges (one row of overlap per k3 conv) over ICI
    automatically. Batch still shards over `data`, so a (data, space) mesh
    serves `n_data` concurrent streams at `n_space`-chip latency each.

    The reference (single-GPU, SURVEY.md §2.3) has no counterpart; this is
    mesh/GSPMD-native capability.
    """
    return _make_2d_mesh(n_data, n_space, SPACE_AXIS)


def make_tp_mesh(n_data: int, n_model: int) -> Mesh:
    """2-D (data, model) mesh for tensor (channel) parallelism.

    Conv kernels shard on their OUTPUT-channel dim over `model`
    (tp_shard_params): each chip holds and applies a slice of every layer's
    filters, so the large variants' weights and activations split across
    chips. GSPMD propagates the channel sharding layer to layer — a conv
    whose input channels are sharded contracts locally and psums over
    `model`; depthwise convs stay communication-free. Composes with `data`
    for batch sharding.
    """
    return _make_2d_mesh(n_data, n_model, MODEL_AXIS)


def tp_shard_params(mesh: Mesh, params: Any):
    """Place a parameter pytree with output-channel sharding over `model`.

    Rank-4 HWIO kernels with O divisible by the axis shard as
    P(None, None, None, 'model'); rank-1 per-channel vectors (BN
    scale/bias/mean/var, biases) with divisible C shard as P('model');
    everything else replicates. Returns (placed_params, sharding_pytree) —
    the sharding tree doubles as the jit in_shardings entry.
    """
    n = mesh.shape[MODEL_AXIS]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        if len(shape) == 4 and shape[-1] % n == 0 and shape[-1] >= n:
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        if len(shape) == 1 and shape[0] % n == 0 and shape[0] >= n:
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    shardings = jax.tree.map(leaf_sharding, params)
    # One pytree-level device_put batches all leaf transfers (hundreds of
    # per-leaf calls are slow over the tunneled host link).
    placed = jax.device_put(params, shardings)
    return placed, shardings


def data_axis_names(mesh: Mesh) -> tuple:
    """Mesh axes that carry the batch dimension (everything but `space` and
    `model`)."""
    return tuple(a for a in mesh.axis_names if a not in (SPACE_AXIS, MODEL_AXIS))


def image_sharded(mesh: Mesh) -> NamedSharding:
    """NHWC image batch: B over the data axes, H over `space` if present."""
    d = data_axis_names(mesh)
    space = SPACE_AXIS if SPACE_AXIS in mesh.axis_names else None
    return NamedSharding(mesh, P(d if d else None, space))


def rows_sharded(mesh: Mesh) -> NamedSharding:
    """Per-image row tensors (e.g. detections [B, k, 6]): B over the data
    axes, replicated over `space` — decode results are identical on every
    space shard."""
    d = data_axis_names(mesh)
    return NamedSharding(mesh, P(d if d else None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, *, axis: Optional[str] = None) -> NamedSharding:
    """Batch (dim 0) split over every mesh axis — 1-D data meshes and 2-D
    (dcn, ici) hybrid meshes shard identically from the caller's view."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names) if axis is None else axis))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Replicate a parameter pytree across the mesh."""
    s = replicated(mesh)
    return jax.device_put(params, s)


def shard_batch(mesh: Mesh, *arrays, axis: Optional[str] = None):
    """Split host arrays along dim 0 across the mesh (all axes by default,
    matching batch_sharded — a hybrid mesh must not end up with two
    different notions of 'batch-sharded').

    Batch size must be divisible by the mesh size (fixed-shape pipeline).
    """
    s = batch_sharded(mesh, axis=axis)
    out = tuple(jax.device_put(np.asarray(a), s) for a in arrays)
    return out if len(out) > 1 else out[0]
