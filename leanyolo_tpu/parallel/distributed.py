"""Multi-host (DCN) runtime initialization and global-batch construction.

The reference is single-process (SURVEY.md §2.3: no distributed support);
this module is the TPU-native scale-out path: `jax.distributed` couples the
processes of a pod slice / multi-host fleet, `make_hybrid_mesh` lays DP over
(dcn, ici) axes, and `global_batch` assembles jax.Arrays whose shards live
on each host's local chips — the single-controller-per-host SPMD model, with
XLA inserting hierarchical collectives (ICI ring per host + one DCN
all-reduce) under jit.

Nothing here imports at module scope beyond jax/numpy: a single-host run
never pays for it and every entry point degrades to the local path.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from .mesh import batch_sharded

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    local_device_ids=None,
) -> int:
    """Join (or start) a multi-process JAX runtime; returns process_count.

    Explicit args win; otherwise LEANYOLO_COORDINATOR / LEANYOLO_NUM_PROCS /
    LEANYOLO_PROC_ID env vars; otherwise `jax.distributed.initialize()`'s
    own auto-detection (TPU pod metadata, SLURM, ...). Idempotent: a second
    call is a no-op, so library code can call it defensively.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count()

    coordinator_address = coordinator_address or os.environ.get("LEANYOLO_COORDINATOR")
    if num_processes is None and "LEANYOLO_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["LEANYOLO_NUM_PROCS"])
    if process_id is None and "LEANYOLO_PROC_ID" in os.environ:
        process_id = int(os.environ["LEANYOLO_PROC_ID"])

    if coordinator_address is None and num_processes is None:
        # Single-host run with no coordinator configured: nothing to join.
        # (Touching jax.process_count() is safe here — with no coordinator
        # there is no initialize() ordering hazard.)
        _INITIALIZED = True
        return jax.process_count()

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # someone initialized the runtime directly
        if "already" not in str(e).lower():
            raise
    _INITIALIZED = True
    return jax.process_count()


def global_batch(mesh, *arrays: Any):
    """Build batch-sharded jax.Arrays from per-process host shards.

    Each process passes its LOCAL slice of the global batch (the data loader
    shards files per host); the returned arrays are global: dim 0 is the
    global batch, with this process's rows resident on its own chips. On a
    single process this degrades to a plain sharded device_put.
    """
    s = batch_sharded(mesh)
    if jax.process_count() == 1:
        out = tuple(jax.device_put(np.asarray(a), s) for a in arrays)
    else:
        out = tuple(
            jax.make_array_from_process_local_data(s, np.asarray(a)) for a in arrays
        )
    return out if len(out) > 1 else out[0]


def process_local_slice(n_global: int) -> slice:
    """Row range of the global batch owned by this process (even split)."""
    procs, pid = jax.process_count(), jax.process_index()
    if n_global % procs:
        raise ValueError(f"global batch {n_global} not divisible by {procs} processes")
    per = n_global // procs
    return slice(pid * per, (pid + 1) * per)


def cli_distributed_setup(coordinator_address=None, num_processes=None, process_id=None):
    """CLI entry helper: join the fleet (must run before any other jax use)
    and return (process_count, process_index).

    Runs one trivial cross-process barrier immediately: the collective
    transport (Gloo on CPU, ICI/DCN cliques on TPU) rendezvouses while the
    processes are still in lock-step, instead of at the first REAL collective
    — which can sit minutes of skewed compile time later and trip the
    transport's ~30 s connect window.
    """
    n = init_distributed(coordinator_address, num_processes, process_id)
    if n > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("leanyolo:cli_distributed_setup")
    return n, jax.process_index()


def warmup_collectives(mesh) -> None:
    """Establish the mesh's collective clique with a trivial psum.

    The transport context (Gloo on CPU) for a device clique rendezvouses at
    the FIRST execution that needs it, with a ~30 s connect window. The first
    real execution sits behind the full train-step compile — minutes of
    single-core skew between processes — so the rendezvous can expire before
    the peer arrives. This sub-second program creates the same all-devices
    clique while the processes are still in lock-step; later executables
    reuse the established context. No-op on a single process.
    """
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp

    from .mesh import replicated

    x = global_batch(mesh, np.zeros((mesh.devices.size, 1), np.float32))
    jax.jit(jnp.sum, out_shardings=replicated(mesh))(x).block_until_ready()


def shard_image_list(images: list, pid: int, nprocs: int) -> list:
    """Disjoint per-process shard of a dataset image list, trimmed so every
    process sees the same number of items (unequal epoch lengths would
    deadlock the collectives at the epoch tail)."""
    n_even = len(images) // nprocs * nprocs
    if n_even == 0:
        raise ValueError(f"{len(images)} images cannot feed {nprocs} processes")
    return images[:n_even][pid::nprocs]


def allgather_obj(obj):
    """Exchange one JSON-serializable object per process; every process
    returns the full list [obj_proc0, obj_proc1, ...].

    Rides the jax runtime (no shared-filesystem assumption): the object is
    serialized to a uint8 buffer, lengths are allgathered first so buffers
    can pad to a common shape, then the payloads allgather in one shot.
    Used to merge per-process detection results for multi-host validation.
    """
    if jax.process_count() == 1:
        return [obj]
    import json as _json

    from jax.experimental import multihost_utils

    payload = np.frombuffer(_json.dumps(obj).encode("utf-8"), np.uint8)
    lens = multihost_utils.process_allgather(np.asarray(payload.size, np.int64))
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[: payload.size] = payload
    bufs = np.asarray(multihost_utils.process_allgather(buf))
    return [
        _json.loads(bytes(bufs[i, : int(lens[i])]).decode("utf-8"))
        for i in range(int(lens.shape[0]))
    ]


def add_distributed_args(parser, *, batch_semantics: str) -> None:
    """The shared --distributed/--coordinator/--num-processes/--process-id
    CLI flags (kept in one place so the three tools cannot drift).

    batch_semantics: one line describing what --batch-size means under
    distribution for this tool (global for trainers, per-process for val).
    """
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host mode: join a jax.distributed fleet; the image list "
        f"shards per process; {batch_semantics}; eval/checkpoints/CSV/logs "
        "come from process 0",
    )
    parser.add_argument("--coordinator", default=None, help="host:port of process 0 (or LEANYOLO_COORDINATOR)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)


def proc0_local_eval(model, predictor, *, imgsz: int, decode: str = "topk", conf_thresh: float = 0.001):
    """Process-0 eval staging for distributed training loops.

    Replicated global params are fully addressable on every process, so a
    host copy gives process 0 a purely LOCAL predictor (no collectives for
    the other processes to deadlock on). The predictor compiles once; later
    epochs only swap its staged params (run_batch reads model.params per
    call). Returns (eval_model, predictor) — pass the previous predictor
    back in on the next epoch.
    """
    from ..engine.predictor import Predictor
    from ..models.yolov10.model import YOLOv10

    host_params = jax.tree.map(lambda x: np.asarray(x), model.params)
    if predictor is None:
        eval_model = YOLOv10(model.cfg, model.class_names, host_params)
        predictor = Predictor(eval_model, imgsz=imgsz, decode=decode, conf_thresh=conf_thresh, donate=False)
    else:
        # Advance BOTH the staged copy and the private eval model's params:
        # validate_coco re-stages from eval_model.params when handed an
        # existing predictor, so a stale eval_model would win otherwise.
        predictor.model.params = host_params
        predictor.update_params(host_params)
    return predictor.model, predictor
