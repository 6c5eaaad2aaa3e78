"""True multi-process (DCN-path) validation: two separate Python processes
join via leanyolo_tpu.parallel.distributed, build a (dcn, ici) hybrid mesh
over 2 procs x 2 virtual CPU devices, assemble a global batch from per-host
shards, and run one jitted cross-process reduction (Gloo collectives).

The reference has no distributed support at all; this exercises the exact
plumbing a multi-host TPU pod run uses (jax.distributed + global jax.Arrays
+ GSPMD collectives), with CPU standing in for the chips. Skips when the
environment forbids binding a localhost port.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# Environment-capacity failures, not product bugs: a sandbox refusing the
# localhost coordinator socket, or the transport's ~30 s rendezvous expiring
# while the single CPU core is saturated by concurrent XLA compiles (seen
# when the SQA runner executes this file inside the full pytest tier). The
# patterns are deliberately INIT-PHASE messages only — a real collective
# mismatch raises a different error (program/shape diagnostics) and must
# FAIL, not skip. (A true deadlock that hangs to the subprocess timeout is
# indistinguishable from a cold-compile stall here and still skips; the
# single-process hybrid-mesh equality tests in test_parallel.py cover
# program-mismatch regressions deterministically.)
_ENV_SKIP_PATTERNS = (
    "Connection refused",
    "failed to connect",
    "Gloo context initialization failed",
    "GetKeyValue() timed out",
)


def _env_flake(outs) -> bool:
    return any(any(p in e for p in _ENV_SKIP_PATTERNS) for _, e in outs)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon plugin ignores env vars
    import jax.numpy as jnp
    from leanyolo_tpu.parallel import distributed as dist
    from leanyolo_tpu.parallel.mesh import make_hybrid_mesh, replicated

    pid = int(sys.argv[1])
    n = dist.init_distributed("127.0.0.1:{port}", 2, pid)
    assert n == 2, f"process_count {{n}}"
    mesh = make_hybrid_mesh()
    assert mesh.devices.shape == (2, 2), mesh.devices.shape
    assert mesh.axis_names == ("dcn", "data")

    local = np.arange(4, dtype=np.float32).reshape(4, 1) + 100 * pid
    x = dist.global_batch(mesh, local)
    assert x.shape == (8, 1), x.shape
    assert dist.process_local_slice(8) == slice(4 * pid, 4 * pid + 4)

    s = jax.jit(lambda v: jnp.sum(v), out_shardings=replicated(mesh))(x)
    expect = float(np.arange(4).sum() * 2 + 400)
    got = float(s)
    assert got == expect, (got, expect)
    print(f"DIST_OK {{pid}} {{got}}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_hybrid_mesh_reduction(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(
        WORKER.format(repo=str(REPO), port=_free_port()), encoding="utf-8"
    )
    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2", "PATH": "/usr/bin:/bin"}
    import os

    env = {**os.environ, **env}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=240) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed handshake timed out (sandboxed environment?)")

    rcs = [p.returncode for p in procs]
    if any(rcs) and _env_flake(outs):
        pytest.skip("distributed runtime unavailable in this environment (socket/Gloo)")
    for i, ((out, err), rc) in enumerate(zip(outs, rcs)):
        assert rc == 0, f"proc {i} rc={rc}\nstdout:\n{out}\nstderr:\n{err[-2000:]}"
        assert f"DIST_OK {i}" in out, out


TRAIN_WRAPPER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("LEANYOLO_TEST_CACHE", "/tmp/leanyolo_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import runpy
    sys.argv = ["train.py"] + sys.argv[1:]
    runpy.run_path({repo!r} + "/tools/train.py", run_name="__main__")
    """
)


@pytest.mark.slow
def test_two_process_distributed_train_cli(tmp_path):
    """tools/train.py --distributed end-to-end: two processes, 2x2 hybrid
    mesh, one epoch over a synthetic COCO set; process 0 writes checkpoints,
    process 1 writes nothing."""
    sys.path.insert(0, str(REPO / "tests"))
    from synth_coco import make_synth_coco

    images_dir, ann = make_synth_coco(str(tmp_path / "coco"))
    wrapper = tmp_path / "train_wrapper.py"
    wrapper.write_text(TRAIN_WRAPPER.format(repo=str(REPO)), encoding="utf-8")

    import os

    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "LEANYOLO_COORDINATOR": f"127.0.0.1:{_free_port()}",
        "LEANYOLO_NUM_PROCS": "2",
    }
    out0, out1 = tmp_path / "out0", tmp_path / "out1"
    argv = [
        "--model", "yolov10n", "--train-images", images_dir, "--train-ann", ann,
        "--val-images", images_dir, "--val-ann", ann,  # exercises proc-0 local eval
        "--imgsz", "32", "--epochs", "1", "--batch-size", "4", "--max-boxes", "8",
        "--workers", "0", "--distributed",
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, str(wrapper), *argv, "--process-id", str(i),
             "--out-dir", str(out0 if i == 0 else out1)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed train smoke timed out (cold compile on 1 core?)")

    rcs = [p.returncode for p in procs]
    if any(rcs) and _env_flake(outs):
        pytest.skip("distributed runtime unavailable in this environment (socket/Gloo)")
    for i, ((out, err), rc) in enumerate(zip(outs, rcs)):
        assert rc == 0, f"proc {i} rc={rc}\nstdout:\n{out[-2000:]}\nstderr:\n{err[-3000:]}"
    assert "hybrid data-parallel over (2, 2)" in outs[0][0]
    assert "mAP50-95=" in outs[0][0]  # proc-0 local eval ran
    assert "mAP50-95=" not in outs[1][0]  # other processes skip eval
    assert (out0 / "ckpt.npz").exists()
    assert not (out1 / "ckpt.npz").exists()  # non-zero process saves nothing


TRANSFER_WRAPPER = TRAIN_WRAPPER.replace("tools/train.py", "tools/transfer_learn.py").replace(
    '["train.py"]', '["transfer_learn.py"]'
)


@pytest.mark.slow
def test_two_process_distributed_transfer_cli(tmp_path):
    """tools/transfer_learn.py --distributed: two processes cross the
    freeze->unfreeze boundary on a 2x2 hybrid mesh; process 0 runs eval and
    writes best/ckpt, process 1 writes nothing."""
    sys.path.insert(0, str(REPO / "tests"))
    from synth_coco import make_synth_coco

    images_dir, ann = make_synth_coco(str(tmp_path / "coco"))
    wrapper = tmp_path / "transfer_wrapper.py"
    wrapper.write_text(TRANSFER_WRAPPER.format(repo=str(REPO)), encoding="utf-8")

    import os

    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "LEANYOLO_COORDINATOR": f"127.0.0.1:{_free_port()}",
        "LEANYOLO_NUM_PROCS": "2",
    }
    out0, out1 = tmp_path / "t0", tmp_path / "t1"
    argv = [
        "--model", "yolov10n", "--weights", "none",
        "--train-images", images_dir, "--train-ann", ann,
        "--val-images", images_dir, "--val-ann", ann,
        "--imgsz", "32", "--epochs", "2", "--unfreeze-epoch", "1",
        "--batch-size", "4", "--max-boxes", "8", "--workers", "0", "--distributed",
        # Exercises the distributed viz path: epoch 2's snapshots must
        # host-copy the global params before staging into the proc-0-local
        # eval predictor (non-addressable global arrays would crash pid 0).
        "--viz-interval", "1",
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, str(wrapper), *argv, "--process-id", str(i),
             "--out-dir", str(out0 if i == 0 else out1)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed transfer smoke timed out (cold compile on 1 core?)")

    rcs = [p.returncode for p in procs]
    if any(rcs) and _env_flake(outs):
        pytest.skip("distributed runtime unavailable in this environment (socket/Gloo)")
    for i, ((out, err), rc) in enumerate(zip(outs, rcs)):
        assert rc == 0, f"proc {i} rc={rc}\nstdout:\n{out[-2000:]}\nstderr:\n{err[-3000:]}"
    log0 = (out0 / "train.log").read_text() if (out0 / "train.log").exists() else ""
    assert "UNFREEZE" in log0 or "UNFREEZE" in outs[0][0] + outs[0][1]
    assert (out0 / "ckpt.npz").exists()
    assert not (out1 / "ckpt.npz").exists()
    # viz snapshots: written by process 0 only, starting in epoch 1 (the
    # viz path lazily creates the proc-0-local eval predictor on the first
    # snapshot, so it no longer waits for the first per-epoch eval)
    viz0 = list((out0 / "viz").glob("step*.jpg")) if (out0 / "viz").exists() else []
    assert viz0, "distributed --viz-interval produced no snapshots on process 0"
    assert not (out1 / "viz").exists()


VAL_WRAPPER = TRAIN_WRAPPER.replace("tools/train.py", "tools/val.py").replace(
    '["train.py"]', '["val.py"]'
)


@pytest.mark.slow
def test_two_process_distributed_val_cli(tmp_path):
    """tools/val.py --distributed: each process evaluates its stride-slice
    locally, detections merge via one allgather, BOTH processes report the
    same global image count/mAP, and only process 0 writes the CSV row."""
    sys.path.insert(0, str(REPO / "tests"))
    from synth_coco import make_synth_coco

    images_dir, ann = make_synth_coco(str(tmp_path / "coco"))
    wrapper = tmp_path / "val_wrapper.py"
    wrapper.write_text(VAL_WRAPPER.format(repo=str(REPO)), encoding="utf-8")

    import os

    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "LEANYOLO_COORDINATOR": f"127.0.0.1:{_free_port()}",
        "LEANYOLO_NUM_PROCS": "2",
    }
    csv0, csv1 = tmp_path / "log0.csv", tmp_path / "log1.csv"
    argv = [
        "--model", "yolov10n", "--weights", "none",
        "--images-dir", images_dir, "--ann-json", ann,
        "--imgsz", "32", "--batch-size", "2", "--decode", "topk",
        "--workers", "0", "--distributed",
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, str(wrapper), *argv, "--process-id", str(i),
             "--log-csv", str(csv0 if i == 0 else csv1)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=540) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed val smoke timed out (cold compile on 1 core?)")

    rcs = [p.returncode for p in procs]
    if any(rcs) and _env_flake(outs):
        pytest.skip("distributed runtime unavailable in this environment (socket/Gloo)")
    for i, ((out, err), rc) in enumerate(zip(outs, rcs)):
        assert rc == 0, f"proc {i} rc={rc}\nstdout:\n{out[-2000:]}\nstderr:\n{err[-3000:]}"
    # Both processes must report the GLOBAL merged evaluation (4 images).
    line0 = next(l for l in outs[0][0].splitlines() if l.startswith("mAP50-95="))
    line1 = next(l for l in outs[1][0].splitlines() if l.startswith("mAP50-95="))
    assert "images=4" in line0 and "images=4" in line1
    assert line0.split("throughput")[0] == line1.split("throughput")[0]  # same global mAP
    assert csv0.exists()
    assert not csv1.exists()  # CSV is process 0's job


@pytest.mark.slow
def test_two_process_distributed_resume(tmp_path):
    """--resume under --distributed with a SHARED out-dir: process 0's
    checkpoints are visible to all, the availability consensus passes, and
    training continues from epoch 2 on both processes."""
    sys.path.insert(0, str(REPO / "tests"))
    from synth_coco import make_synth_coco

    images_dir, ann = make_synth_coco(str(tmp_path / "coco"))
    wrapper = tmp_path / "train_wrapper.py"
    wrapper.write_text(TRAIN_WRAPPER.format(repo=str(REPO)), encoding="utf-8")

    import os

    shared = tmp_path / "shared_out"
    base_argv = [
        "--model", "yolov10n", "--train-images", images_dir, "--train-ann", ann,
        "--imgsz", "32", "--batch-size", "4", "--max-boxes", "8",
        "--workers", "0", "--distributed", "--out-dir", str(shared),
    ]

    def run_phase(extra):
        env = {
            **os.environ,
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "LEANYOLO_COORDINATOR": f"127.0.0.1:{_free_port()}",
            "LEANYOLO_NUM_PROCS": "2",
        }
        procs = [
            subprocess.Popen(
                [sys.executable, str(wrapper), *base_argv, *extra, "--process-id", str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
            )
            for i in range(2)
        ]
        try:
            return [p.communicate(timeout=540) for p in procs], [p.returncode for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("distributed resume smoke timed out (cold compile on 1 core?)")

    outs, rcs = run_phase(["--epochs", "1"])
    if any(rcs) and _env_flake(outs):
        pytest.skip("distributed runtime unavailable in this environment (socket/Gloo)")
    assert rcs == [0, 0], f"phase A: {rcs}\n{outs[0][1][-1500:]}\n{outs[1][1][-1500:]}"
    assert (shared / "last.npz").exists() and (shared / "train_state.npz").exists()

    outs, rcs = run_phase(["--epochs", "2", "--resume"])
    if any(rcs) and _env_flake(outs):
        pytest.skip("distributed runtime unavailable in this environment (socket/Gloo)")
    assert rcs == [0, 0], f"phase B: {rcs}\n{outs[0][1][-1500:]}\n{outs[1][1][-1500:]}"
    for i in range(2):
        assert "resumed from" in outs[i][0] and "epoch 1" in outs[i][0], outs[i][0][-800:]
        assert "epoch 2/2" in outs[i][0], outs[i][0][-800:]
