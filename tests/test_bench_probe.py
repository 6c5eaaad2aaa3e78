"""wait_for_backend probe policy (bench.py): retry tunnel outages, fail fast
on deterministic local errors, and never bench a silent CPU fallback."""

import os
import subprocess
import sys
import types

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench  # noqa: E402


def _proc(rc: int, stdout: str = "", stderr: str = "") -> subprocess.CompletedProcess:
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=stdout, stderr=stderr)


def test_returns_on_device_backend(monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _proc(0, stdout="axon\n"))
    bench.wait_for_backend(max_wait_s=1.0, probe_timeout_s=1.0)


def test_cpu_fallback_refused_without_optin(monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _proc(0, stdout="cpu\n"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.delenv("LEANYOLO_BENCH_ALLOW_CPU", raising=False)
    with pytest.raises(RuntimeError, match="LEANYOLO_BENCH_ALLOW_CPU"):
        bench.wait_for_backend(max_wait_s=0.0, probe_timeout_s=1.0)


def test_cpu_fallback_allowed_with_optin(monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _proc(0, stdout="cpu\n"))
    monkeypatch.setenv("LEANYOLO_BENCH_ALLOW_CPU", "1")
    bench.wait_for_backend(max_wait_s=1.0, probe_timeout_s=1.0)


def test_unavailable_is_retried_then_fails_with_cause(monkeypatch):
    err = "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE: tunnel down"
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        return _proc(1, stderr=err + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="axon tunnel down"):
        bench.wait_for_backend(max_wait_s=0.0, probe_timeout_s=1.0)
    assert calls, "probe must run at least once"


def test_deterministic_error_fails_fast(monkeypatch):
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        return _proc(1, stderr="ModuleNotFoundError: No module named 'jax'\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: (_ for _ in ()).throw(AssertionError("must not retry")))
    with pytest.raises(RuntimeError, match="deterministically"):
        bench.wait_for_backend(max_wait_s=600.0, probe_timeout_s=1.0)
    assert len(calls) == 1, "deterministic failures must not burn the retry budget"


def test_bench_latency_fit_smoke():
    """bench_latency runs the real chained program at tiny size on CPU and
    the fit arithmetic (wall(n) = overhead + n*step) returns sane numbers."""
    r = bench.bench_latency("yolov10n", imgsz=64, chains=(2, 6))
    # Plumbing only: CPU wall-time at tiny chains is too noisy to bound the
    # fit itself (the chip run is the measurement; PERF.md bs1 section).
    assert np.isfinite(r["step_ms"]) and r["step_ms"] > 0
    assert np.isfinite(r["per_call_overhead_ms"])
    assert set(r["wall_ms_per_step"]) == {"2", "6"}
