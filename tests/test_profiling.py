"""The profiling utility must capture and summarize a trace on any backend."""

import numpy as np


def test_capture_and_summarize_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from leanyolo_tpu.utils.profiling import capture_trace, format_table, summarize_trace

    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    x = jnp.asarray(np.random.RandomState(0).randn(256, 256).astype(np.float32))
    f(x).block_until_ready()  # compile outside the trace

    out = str(tmp_path / "trace")
    steps = 3
    with capture_trace(out):
        for _ in range(steps):
            f(x).block_until_ready()

    s = summarize_trace(out, steps=steps)
    assert s.total_ms > 0
    assert s.families and all(fam.total_ms >= 0 for fam in s.families)
    txt = format_table(s, top=5)
    assert "ms/step" in txt and s.plane in txt


def test_profile_step_cli_smoke(tmp_path, monkeypatch, capsys):
    """profile_step.py end-to-end on a tiny model (CPU backend)."""
    import os
    import sys

    monkeypatch.syspath_prepend(os.path.join(os.path.dirname(__file__), "..", "tools"))
    monkeypatch.setattr(
        sys, "argv",
        ["profile_step.py", "--model", "yolov10n", "--weights", "none",
         "--mode", "infer", "--imgsz", "64", "--batch-size", "2",
         "--dtype", "float32", "--steps", "2",
         "--out-dir", str(tmp_path / "prof"), "--json", str(tmp_path / "p.json")],
    )
    import importlib

    mod = importlib.import_module("profile_step")
    mod.main()
    out = capsys.readouterr().out
    assert "on-device XLA op time" in out
    import json

    data = json.load(open(tmp_path / "p.json"))
    assert data["total_ms_per_step"] > 0 and data["families"]
