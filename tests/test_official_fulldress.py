"""FULL-DRESS offline rehearsal of the official-weights production path.

The real THU-MIG checkpoints are unreachable offline, so weights-day risk
must be reduced to "are the URL and SHA constants right". This suite drills
everything else END TO END, at full scale, for all six variants:

  emit a full-size official-format checkpoint (the reference torch model's
  weights re-keyed to `model.{idx}.`, wrapped in an ultralytics-style
  {"model": <module object>} pickle whose class module is NOT importable
  here, exactly like a real release file on a machine without ultralytics)
  -> serve it over a local HTTP fake
  -> get_model(weights="PRETRAINED_COCO")
  -> download -> SHA-256 verify -> stub-unpickle -> keymap remap
  -> forward fidelity vs the torch reference <= 5e-4
  -> synthetic-COCO validation smoke.

Both official layouts are drilled: unfused and fused-RepVGGDW (the release
files ship fused; reference remap synthesis: models/yolov10/remap.py:34-49).
Reference production path being rehearsed: leanyolo/models/registry.py:312-354
+ leanyolo/utils/weights.py:84-138 + tools/check_map_parity.py:35.
"""

import hashlib
import sys
import threading
import types
import warnings
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from conftest import reference_available
from test_official_remap import (
    _assert_forward_parity,
    _fuse_repvggdw_keys,
    _official_sd_from_reference,
)
from test_parity_reference import _build_reference_model

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

ALL_VARIANTS = ["yolov10n", "yolov10s", "yolov10m", "yolov10b", "yolov10l", "yolov10x"]

_FAKE_MODULE = "ultralytics.nn.tasks"  # NOT installed here (asserted below)


def _module_like_tree(sd):
    """Build an nn.Module-like object graph whose _parameters/_buffers/
    _modules traversal reproduces the flat official state dict — the shape
    of a real release checkpoint's pickled DetectionModel."""
    import torch

    class _FakeDetectionModel:
        pass

    _FakeDetectionModel.__module__ = _FAKE_MODULE
    _FakeDetectionModel.__qualname__ = "YOLOv10DetectionModel"
    # Pickle resolves the class by attribute lookup on its (fake) module —
    # the caller has already installed it in sys.modules.
    setattr(sys.modules[_FAKE_MODULE], "YOLOv10DetectionModel", _FakeDetectionModel)

    def node():
        o = _FakeDetectionModel()
        o.__dict__.update(_parameters={}, _buffers={}, _modules={})
        return o

    root = node()
    for key, tensor in sd.items():
        parts = key.split(".")
        cur = root
        for p in parts[:-1]:
            if p not in cur.__dict__["_modules"]:
                cur.__dict__["_modules"][p] = node()
            cur = cur.__dict__["_modules"][p]
        leaf = parts[-1]
        slot = "_buffers" if leaf in ("running_mean", "running_var", "num_batches_tracked") else "_parameters"
        cur.__dict__[slot][leaf] = tensor.detach().clone()
    return root


def _emit_official_ckpt(sd, path):
    """torch.save an ultralytics-style container; unimport the fake module so
    loading MUST go through the stubbed weights-only unpickler."""
    import torch

    for name in (_FAKE_MODULE.rsplit(".", 1)[0].split(".")[0], _FAKE_MODULE.rsplit(".", 1)[0], _FAKE_MODULE):
        sys.modules.setdefault(name, types.ModuleType(name))
    try:
        ckpt = {"model": _module_like_tree(sd), "epoch": -1, "train_args": {"data": "coco.yaml"}}
        torch.save(ckpt, str(path))
    finally:
        for name in list(sys.modules):
            if name.startswith(_FAKE_MODULE.split(".")[0]):
                del sys.modules[name]
    return hashlib.sha256(path.read_bytes()).hexdigest()


import contextlib


@contextlib.contextmanager
def _http_server_ctx(tmp_path):
    """Local HTTP weight fake; yields (serve_dir, base_url). Shared with
    test_weights_day_rehearsal.py."""
    serve_dir = tmp_path / "serve"
    serve_dir.mkdir(exist_ok=True)

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(serve_dir), **kw)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield serve_dir, f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()


@pytest.fixture()
def http_server(tmp_path):
    with _http_server_ctx(tmp_path) as pair:
        yield pair


def _patch_registry(monkeypatch, tmp_path, name, url, sha):
    from leanyolo_tpu.models.registry import _YOLOv10Weights
    from leanyolo_tpu.utils.weights import WeightsEntry

    monkeypatch.setitem(
        _YOLOv10Weights.MODEL_TO_WEIGHTS[name],
        "PRETRAINED_COCO",
        WeightsEntry(name=f"{name}.PRETRAINED_COCO", url=url, filename=f"{name}.pt", sha256=sha),
    )
    monkeypatch.setenv("LEANYOLO_CACHE_DIR", str(tmp_path / "wcache"))
    monkeypatch.delenv("LEANYOLO_WEIGHTS_DIR", raising=False)


def _get_model_pretrained_or_fail(name, **kw):
    """get_model(PRETRAINED_COCO) downgrades load failures to a warning +
    random init; the rehearsal must treat that as FAILURE, and demand the
    100%-coverage load report."""
    from leanyolo_tpu import get_model

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        model = get_model(name, weights="PRETRAINED_COCO", **kw)
    msgs = [str(x.message) for x in w]
    assert not any("Proceeding with randomly initialized" in m for m in msgs), msgs
    assert not any("Missing leaves" in m for m in msgs), msgs
    cover = [m for m in msgs if "filled model:" in m]
    assert cover and "(100.0%)" in cover[0], msgs
    return model


def _fulldress(name, fused, http_server, tmp_path, monkeypatch, seed):
    # The real package must not be installed on disk (PathFinder skips the
    # in-memory stubs the weights loader leaves behind) — so loading MUST go
    # through the stub-unpickle path.
    from importlib.machinery import PathFinder

    assert PathFinder.find_spec("ultralytics") is None
    ref = _build_reference_model(name, seed=seed)
    sd = _official_sd_from_reference(ref)
    n_fused = 0
    if fused:
        sd, n_fused = _fuse_repvggdw_keys(sd)
        if n_fused == 0:
            pytest.skip(f"{name} has no RepVGGDW blocks; fused layout == unfused")
    serve_dir, url = http_server
    sha = _emit_official_ckpt(sd, serve_dir / f"{name}.pt")
    _patch_registry(monkeypatch, tmp_path, name, f"{url}/{name}.pt", sha)

    model = _get_model_pretrained_or_fail(
        name,
        class_names=[f"c{i}" for i in range(80)],
        input_norm_subtract=[0.0],
        input_norm_divide=[1.0],
    )
    # Download really happened into the patched cache, hash-verified.
    assert (tmp_path / "wcache" / f"{name}.pt").exists()
    _assert_forward_parity(ref, model.cfg, model.params)


@pytest.mark.parametrize("name", ALL_VARIANTS)
def test_fulldress_unfused(name, http_server, tmp_path, monkeypatch):
    _fulldress(name, False, http_server, tmp_path, monkeypatch, seed=31)


@pytest.mark.parametrize("name", ALL_VARIANTS)
def test_fulldress_fused(name, http_server, tmp_path, monkeypatch):
    _fulldress(name, True, http_server, tmp_path, monkeypatch, seed=47)


def test_fulldress_fp16_release_dtype(http_server, tmp_path, monkeypatch):
    """Real release files store fp16 tensors; the reader must upcast and the
    load must reach 100% coverage (parity tolerance does not apply — the
    fp32 oracle was never quantized)."""
    name = "yolov10n"
    ref = _build_reference_model(name, seed=7)
    sd = {k: v.half() for k, v in _official_sd_from_reference(ref).items()}
    serve_dir, url = http_server
    sha = _emit_official_ckpt(sd, serve_dir / f"{name}.pt")
    _patch_registry(monkeypatch, tmp_path, name, f"{url}/{name}.pt", sha)
    model = _get_model_pretrained_or_fail(name, class_names=[f"c{i}" for i in range(80)])
    w0 = np.asarray(model.params["backbone"]["cv0"]["conv"]["w"])
    want = sd["model.0.conv.weight"].float().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(w0, want)


def test_fulldress_val_smoke(http_server, tmp_path, monkeypatch):
    """The loaded-official-weights model drives the validation pipeline end
    to end on a synthetic 80-category COCO set (the offline stand-in for the
    reference's PRETRAINED_COCO -> val mAP-parity gate,
    reference tools/check_map_parity.py:35)."""
    from synth_coco import make_synth_coco

    name = "yolov10n"
    ref = _build_reference_model(name, seed=3)
    sd, _ = _fuse_repvggdw_keys(_official_sd_from_reference(ref))
    serve_dir, url = http_server
    sha = _emit_official_ckpt(sd, serve_dir / f"{name}.pt")
    _patch_registry(monkeypatch, tmp_path, name, f"{url}/{name}.pt", sha)
    model = _get_model_pretrained_or_fail(name, class_names=[f"c{i}" for i in range(80)])

    img_dir, ann = make_synth_coco(str(tmp_path / "coco"), n_images=4, n_classes=80)
    from leanyolo_tpu.engine.validator import validate_coco

    stats = validate_coco(
        model, images_dir=img_dir, ann_json=ann, imgsz=64, batch_size=2,
        decode="topk", conf_thresh=0.001, iou_thresh=0.65, workers=2,
    )
    assert 0.0 <= stats["map_50_95"] <= 1.0 and stats["n_images"] == 4
