"""Weight resolution pipeline: local HTTP fake, hashes, env dirs, safe unpickle.

Mirrors the reference fixture strategy (reference: leanyolo/tests/
test_weights_download.py:21-106, test_weights_safe_unpickle.py:13-66).
"""

import hashlib
import os
import sys
import threading
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture()
def http_server(tmp_path):
    serve_dir = tmp_path / "serve"
    serve_dir.mkdir()

    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(serve_dir), **kw)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield serve_dir, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _write_blob(path, payload: bytes) -> str:
    path.write_bytes(payload)
    return hashlib.sha256(payload).hexdigest()


def test_download_and_verify(http_server, tmp_path):
    from leanyolo_tpu.utils.weights import WeightsEntry

    serve_dir, url = http_server
    sha = _write_blob(serve_dir / "w.bin", b"hello weights")
    entry = WeightsEntry(name="t", url=f"{url}/w.bin", filename="w.bin", sha256=sha)
    cache = tmp_path / "cache"
    path = entry.resolve_path(cache_dir=str(cache))
    assert os.path.exists(path)
    # Second resolve: served from cache (delete the server file to prove it).
    (serve_dir / "w.bin").unlink()
    assert entry.resolve_path(cache_dir=str(cache)) == path


def test_corrupted_cache_redownloads(http_server, tmp_path):
    from leanyolo_tpu.utils.weights import WeightsEntry

    serve_dir, url = http_server
    sha = _write_blob(serve_dir / "w.bin", b"payload-v2")
    entry = WeightsEntry(name="t", url=f"{url}/w.bin", filename="w.bin", sha256=sha)
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "w.bin").write_bytes(b"CORRUPT")
    path = entry.resolve_path(cache_dir=str(cache))
    assert open(path, "rb").read() == b"payload-v2"


def test_hash_mismatch_raises(http_server, tmp_path):
    from leanyolo_tpu.utils.weights import WeightsEntry

    serve_dir, url = http_server
    _write_blob(serve_dir / "w.bin", b"evil")
    entry = WeightsEntry(name="t", url=f"{url}/w.bin", filename="w.bin", sha256="0" * 64)
    with pytest.raises(RuntimeError, match="hash mismatch"):
        entry.resolve_path(cache_dir=str(tmp_path / "cache"))
    assert not (tmp_path / "cache" / "w.bin").exists()  # deleted on mismatch


def test_env_dir_override(tmp_path, monkeypatch):
    from leanyolo_tpu.utils.weights import WeightsEntry

    env_dir = tmp_path / "weights"
    env_dir.mkdir()
    (env_dir / "w.bin").write_bytes(b"local")
    monkeypatch.setenv("LEANYOLO_WEIGHTS_DIR", str(env_dir))
    entry = WeightsEntry(name="t", url=None, filename="w.bin")
    assert entry.resolve_path() == str(env_dir / "w.bin")


def test_safe_unpickle_without_stub_module(tmp_path):
    """Checkpoints pickling unknown classes load via dynamic stubbing.

    Builds a fake 'official' checkpoint referencing a module that does not
    exist, then loads it with the stubbed weights_only reader.
    """
    import torch

    from leanyolo_tpu.utils.torch_reader import load_torch_checkpoint

    # Create a fake module + class, pickle a checkpoint containing it.
    import types

    mod = types.ModuleType("fakelib.nn.tasks")
    for name in ("fakelib", "fakelib.nn", "fakelib.nn.tasks"):
        sys.modules.setdefault(name, types.ModuleType(name))

    class FakeModel:
        pass

    FakeModel.__module__ = "fakelib.nn.tasks"
    FakeModel.__qualname__ = "FakeModel"
    sys.modules["fakelib.nn.tasks"].FakeModel = FakeModel

    obj = FakeModel()
    obj.__dict__["_parameters"] = {}
    obj.__dict__["_buffers"] = {}
    obj.__dict__["_modules"] = {}
    ckpt = {"model": obj, "state_dict": {"layer.weight": torch.arange(4.0)}}
    path = tmp_path / "fake.pt"
    torch.save(ckpt, str(path))

    # Remove the fake module so loading must stub it.
    for name in list(sys.modules):
        if name.startswith("fakelib"):
            del sys.modules[name]

    sd = load_torch_checkpoint(str(path))
    assert "layer.weight" in sd
    np.testing.assert_array_equal(sd["layer.weight"], [0.0, 1.0, 2.0, 3.0])


def test_registry_api_errors():
    from leanyolo_tpu import get_model, get_model_weights, list_models

    assert set(list_models()) == {f"yolov10{v}" for v in "nsmblx"}
    with pytest.raises(ValueError, match="Unknown model"):
        get_model("yolov9", weights=None, class_names=["a"])
    with pytest.raises(ValueError, match="Unknown model"):
        get_model_weights("nope")
    with pytest.raises(ValueError, match="length 1 or 3"):
        get_model("yolov10n", weights=None, class_names=["a"], input_norm_divide=[1.0, 2.0])
    resolver = get_model_weights("yolov10s")()
    entry = resolver.get("yolov10s", "PRETRAINED_COCO")
    assert entry.sha256 and entry.url.endswith("yolov10s.pt")
    with pytest.raises(KeyError):
        resolver.get("yolov10s", "NOPE")


def test_official_keymap_translation():
    from leanyolo_tpu.models.yolov10.keymap import official_key_to_lean

    assert official_key_to_lean("model.0.conv.weight") == "backbone.cv0.conv.weight"
    assert official_key_to_lean("model.4.m.0.cv1.conv.weight") == "backbone.c4.m.0.cv1.conv.weight"
    assert official_key_to_lean("model.13.cv2.bn.bias") == "neck.p5_p4_c2f.cv2.bn.bias"
    assert official_key_to_lean("model.23.cv2.0.0.conv.weight") == "head.cv2.0.0.conv.weight"
    assert official_key_to_lean("model.11.anything") is None  # concat node
    assert official_key_to_lean("not_model.key") is None
