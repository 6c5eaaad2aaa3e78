"""Model registry and public API: get_model / list_models / get_model_weights.

Mirrors the reference registry behavior
(reference: leanyolo/models/registry.py:44-355):

- name -> builder map over the six YOLOv10 variants;
- `weights=None` -> random init;
- `weights=<path>` -> STRICT load, no remapping (``.npz`` native checkpoints
  or torch-layout ``.pt`` files);
- `weights='PRETRAINED_COCO'` -> resolve via the per-variant URL+SHA-256
  table, download/cache/verify, remap the official checkpoint into the JAX
  parameter tree, warn with coverage stats, and fall back to random init
  with a warning on failure.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Dict, Iterable, Optional, Sequence, Type

import numpy as np

from ..utils.weights import WeightsEntry, WeightsResolver
from .yolov10.config import VARIANTS
from .yolov10.model import YOLOv10
from .yolov10.remap import flatten_param_paths, path_to_torch_key, torch_sd_to_params


class _YOLOv10Weights(WeightsResolver):
    """Official THU-MIG YOLOv10 release weights (v1.1), per variant.

    URL + SHA-256 table mirrors the reference registry
    (leanyolo/models/registry.py:104-159).
    """

    _SHA = {
        "yolov10n": "61b91ffc99b284792dca49bf40216945833cc2a515e1a742954e6e9327cfc19e",
        "yolov10s": "96af3fc7c7169abcc4867f3e3088b761bb33cf801283c2ec05f9703d63a0ba77",
        "yolov10m": "ff2c559f11d13701abc4e0345f82851d146ecfe7035efaafcc08475cfd8b5f2d",
        "yolov10b": "3846434cbf0016b663a1ccd6d843c48468f6852f4feeddcb9f67f9182168c142",
        "yolov10l": "83769ec3cbc61f18113f612f8bdcf922396628d620682bb72966e9b148004b8b",
        "yolov10x": "6e6eae65e6c268c49a25849922e0c75a5c707d626d67170d16a97813b0f8eb79",
    }

    MODEL_TO_WEIGHTS: Dict[str, Dict[str, WeightsEntry]] = {
        name: {
            "PRETRAINED_COCO": WeightsEntry(
                name=f"{name}.PRETRAINED_COCO",
                url=f"https://github.com/THU-MIG/yolov10/releases/download/v1.1/{name}.pt",
                filename=f"{name}.pt",
                sha256=sha,
                metadata={"task": "detection", "dataset": "coco", "source": "THU-MIG/yolov10@v1.1"},
            )
        }
        for name, sha in _SHA.items()
    }

    def list(self, model_name: str) -> Iterable[str]:
        return self.MODEL_TO_WEIGHTS.get(model_name, {}).keys()

    def get(self, model_name: str, key: str) -> WeightsEntry:
        mapping = self.MODEL_TO_WEIGHTS.get(model_name)
        if not mapping or key not in mapping:
            raise KeyError(f"No weights '{key}' for model '{model_name}'.")
        return mapping[key]


def list_models() -> Iterable[str]:
    return tuple(VARIANTS.keys())


def get_model_weights(name: str) -> Type[_YOLOv10Weights]:
    if name not in VARIANTS:
        raise ValueError(f"Unknown model '{name}'. Available: {list_models()}")
    return _YOLOv10Weights


def _to3(x: Sequence[float]) -> Sequence[float]:
    if len(x) == 1:
        return [float(x[0])] * 3
    if len(x) != 3:
        raise ValueError("subtract_mean/divide must have length 1 or 3")
    return [float(v) for v in x]


def get_model(
    name: str,
    *,
    weights: Optional[str],
    class_names: Sequence[str],
    input_norm_subtract: Optional[Sequence[float]] = None,
    input_norm_divide: Optional[Sequence[float]] = None,
    seed: int = 0,
) -> YOLOv10:
    """Build a YOLOv10 variant and optionally load weights.

    Inputs are NHWC RGB; normalization `(x - subtract) / divide` happens
    inside the model. Defaults (subtract 0, divide 255) expect raw [0, 255]
    pixels, matching the reference (registry.py:219-223).
    """
    if name not in VARIANTS:
        raise ValueError(f"Unknown model '{name}'. Available: {list_models()}")
    sub3 = _to3(input_norm_subtract if input_norm_subtract is not None else (0.0, 0.0, 0.0))
    div3 = _to3(input_norm_divide if input_norm_divide is not None else (255.0, 255.0, 255.0))

    model = YOLOv10.create(name, class_names=class_names, input_norm_subtract=sub3, input_norm_divide=div3, seed=seed)

    if weights is None:
        return model
    if isinstance(weights, str) and os.path.isfile(weights):
        try:
            load_checkpoint_into(model, weights)
            return model
        except Exception as e:
            raise ValueError(
                f"Failed to load local weights '{weights}': {e}. "
                "Provide a checkpoint compatible with this library version."
            )
    if weights != "PRETRAINED_COCO":
        raise ValueError("weights must be a filename, 'PRETRAINED_COCO', or None")
    try:
        _load_official_pretrained_into_model(name, model)
    except Exception as e:  # pragma: no cover - environment dependent
        warnings.warn(
            f"Could not load weights '{weights}' for '{name}': {e}. "
            "Proceeding with randomly initialized weights.",
            RuntimeWarning,
        )
    return model


def _load_official_pretrained_into_model(model_name: str, model: YOLOv10) -> None:
    entry = _YOLOv10Weights().get(model_name, "PRETRAINED_COCO")
    src_sd = entry.get_state_dict()
    params, stats = torch_sd_to_params(src_sd, model.params, official=True)
    dst_total = len(flatten_param_paths(model.params))
    loaded = dst_total - len(stats["missing"])
    warnings.warn(
        f"Weights loaded: {len(stats['matched'])}/{stats['src_total']} tensors from file "
        f"({100.0 * len(stats['matched']) / max(stats['src_total'], 1):.1f}%), "
        f"filled model: {loaded}/{dst_total} leaves ({100.0 * loaded / dst_total:.1f}%).",
        RuntimeWarning,
    )
    if stats["missing"]:
        warnings.warn(f"Missing leaves when loading weights: {sorted(stats['missing'])[:10]}...", RuntimeWarning)
    if stats["unused_src"]:
        warnings.warn(f"Unexpected keys when loading weights: {sorted(stats['unused_src'])[:10]}...", RuntimeWarning)
    model.params = params


# ---------------------------------------------------------------------------
# Native checkpoint save/load (.npz with JSON metadata)
# ---------------------------------------------------------------------------

CKPT_META_KEY = "__leanyolo_tpu_meta__"


def save_checkpoint(model: YOLOv10, path: str, *, extra_meta: Optional[dict] = None) -> None:
    """Save params + metadata. Keys are torch-style dotted names.

    Metadata keys mirror the reference checkpoint format
    (reference: tools/train.py:294-305): leanyolo_version, model_name,
    class_names, input_norm_subtract, input_norm_divide.
    """
    from ..version import __version__

    flat = {}
    for p, leaf in flatten_param_paths(model.params):
        key = path_to_torch_key(p) or "/".join(map(str, p))
        flat[key] = np.asarray(leaf)
    meta = {
        "leanyolo_version": __version__,
        "model_name": model.cfg.name,
        "class_names": model.class_names,
        "input_norm_subtract": np.asarray(model.params["input_subtract"]).tolist(),
        "input_norm_divide": np.asarray(model.params["input_divide"]).tolist(),
    }
    if extra_meta:
        meta.update(extra_meta)
    flat[CKPT_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_checkpoint_meta(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        if CKPT_META_KEY not in z:
            return {}
        return json.loads(bytes(z[CKPT_META_KEY]).decode())


def load_checkpoint_into(model: YOLOv10, path: str) -> None:
    """STRICT local checkpoint load; keys and shapes must match exactly.

    Accepts native `.npz` checkpoints or torch `.pt` files whose state dict
    uses this library's lean key layout (reference local-load semantics:
    registry.py:272-309 — no remapping, clear errors on mismatch).
    """
    if path.endswith(".pt") or path.endswith(".pth"):
        from ..utils.torch_reader import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        sd.pop("head.dfl.bins", None)  # derived buffer, not a parameter
        params, _ = torch_sd_to_params(sd, model.params, official=False, strict=True)
        model.params = params
        return
    with np.load(path, allow_pickle=False) as z:
        sd = {k: z[k] for k in z.files if k != CKPT_META_KEY}
    template_keys = {
        path_to_torch_key(p) or "/".join(map(str, p)): (p, leaf)
        for p, leaf in flatten_param_paths(model.params)
    }
    missing = sorted(set(template_keys) - set(sd))
    unexpected = sorted(set(sd) - set(template_keys))
    if missing or unexpected:
        raise ValueError(f"state mismatch: missing={missing[:5]} unexpected={unexpected[:5]}")
    import copy

    new_params = copy.deepcopy(model.params)
    from .yolov10.remap import _set_path  # shared path setter

    for key, (p, leaf) in template_keys.items():
        arr = sd[key]
        if tuple(arr.shape) != tuple(np.asarray(leaf).shape):
            raise ValueError(f"shape mismatch for '{key}': {arr.shape} vs {np.asarray(leaf).shape}")
        _set_path(new_params, p, arr)
    model.params = new_params


def load_checkpoint_transfer(model: YOLOv10, path: str) -> dict:
    """LENIENT local load for transfer learning: fill every leaf whose key
    AND shape match, keep fresh init for the rest, return coverage stats.

    The strict loader refuses a checkpoint whose class count differs from
    the target model — but that is exactly the transfer situation (the
    reference's flow loads 80-class COCO weights into a 7-class Aquarium
    model, warning and skipping the nc-dependent head leaves:
    reference transfer_learn_aquarium.py:394-402 via registry.py:312-354).
    This is the local-.npz analog; skipped head leaves are then reset by
    the transfer tool's head_reset anyway.
    """
    if path.endswith(".pt") or path.endswith(".pth"):
        from ..utils.torch_reader import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        sd.pop("head.dfl.bins", None)
    else:
        with np.load(path, allow_pickle=False) as z:
            sd = {k: z[k] for k in z.files if k != CKPT_META_KEY}
    import copy

    from .yolov10.remap import _set_path

    new_params = copy.deepcopy(model.params)
    loaded, skipped, missing = [], [], []
    for p, leaf in flatten_param_paths(model.params):
        key = path_to_torch_key(p) or "/".join(map(str, p))
        if key not in sd:
            missing.append(key)
            continue
        arr = np.asarray(sd[key])
        if tuple(arr.shape) != tuple(np.asarray(leaf).shape):
            skipped.append(key)
            continue
        _set_path(new_params, p, arr)
        loaded.append(key)
    unused = sorted(set(sd) - set(loaded) - set(skipped))
    total = len(loaded) + len(skipped) + len(missing)
    if skipped or missing:
        warnings.warn(
            f"Transfer load from '{path}': {len(loaded)}/{total} leaves loaded; "
            f"shape-mismatch (kept fresh init): {skipped[:6]}{'...' if len(skipped) > 6 else ''}; "
            f"missing: {missing[:4]}",
            RuntimeWarning,
        )
    model.params = new_params
    return {"loaded": len(loaded), "total": total, "skipped": skipped, "missing": missing, "unused_src": unused}
