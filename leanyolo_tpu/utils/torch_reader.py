"""Safe torch-checkpoint reading into flat numpy state dicts.

The official YOLOv10 checkpoints pickle ultralytics model objects. The
reference loads them with `weights_only=True` plus a dynamic-stub loop that
allowlists each missing global as a bare stub class, so no third-party code
is imported (reference: leanyolo/utils/weights.py:62-138). This module does
the same with torch CPU, then immediately converts everything to numpy —
torch never leaks past this boundary into the JAX framework.

It also reimplements the checkpoint-unwrapping heuristics
(reference: leanyolo/utils/remap.py:17-128): wrapper keys like
'model'/'state_dict'/'ema_state_dict', module-like objects traversed through
`_parameters`/`_buffers`/`_modules` without calling methods, and common
prefix stripping.
"""

from __future__ import annotations

import re
import sys
import types
from typing import Any, Dict

import numpy as np

POSSIBLE_STATE_KEYS = ("state_dict", "model", "ema_state_dict", "model_state", "net")
COMMON_PREFIXES = ("module.", "model.model.", )


def _torch():
    import torch

    return torch


def _safe_load_with_stubs(path: str):
    """torch.load(weights_only=True), stubbing unknown globals on demand."""
    torch = _torch()
    from torch.serialization import add_safe_globals

    attempted = set()
    for _ in range(64):
        try:
            return torch.load(path, map_location="cpu", weights_only=True)
        except Exception as ex:
            msg = str(ex)
            m = re.search(r"Unsupported global: (?:GLOBAL\s+)?([\w\.]+)\.(\w+)", msg)
            if not m:
                raise
            mod_path, cls_name = m.group(1), m.group(2)
            fqcn = f"{mod_path}.{cls_name}"
            if fqcn in attempted:
                raise
            attempted.add(fqcn)
            parent = None
            parts = mod_path.split(".")
            for i, part in enumerate(parts):
                full = ".".join(parts[: i + 1])
                mod = sys.modules.get(full)
                if mod is None:
                    mod = types.ModuleType(full)
                    sys.modules[full] = mod
                    if parent is not None:
                        setattr(parent, part, mod)
                parent = mod
            mod = sys.modules[mod_path]
            if not hasattr(mod, cls_name):
                stub = type(cls_name, (object,), {"__module__": mod_path, "state_dict": lambda self: {}})
                setattr(mod, cls_name, stub)
                add_safe_globals([stub])
            else:
                add_safe_globals([getattr(mod, cls_name)])
    raise RuntimeError("failed to safely load checkpoint with dynamic stubs")


def _module_like_to_state_dict(mod: Any, prefix: str = "") -> Dict[str, Any]:
    """Extract tensors from an nn.Module-like object without calling methods."""
    torch = _torch()
    out: Dict[str, Any] = {}
    try:
        for attr in ("_parameters", "_buffers"):
            d = getattr(mod, attr, None)
            if isinstance(d, dict):
                for k, v in d.items():
                    if isinstance(v, torch.Tensor):
                        out[prefix + k] = v
        children = getattr(mod, "_modules", None)
        if isinstance(children, dict):
            for name, child in children.items():
                child_prefix = prefix + (name + "." if prefix or name else "")
                out.update(_module_like_to_state_dict(child, child_prefix))
    except Exception:
        pass
    return out


def extract_state_dict(obj: Any) -> Dict[str, Any]:
    """Unwrap checkpoint containers to a flat name -> tensor dict."""
    torch = _torch()
    if hasattr(obj, "state_dict") and callable(getattr(obj, "state_dict")):
        try:
            sd = obj.state_dict()
            if isinstance(sd, dict) and sd:
                return sd
        except Exception:
            pass
    ml = _module_like_to_state_dict(obj)
    if ml:
        return ml
    if isinstance(obj, dict):
        for key in POSSIBLE_STATE_KEYS:
            v = obj.get(key)
            if v is None:
                continue
            if hasattr(v, "state_dict") and callable(getattr(v, "state_dict")):
                try:
                    sd = v.state_dict()
                    if isinstance(sd, dict) and sd:
                        return sd
                except Exception:
                    pass
            ml = _module_like_to_state_dict(v)
            if ml:
                return ml
            if isinstance(v, dict) and v:
                inner = v
                for key2 in POSSIBLE_STATE_KEYS:
                    vv = inner.get(key2)
                    if hasattr(vv, "state_dict") and callable(getattr(vv, "state_dict")):
                        try:
                            sd = vv.state_dict()
                            if isinstance(sd, dict) and sd:
                                return sd
                        except Exception:
                            pass
                    ml2 = _module_like_to_state_dict(vv)
                    if ml2:
                        return ml2
                    if isinstance(vv, dict) and vv:
                        inner = vv
                        break
                return inner
        return obj
    return obj


def to_numpy_sd(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            t = v.detach().cpu()
            # bf16/half torch tensors -> fp32 numpy
            if t.dtype not in ():
                t = t.float() if t.is_floating_point() else t
            out[k] = t.numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
    return out


def strip_common_prefixes(sd: Dict[str, np.ndarray], keep_model_prefix: bool = True) -> Dict[str, np.ndarray]:
    """Strip 'module.' / 'model.model.' wrappers.

    Unlike the reference (which strips bare 'model.' too), the official
    `model.{idx}.` numbering is preserved by default because the keymap
    consumes it directly.
    """
    prefixes = COMMON_PREFIXES if keep_model_prefix else COMMON_PREFIXES + ("model.",)
    out = {}
    for k, v in sd.items():
        kk = k
        changed = True
        while changed:
            changed = False
            for p in prefixes:
                if kk.startswith(p):
                    kk = kk[len(p):]
                    changed = True
        out[kk] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load any torch checkpoint into a flat numpy state dict (CPU only)."""
    obj = _safe_load_with_stubs(path)
    sd = extract_state_dict(obj)
    return strip_common_prefixes(to_numpy_sd(sd))
