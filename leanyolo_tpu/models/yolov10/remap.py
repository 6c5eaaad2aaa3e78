"""Torch-state-dict -> JAX-parameter-pytree conversion for YOLOv10.

The parameter pytrees produced by model.py mirror the torch module hierarchy
one-to-one, so conversion reduces to:

1. flatten our pytree into torch-style dotted names (`backbone.c4.m.0.cv1.
   conv.weight`, bn leaves renamed to weight/bias/running_mean/running_var);
2. translate official `model.{idx}.` prefixes into those names via the keymap
   (reference: leanyolo/models/yolov10/keymap.py:6-51);
3. transpose conv kernels OIHW -> HWIO (grouped convs keep their group
   ordering under this transpose — per-group blocks live on the O axis);
4. synthesize identity parameters for RepVGGDW `conv1` branches when the
   official checkpoint is fused (reference: models/yolov10/remap.py:34-49);
5. fall back to in-order shape matching for any stragglers
   (reference: leanyolo/utils/remap.py:149-173).

All tensors pass through numpy; no torch objects leak into the returned tree.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

Params = Dict[str, Any]

_BN_LEAF_TO_TORCH = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}
_TORCH_TO_BN_LEAF = {v: k for k, v in _BN_LEAF_TO_TORCH.items()}


def flatten_param_paths(tree: Any, prefix: Tuple = ()) -> List[Tuple[Tuple, Any]]:
    """Flatten a params tree into (path, leaf) pairs; lists use int components."""
    out: List[Tuple[Tuple, Any]] = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(flatten_param_paths(v, prefix + (k,)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.extend(flatten_param_paths(v, prefix + (i,)))
    else:
        out.append((prefix, tree))
    return out


def path_to_torch_key(path: Tuple) -> Optional[str]:
    """Our tree path -> torch dotted state_dict key (None = no torch analog)."""
    comps = [str(c) for c in path]
    leaf = comps[-1]
    parent = comps[-2] if len(comps) > 1 else ""
    if parent == "bn":
        if leaf not in _BN_LEAF_TO_TORCH:
            return None
        comps[-1] = _BN_LEAF_TO_TORCH[leaf]
    elif leaf == "w":
        comps[-1] = "weight"
    elif leaf == "b":
        comps[-1] = "bias"
    elif path == ("input_subtract",) or path == ("input_divide",):
        return comps[0]
    else:
        return None
    return ".".join(comps)


def _set_path(tree: Any, path: Tuple, value) -> None:
    node = tree
    for c in path[:-1]:
        node = node[c]
    node[path[-1]] = value


def _get_path(tree: Any, path: Tuple):
    node = tree
    for c in path:
        node = node[c]
    return node


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch.Tensor without importing torch at module scope
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _convert_leaf(src: np.ndarray, dst_shape: Tuple[int, ...], path: Tuple) -> Optional[np.ndarray]:
    """Convert one torch tensor to our leaf layout; None if incompatible."""
    src = _to_numpy(src).astype(np.float32)
    if path[-1] == "w" and src.ndim == 4:
        src = src.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    elif path in (("input_subtract",), ("input_divide",)):
        src = src.reshape(-1)
    if tuple(src.shape) != tuple(dst_shape):
        return None
    return src


def torch_sd_to_params(
    src_sd: Dict[str, Any],
    params_template: Params,
    *,
    official: bool = False,
    strict: bool = False,
) -> Tuple[Params, Dict[str, Any]]:
    """Convert a flat torch state dict into a params tree shaped like the template.

    Args:
        src_sd: dotted-name -> tensor (torch tensors or numpy arrays). For
            `official=True`, keys use official `model.{idx}.` numbering and
            are translated through the keymap first.
        params_template: a params tree (e.g. from model_init) defining
            structure, shapes, and dtypes.
        strict: if True, raise when any destination leaf is missing or any
            source tensor is unused (reference local-load semantics,
            registry.py:272-309).

    Returns:
        (new_params, stats) where stats has 'matched', 'synthesized',
        'shape_filled', 'missing', 'unused_src' key lists.
    """
    from .keymap import REPVGGDW_FUSED_ALT, official_key_to_lean

    # Normalize source keys.
    src: Dict[str, np.ndarray] = {}
    for k, v in src_sd.items():
        if not hasattr(v, "shape"):
            continue
        if k.endswith("num_batches_tracked") or k.endswith("dfl.bins"):
            continue  # step counters / derived buffers have no JAX analog
        lean = official_key_to_lean(k) if official else k
        if lean is None:
            continue
        src[lean] = v

    leaves = flatten_param_paths(params_template)

    if official:
        # Fused RepVGGDW alt names -> unfused names. Conditional on the
        # destination template, like the reference (keymap.py:45-60): a plain
        # (non-long-kernel) CIB also has a `cv1.2.conv.weight` leaf, and that
        # one must NOT be renamed — only keys whose direct name is absent
        # from the template but whose unfused alt exists are fused spellings.
        template_keys = {path_to_torch_key(p) for p, _ in leaves}
        template_keys.discard(None)
        for fused_suf, unfused_suf in REPVGGDW_FUSED_ALT.items():
            for k in list(src.keys()):
                if k.endswith(fused_suf) and k not in template_keys:
                    cand = k[: -len(fused_suf)] + unfused_suf
                    if cand in template_keys:
                        src.setdefault(cand, src.pop(k))
    out = _clone_structure(params_template)

    matched, synthesized, shape_filled, missing = [], [], [], []
    used_src = set()

    # Pass 1: exact name matches.
    unmatched: List[Tuple[Tuple, Any]] = []
    for path, leaf in leaves:
        tk = path_to_torch_key(path)
        if tk is not None and tk in src:
            conv = _convert_leaf(src[tk], leaf.shape, path)
            if conv is not None:
                _set_path(out, path, conv)
                matched.append(tk)
                used_src.add(tk)
                continue
        unmatched.append((path, leaf))

    # Pass 2: synthesize fused-RepVGGDW conv1 branches (zero conv + identity
    # BN reproduces the reference's fused-checkpoint handling, remap.py:34-49).
    still: List[Tuple[Tuple, Any]] = []
    for path, leaf in unmatched:
        spath = [str(c) for c in path]
        if "conv1" in spath:
            i = spath.index("conv1")
            base_key = path_to_torch_key(tuple(path[:i]) + ("conv",) + path[i + 1 :])
            if base_key in used_src or base_key in src:
                name = path[-1]
                parent = str(path[-2]) if len(path) > 1 else ""
                if parent == "conv" and name == "w":
                    _set_path(out, path, np.zeros(leaf.shape, np.float32))
                elif parent == "bn" and name in ("scale", "var"):
                    _set_path(out, path, np.ones(leaf.shape, np.float32))
                elif parent == "bn":
                    _set_path(out, path, np.zeros(leaf.shape, np.float32))
                else:
                    still.append((path, leaf))
                    continue
                synthesized.append(".".join(spath))
                continue
        still.append((path, leaf))

    # Pass 3: in-order shape fill from unused source tensors
    # (reference: leanyolo/utils/remap.py:149-173).
    if still and not strict:
        remaining_src = [(k, v) for k, v in src.items() if k not in used_src]
        si = 0
        for path, leaf in list(still):
            want: Optional[np.ndarray] = None
            while si < len(remaining_src):
                k, v = remaining_src[si]
                conv = _convert_leaf(v, leaf.shape, path)
                if conv is not None:
                    want = conv
                    used_src.add(k)
                    si += 1
                    break
                si += 1
            if want is not None:
                _set_path(out, path, want)
                shape_filled.append(path_to_torch_key(path) or ".".join(map(str, path)))
                still.remove((path, leaf))

    for path, _ in still:
        if official and path in (("input_subtract",), ("input_divide",)):
            # Official release files carry no normalization constants — these
            # leaves are config-owned (set by get_model from the WeightsEntry
            # metadata, reference registry.py:312-354) and keep their values.
            continue
        missing.append(path_to_torch_key(path) or ".".join(map(str, path)))

    unused_src = [k for k in src if k not in used_src]
    stats = {
        "matched": matched,
        "synthesized": synthesized,
        "shape_filled": shape_filled,
        "missing": missing,
        "unused_src": unused_src,
        "src_total": len(src),
    }
    if strict and (missing or unused_src):
        raise ValueError(
            f"strict load failed: {len(missing)} missing leaves "
            f"(e.g. {missing[:5]}), {len(unused_src)} unused source tensors "
            f"(e.g. {sorted(unused_src)[:5]})"
        )
    return out, stats


def params_to_torch_sd(params: Params) -> Dict[str, np.ndarray]:
    """Inverse conversion: our params tree -> torch-layout flat state dict.

    Used for interop checkpoints and for oracle tests against the reference
    torch implementation. Conv kernels go back HWIO -> OIHW; norm buffers
    regain their [1, C, 1, 1] shape.
    """
    out: Dict[str, np.ndarray] = {}
    for path, leaf in flatten_param_paths(params):
        tk = path_to_torch_key(path)
        if tk is None:
            continue
        arr = np.asarray(leaf)
        if path[-1] == "w" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif path in (("input_subtract",), ("input_divide",)):
            arr = arr.reshape(1, -1, 1, 1)
        out[tk] = arr
    return out


def _clone_structure(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _clone_structure(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_clone_structure(v) for v in tree]
    return tree
