"""Official-format checkpoint remap proven on a real architecture.

The real official checkpoints cannot be downloaded offline, so these tests
*reconstruct* the official `model.{idx}.` key format from the torch reference
model with seeded random weights (inverting the index tables of
reference keymap.py:6-31), then push it through `torch_sd_to_params(
official=True)` and demand forward parity — exercising keymap translation,
OIHW->HWIO, and (in the fused variant) the RepVGGDW zero-conv1/identity-BN
synthesis pass on a real model rather than fake key dicts
(reference: models/yolov10/remap.py:34-49, keymap.py:45-51).
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available
from test_parity_reference import MAX_ABS, _build_reference_model

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

# Lean module prefix -> official model.{idx}. prefix (inverse of our keymap).
_LEAN_TO_OFFICIAL = {
    "backbone.cv0": 0,
    "backbone.cv1": 1,
    "backbone.c2": 2,
    "backbone.cv3": 3,
    "backbone.c4": 4,
    "backbone.sc5": 5,
    "backbone.c6": 6,
    "backbone.sc7": 7,
    "backbone.c8": 8,
    "backbone.sppf9": 9,
    "backbone.psa10": 10,
    "neck.p5_p4_c2f": 13,
    "neck.p4_p3_c2f": 16,
    "neck.p3_down": 17,
    "neck.p3_p4_c2f": 19,
    "neck.p4_down": 20,
    "neck.p4_p5_c2f": 22,
    "head": 23,
}


def _lean_key_to_official(key: str):
    for prefix, idx in _LEAN_TO_OFFICIAL.items():
        if key.startswith(prefix + "."):
            return f"model.{idx}." + key[len(prefix) + 1 :]
    return None  # norm buffers / dfl.bins: not present in official ckpts


def _official_sd_from_reference(ref_model) -> dict:
    sd = {}
    for k, v in ref_model.state_dict().items():
        ok = _lean_key_to_official(k)
        if ok is not None:
            sd[ok] = v.detach().clone()
    return sd


def _fuse_repvggdw_keys(sd: dict, eps: float = 1e-3) -> tuple[dict, int]:
    """Rewrite unfused RepVGGDW branches into the fused official layout.

    Unfused: cv1.2.conv.{conv.weight,bn.*} (7x7 DW) + cv1.2.conv1.{conv.weight,bn.*}
    (3x3 DW). Fused ckpts store one merged 7x7 DW conv as cv1.2.conv.weight
    plus cv1.2.bn.* and drop conv1 entirely. We fold each branch's BN into
    its conv, sum the (padded) kernels, and emit an identity-like BN that
    carries the combined bias, so the fused form is numerically equivalent.
    """
    import torch

    out = dict(sd)
    bases = sorted(
        k[: -len(".conv.conv.weight")]
        for k in sd
        if k.endswith(".cv1.2.conv.conv.weight")
    )
    for base in bases:
        merged = None
        bias_total = None
        for branch, pad in (("conv", 0), ("conv1", 2)):
            w = out.pop(f"{base}.{branch}.conv.weight")
            g = out.pop(f"{base}.{branch}.bn.weight")
            b = out.pop(f"{base}.{branch}.bn.bias")
            m = out.pop(f"{base}.{branch}.bn.running_mean")
            v = out.pop(f"{base}.{branch}.bn.running_var")
            out.pop(f"{base}.{branch}.bn.num_batches_tracked", None)
            scale = g / torch.sqrt(v + eps)
            wf = w * scale.reshape(-1, 1, 1, 1)
            bf = b - m * scale
            if pad:
                wf = torch.nn.functional.pad(wf, (pad, pad, pad, pad))
            merged = wf if merged is None else merged + wf
            bias_total = bf if bias_total is None else bias_total + bf
        c = merged.shape[0]
        out[f"{base}.conv.weight"] = merged
        # BN(y) = (y - 0)/sqrt((1-eps)+eps) * 1 + bias_total = y + bias_total
        out[f"{base}.bn.weight"] = torch.ones(c)
        out[f"{base}.bn.bias"] = bias_total
        out[f"{base}.bn.running_mean"] = torch.zeros(c)
        out[f"{base}.bn.running_var"] = torch.full((c,), 1.0 - eps)
    return out, len(bases)


def _convert_official(sd, name: str, nc: int = 80):
    import jax

    from leanyolo_tpu.models.yolov10.config import VARIANTS
    from leanyolo_tpu.models.yolov10.model import model_init
    from leanyolo_tpu.models.yolov10.remap import torch_sd_to_params

    cfg = VARIANTS[name]
    template = model_init(jax.random.PRNGKey(1), cfg, nc)
    return cfg, torch_sd_to_params(sd, template, official=True, strict=False)


def _assert_forward_parity(ref_model, cfg, params, tol=MAX_ABS):
    import jax
    import jax.numpy as jnp
    import torch

    from leanyolo_tpu.models.yolov10.model import model_apply

    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 320, 320).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x))
    fwd = jax.jit(lambda p, xx: model_apply(p, xx, cfg, precision=jax.lax.Precision.HIGHEST))
    out = fwd(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for lvl in range(3):
        got = np.asarray(out["one2many"][lvl]).transpose(0, 3, 1, 2)
        want = ref_out[lvl].numpy()
        assert got.shape == want.shape
        max_abs = np.abs(got - want).max()
        assert max_abs < tol, f"one2many P{lvl+3} max_abs={max_abs}"


def test_official_unfused_checkpoint_full_parity():
    """model.{idx}.-format (unfused) ckpt loads with zero missing leaves and
    reproduces the reference forward."""
    name = "yolov10s"
    ref = _build_reference_model(name, seed=11)
    sd = _official_sd_from_reference(ref)
    assert all(k.startswith("model.") for k in sd)

    cfg, (params, stats) = _convert_official(sd, name)
    # Norm buffers aren't in official ckpts; the registry sets them. Fill them
    # here to match the reference model built with sub=0/div=1.
    params["input_subtract"] = np.zeros(3, np.float32)
    params["input_divide"] = np.ones(3, np.float32)
    missing = [m for m in stats["missing"] if not m.startswith("input_")]
    assert not missing, missing[:8]
    assert not stats["unused_src"], stats["unused_src"][:8]
    assert not stats["synthesized"]
    _assert_forward_parity(ref, cfg, params)


@pytest.mark.parametrize("name", ["yolov10s", "yolov10x"])
def test_official_fused_repvggdw_checkpoint_parity(name):
    """Fused-RepVGGDW official layout: pass-2 synthesis must fire for every
    conv1 branch and the forward must still match the (unfused) reference.

    yolov10s covers use_lk_c8 + lk_p4_p5; yolov10x covers the c6=C2fCIB path
    (no lk -> no fused blocks there, but s has them).
    """
    ref = _build_reference_model(name, seed=23)
    sd = _official_sd_from_reference(ref)
    fused_sd, n_fused = _fuse_repvggdw_keys(sd)
    cfg, (params, stats) = _convert_official(fused_sd, name)
    params["input_subtract"] = np.zeros(3, np.float32)
    params["input_divide"] = np.ones(3, np.float32)

    if name == "yolov10s":
        assert n_fused > 0
    missing = [m for m in stats["missing"] if not m.startswith("input_")]
    assert not missing, missing[:8]
    # Every fused block must synthesize exactly 6 conv1 leaves (w + 5 bn... w,
    # scale, bias, mean, var = 5) — count blocks instead of leaves.
    synth_blocks = {s.split(".conv1.")[0] for s in stats["synthesized"]}
    assert len(synth_blocks) == n_fused, (len(synth_blocks), n_fused)
    assert not stats["shape_filled"], stats["shape_filled"][:8]
    # BN folding in fp32 introduces ~1e-5 noise; keep the fidelity budget.
    _assert_forward_parity(ref, cfg, params, tol=MAX_ABS)


def test_official_shape_fill_pass_fires():
    """Pass 3 (in-order shape fill) on a real architecture: rename a key so
    name matching fails but shape matching succeeds."""
    name = "yolov10n"
    ref = _build_reference_model(name, seed=5)
    sd = _official_sd_from_reference(ref)
    # Official ckpts sometimes carry stray prefixes; simulate one mismatched
    # key that only shape-fill can place. cv0 conv weight [16,3,3,3] is
    # unique in shape for n.
    w = sd.pop("model.0.conv.weight")
    sd["model.0.conv.weight_oddname"] = w  # keymap translates the prefix; leaf name unknown

    cfg, (params, stats) = _convert_official(sd, name)
    params["input_subtract"] = np.zeros(3, np.float32)
    params["input_divide"] = np.ones(3, np.float32)
    missing = [m for m in stats["missing"] if not m.startswith("input_")]
    assert not missing, missing[:8]
    assert stats["shape_filled"] == ["backbone.cv0.conv.weight"]
    _assert_forward_parity(ref, cfg, params)
