"""YOLOv10 model graph: backbone -> PAN neck -> dual detection head.

Functional re-design of the reference graph
(reference: leanyolo/models/yolov10/backbone.py:42-106, neck.py:49-129,
head.py:52-135, yolov10s.py:61-144). The graph is identical node-for-node;
the implementation is NHWC/JAX and stateless. Train/eval is an explicit
argument (no module mode flag), and the forward ALWAYS produces both the
one2many and one2one branches — on TPU the two branch evaluations fuse into
the same program, and the decode paths pick whichever they need.

Parameter pytrees mirror the torch module tree so that official checkpoints
remap via a pure name table (keymap.py / remap.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from .config import VariantCfg, VARIANTS

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------


def backbone_init(key, cfg: VariantCfg, in_channels: int = 3) -> Params:
    ch, reps, types = cfg.ch, cfg.reps, cfg.types
    ks = jax.random.split(key, 11)
    p: Params = {
        "cv0": L.cba_init(ks[0], in_channels, ch[0], 3),
        "cv1": L.cba_init(ks[1], ch[0], ch[1], 3),
        "c2": L.c2f_init(ks[2], ch[1], ch[2], reps.get(2, 1)),
        "cv3": L.cba_init(ks[3], ch[2], ch[3], 3),
        "c4": L.c2f_init(ks[4], ch[3], ch[4], reps.get(4, 1)),
        "sc5": L.scdown_init(ks[5], ch[4], ch[5]),
        "sc7": L.scdown_init(ks[7], ch[6], ch[7]),
        "sppf9": L.sppf_init(ks[9], ch[8], ch[9]),
        "psa10": L.psa_init(ks[10], ch[9]),
    }
    if types.get("c6", "C2f") == "C2fCIB":
        p["c6"] = L.c2fcib_init(ks[6], ch[5], ch[6], reps.get(6, 1), lk=False)
    else:
        p["c6"] = L.c2f_init(ks[6], ch[5], ch[6], reps.get(6, 1))
    if types.get("c8", "C2f") == "C2fCIB":
        p["c8"] = L.c2fcib_init(ks[8], ch[7], ch[8], reps.get(8, 1), lk=cfg.use_lk_c8)
    else:
        p["c8"] = L.c2f_init(ks[8], ch[7], ch[8], reps.get(8, 1))
    return p


def backbone_apply(p: Params, x: jnp.ndarray, cfg: VariantCfg, *, train=False, stats=None, precision=None):
    """11-node backbone; returns (C3, C4, C5) at strides (8, 16, 32).

    Parity: leanyolo/models/yolov10/backbone.py:88-106.
    """
    kw = dict(train=train, stats=stats, precision=precision)
    types = cfg.types
    x = L.cba_apply(p["cv0"], x, stride=2, scope="backbone/cv0", **kw)
    x = L.cba_apply(p["cv1"], x, stride=2, scope="backbone/cv1", **kw)
    x = L.c2f_apply(p["c2"], x, shortcut=True, scope="backbone/c2", **kw)
    x = L.cba_apply(p["cv3"], x, stride=2, scope="backbone/cv3", **kw)
    c3 = L.c2f_apply(p["c4"], x, shortcut=True, scope="backbone/c4", **kw)
    x = L.scdown_apply(p["sc5"], c3, scope="backbone/sc5", **kw)
    if types.get("c6", "C2f") == "C2fCIB":
        c4 = L.c2fcib_apply(p["c6"], x, shortcut=True, lk=False, scope="backbone/c6", **kw)
    else:
        c4 = L.c2f_apply(p["c6"], x, shortcut=True, scope="backbone/c6", **kw)
    x = L.scdown_apply(p["sc7"], c4, scope="backbone/sc7", **kw)
    if types.get("c8", "C2f") == "C2fCIB":
        x = L.c2fcib_apply(p["c8"], x, shortcut=True, lk=cfg.use_lk_c8, scope="backbone/c8", **kw)
    else:
        x = L.c2f_apply(p["c8"], x, shortcut=True, scope="backbone/c8", **kw)
    x = L.sppf_apply(p["sppf9"], x, scope="backbone/sppf9", **kw)
    c5 = L.psa_apply(p["psa10"], x, scope="backbone/psa10", **kw)
    return c3, c4, c5


# ---------------------------------------------------------------------------
# Neck (PAN-FPN)
# ---------------------------------------------------------------------------


def neck_init(key, cfg: VariantCfg) -> Params:
    c3, c4, c5 = cfg.backbone_out
    hch, reps, types = cfg.hch, cfg.reps, cfg.types
    ks = jax.random.split(key, 6)
    p: Params = {}
    if types.get("p5_p4", "C2f") == "C2fCIB":
        p["p5_p4_c2f"] = L.c2fcib_init(ks[0], c5 + c4, hch[13], reps.get(13, 1), lk=cfg.use_lk_p5_p4)
    else:
        p["p5_p4_c2f"] = L.c2f_init(ks[0], c5 + c4, hch[13], reps.get(13, 1))
    p["p4_p3_c2f"] = L.c2f_init(ks[1], hch[13] + c3, hch[16], reps.get(16, 1))
    p["p3_down"] = L.cba_init(ks[2], hch[16], hch[16], 3)
    if types.get("p3_p4", "C2f") == "C2fCIB":
        p["p3_p4_c2f"] = L.c2fcib_init(ks[3], hch[16] + hch[13], hch[19], reps.get(19, 1), lk=False)
    else:
        p["p3_p4_c2f"] = L.c2f_init(ks[3], hch[16] + hch[13], hch[19], reps.get(19, 1))
    p["p4_down"] = L.scdown_init(ks[4], hch[19], hch[19])
    p["p4_p5_c2f"] = L.c2fcib_init(ks[5], hch[19] + c5, hch[22], reps.get(22, 1), lk=cfg.use_lk_p4_p5)
    return p


def neck_apply(p: Params, c3, c4, c5, cfg: VariantCfg, *, train=False, stats=None, precision=None):
    """Top-down + bottom-up fusion; plain-C2f merges use shortcut=False.

    Parity: leanyolo/models/yolov10/neck.py:102-129 (incl. the shortcut
    asymmetry between C2f and C2fCIB merge nodes at neck.py:85-98).
    """
    kw = dict(train=train, stats=stats, precision=precision)
    types = cfg.types

    # Top-down merges pass (low-res, lateral) tuples: the upsample+concat
    # distributes into the C2f's 1x1 cv1 (cba_apply_upcat) so the x2
    # upsampled tensors never materialize.
    if types.get("p5_p4", "C2f") == "C2fCIB":
        p4 = L.c2fcib_apply(p["p5_p4_c2f"], (c5, c4), shortcut=True, lk=cfg.use_lk_p5_p4, scope="neck/p5_p4_c2f", **kw)
    else:
        p4 = L.c2f_apply(p["p5_p4_c2f"], (c5, c4), shortcut=False, scope="neck/p5_p4_c2f", **kw)

    p3 = L.c2f_apply(p["p4_p3_c2f"], (p4, c3), shortcut=False, scope="neck/p4_p3_c2f", **kw)

    down3 = L.cba_apply(p["p3_down"], p3, stride=2, scope="neck/p3_down", **kw)
    cat43 = jnp.concatenate([down3, p4], axis=-1)
    if types.get("p3_p4", "C2f") == "C2fCIB":
        p4 = L.c2fcib_apply(p["p3_p4_c2f"], cat43, shortcut=True, lk=False, scope="neck/p3_p4_c2f", **kw)
    else:
        p4 = L.c2f_apply(p["p3_p4_c2f"], cat43, shortcut=False, scope="neck/p3_p4_c2f", **kw)

    down4 = L.scdown_apply(p["p4_down"], p4, scope="neck/p4_down", **kw)
    p5 = L.c2fcib_apply(
        p["p4_p5_c2f"], jnp.concatenate([down4, c5], axis=-1), shortcut=True, lk=cfg.use_lk_p4_p5, scope="neck/p4_p5_c2f", **kw
    )
    return p3, p4, p5


# ---------------------------------------------------------------------------
# Detection head (dual one2many / one2one branches)
# ---------------------------------------------------------------------------


def head_branch_channels(nc: int, ch: Sequence[int], reg_max: int) -> Tuple[int, int]:
    """(c2, c3) intermediate widths (reference head.py:83-84)."""
    c2 = max(16, ch[0] // 4, reg_max * 4)
    c3 = max(ch[0], min(nc, 100))
    return c2, c3


def _head_level_init(key, c_in: int, nc: int, c2: int, c3: int, reg_max: int) -> Tuple[Params, Params]:
    """One pyramid level's (reg branch, cls branch) params."""
    ks = jax.random.split(key, 8)
    reg = {
        "0": L.cba_init(ks[0], c_in, c2, 3),
        "1": L.cba_init(ks[1], c2, c2, 3),
        "2": L.conv_init(ks[2], c2, 4 * reg_max, 1, bias=True),
    }
    cls = {
        "0": {
            "0": L.cba_init(ks[3], c_in, c_in, 3, groups=c_in),
            "1": L.cba_init(ks[4], c_in, c3, 1),
        },
        "1": {
            "0": L.cba_init(ks[5], c3, c3, 3, groups=c3),
            "1": L.cba_init(ks[6], c3, c3, 1),
        },
        "2": L.conv_init(ks[7], c3, nc, 1, bias=True),
    }
    return reg, cls


def head_init(key, nc: int, ch: Sequence[int], reg_max: int = 16) -> Params:
    c2, c3 = head_branch_channels(nc, ch, reg_max)
    ks = jax.random.split(key, len(ch))
    cv2, cv3 = [], []
    for i, c_in in enumerate(ch):
        reg, cls = _head_level_init(ks[i], c_in, nc, c2, c3, reg_max)
        cv2.append(reg)
        cv3.append(cls)
    # one2one branches start as exact copies (reference head.py:112-114).
    # Deep-copied buffers (not aliases) so argument donation stays legal.
    copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), t)
    return {
        "cv2": cv2,
        "cv3": cv3,
        "one2one_cv2": copy(cv2),
        "one2one_cv3": copy(cv3),
    }


def _head_level_apply(
    reg_p: Params,
    cls_p: Params,
    x: jnp.ndarray,
    *,
    train=False,
    stats=None,
    reg_scope="",
    cls_scope="",
    precision=None,
    concat=True,
) -> jnp.ndarray:
    kw = dict(train=train, stats=stats, precision=precision)
    r = L.cba_apply(reg_p["0"], x, scope=f"{reg_scope}/0", **kw)
    r = L.cba_apply(reg_p["1"], r, scope=f"{reg_scope}/1", **kw)
    r = L.conv2d(r, reg_p["2"]["w"], precision=precision) + reg_p["2"]["b"].astype(x.dtype)

    cin = x.shape[-1]
    c = L.cba_apply(cls_p["0"]["0"], x, groups=cin, scope=f"{cls_scope}/0/0", **kw)
    c = L.cba_apply(cls_p["0"]["1"], c, scope=f"{cls_scope}/0/1", **kw)
    cc = c.shape[-1]
    c = L.cba_apply(cls_p["1"]["0"], c, groups=cc, scope=f"{cls_scope}/1/0", **kw)
    c = L.cba_apply(cls_p["1"]["1"], c, scope=f"{cls_scope}/1/1", **kw)
    c = L.conv2d(c, cls_p["2"]["w"], precision=precision) + cls_p["2"]["b"].astype(x.dtype)
    if not concat:
        return r, c
    return jnp.concatenate([r, c], axis=-1)


def head_apply(
    p: Params,
    feats: Sequence[jnp.ndarray],
    *,
    branch: str,
    train=False,
    stats=None,
    precision=None,
    concat=True,
) -> List[jnp.ndarray]:
    """Run one branch ('one2many' or 'one2one') over the pyramid.

    Returns per-level NHWC maps [B, H, W, 4*reg_max + nc]
    (reference head.py:118-135; channel-last instead of channel-first).
    With concat=False, per-level (reg [B,H,W,4*reg_max], cls [B,H,W,nc])
    tuples instead — the serving decode consumes them separately, so the
    concat write never happens.
    """
    if branch == "one2many":
        cv2, cv3, reg_name, cls_name = p["cv2"], p["cv3"], "cv2", "cv3"
    elif branch == "one2one":
        cv2, cv3, reg_name, cls_name = p["one2one_cv2"], p["one2one_cv3"], "one2one_cv2", "one2one_cv3"
    else:
        raise ValueError(f"unknown head branch: {branch}")
    out = []
    for i, x in enumerate(feats):
        out.append(
            _head_level_apply(
                cv2[i],
                cv3[i],
                x,
                train=train,
                stats=stats,
                reg_scope=f"head/{reg_name}/{i}",
                cls_scope=f"head/{cls_name}/{i}",
                precision=precision,
                concat=concat,
            )
        )
    return out


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def model_init(key, cfg: VariantCfg, nc: int, in_channels: int = 3,
               input_norm_subtract=(0.0, 0.0, 0.0), input_norm_divide=(255.0, 255.0, 255.0)) -> Params:
    kb, kn, kh = jax.random.split(key, 3)
    return {
        "backbone": backbone_init(kb, cfg, in_channels),
        "neck": neck_init(kn, cfg),
        "head": head_init(kh, nc, cfg.neck_out, cfg.reg_max),
        # Normalization buffers live in the tree like the reference's
        # registered buffers (yolov10s.py:72-77), stored as flat [C].
        "input_subtract": jnp.asarray(input_norm_subtract, jnp.float32).reshape(in_channels),
        "input_divide": jnp.asarray(input_norm_divide, jnp.float32).reshape(in_channels),
    }


def model_apply(
    params: Params,
    x: jnp.ndarray,
    cfg: VariantCfg,
    *,
    train: bool = False,
    stats: Optional[L.BNStats] = None,
    precision=None,
    branches: Tuple[str, ...] = ("one2many", "one2one"),
    normalize: bool = True,
    concat_head: bool = True,
    constrain=None,
) -> Dict[str, List[jnp.ndarray]]:
    """Normalize -> backbone -> neck -> head; returns raw branch pyramids.

    Args:
        x: [B, H, W, C] image batch (NHWC). Values in whatever range the
           normalization buffers expect (default raw [0, 255]).
        train: batch-stats BN + returns both branches for the dual loss.
        branches: which head branches to compute (both by default; decode
           paths slice what they need — making mode explicit instead of the
           reference's module-state caching at yolov10s.py:118-122).
        normalize: set False when normalization is folded into conv0
           (fold.py) — the identity (x-0)/1 otherwise still costs a
           full-resolution elementwise pass plus a layout copy.
        concat_head: False returns per-level (reg, cls) tuples (see
           head_apply), skipping the 4*reg_max+nc concat write.
        constrain: optional fn(NHWC tensor) -> tensor applied at the
           backbone/neck stage boundaries. Used for sharding annotations
           (e.g. lax.with_sharding_constraint keeping H split over a
           `space` mesh axis for spatially-partitioned inference) — GSPMD
           propagates the layout through the stages between anchors.

    Returns:
        {branch: [P3, P4, P5]} NHWC maps with 4*reg_max+nc channels
        (or (reg, cls) tuples with concat_head=False).
    """
    if normalize:
        sub = params["input_subtract"].astype(x.dtype)
        div = params["input_divide"].astype(x.dtype)
        x = (x - sub) / div
    c3, c4, c5 = backbone_apply(params["backbone"], x, cfg, train=train, stats=stats, precision=precision)
    if constrain is not None:
        c3, c4, c5 = constrain(c3), constrain(c4), constrain(c5)
    p3, p4, p5 = neck_apply(params["neck"], c3, c4, c5, cfg, train=train, stats=stats, precision=precision)
    if constrain is not None:
        p3, p4, p5 = constrain(p3), constrain(p4), constrain(p5)
    out = {}
    for b in branches:
        out[b] = head_apply(
            params["head"], (p3, p4, p5), branch=b, train=train, stats=stats,
            precision=precision, concat=concat_head,
        )
    return out


@dataclass
class YOLOv10:
    """Convenience wrapper bundling cfg + class names + params.

    The pure functions above are the real API (use them under jit/pjit);
    this class mirrors the reference's model-object ergonomics
    (reference: yolov10s.py:61-144) for tools and interactive use.
    """

    cfg: VariantCfg
    class_names: List[str]
    params: Params

    @property
    def nc(self) -> int:
        return len(self.class_names)

    @classmethod
    def create(
        cls,
        name: str,
        *,
        class_names: Sequence[str],
        input_norm_subtract=(0.0, 0.0, 0.0),
        input_norm_divide=(255.0, 255.0, 255.0),
        seed: int = 0,
    ) -> "YOLOv10":
        cfg = VARIANTS[name]
        params = model_init(
            jax.random.PRNGKey(seed), cfg, len(class_names),
            input_norm_subtract=input_norm_subtract, input_norm_divide=input_norm_divide,
        )
        return cls(cfg=cfg, class_names=list(class_names), params=params)

    def __call__(self, x: jnp.ndarray, *, train: bool = False, precision=None) -> Dict[str, List[jnp.ndarray]]:
        return model_apply(self.params, x, self.cfg, train=train, precision=precision)

    def decode_forward(self, raw: Dict[str, List[jnp.ndarray]], *, max_det: int = 300) -> jnp.ndarray:
        """Official NMS-free top-k decode of the one2one branch.

        Returns [B, k, 6] = [x1, y1, x2, y2, score, cls]
        (reference: yolov10s.py:124-144).
        """
        from .decode import decode_topk

        seq = raw["one2one"] if isinstance(raw, dict) else raw
        return decode_topk(seq, num_classes=self.nc, strides=self.cfg.strides, max_det=max_det)
