"""Training-dynamics parity vs the torch reference oracle.

Forward parity (test_parity_reference.py), loss-value parity
(test_losses_parity.py) and loss-gradient parity (test_grad_parity.py)
still leave three places where training could silently diverge from the
reference: d(loss)/d(params) through the full network (BN batch-stat
backward, the dual-branch head), the BN running-stat update rule
(momentum 0.03, unbiased running var — reference layers.py:80-88 semantics
via torch.nn.BatchNorm2d), and the optimizer/schedule math (AdamW +
clip_grad_norm_, warmup->cosine LambdaLR; reference
tools/transfer_learn_aquarium.py:417-435, 459-465). Each gets a direct
oracle test here.
"""

import math
import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available
from test_parity_reference import _build_reference_model, _convert_to_jax

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _synth_batch(rng, b=2, img=64, n_gt=3, nc=80):
    x = rng.randn(b, 3, img, img).astype(np.float32)
    targets = []
    for _ in range(b):
        xy = rng.uniform(0, img - 12, (n_gt, 2)).astype(np.float32)
        wh = rng.uniform(6, img / 2, (n_gt, 2)).astype(np.float32)
        boxes = np.concatenate([xy, np.minimum(xy + wh, img)], axis=1)
        labels = rng.randint(0, nc, (n_gt,))
        targets.append({"boxes": boxes, "labels": labels})
    return x, targets


def _remap_like_params(ref_model, value_sd, nc=80, name="yolov10n"):
    """Push an arbitrary {state_dict key: tensor} dict through the same
    remap as the weights (pure name/layout mapping, so it is equally valid
    for gradients or 0/1 markers)."""
    import jax

    from leanyolo_tpu.models.yolov10.config import VARIANTS
    from leanyolo_tpu.models.yolov10.model import model_init
    from leanyolo_tpu.models.yolov10.remap import torch_sd_to_params

    template = model_init(jax.random.PRNGKey(1), VARIANTS[name], nc)
    sd = {k: v for k, v in value_sd.items() if k != "head.dfl.bins"}
    params, stats = torch_sd_to_params(sd, template, official=False, strict=True)
    assert not stats["missing"] and not stats["unused_src"]
    return params


def test_param_grad_parity_yolov10n():
    """d(total loss)/d(every trainable parameter) matches torch autograd
    through the train-mode forward (BN batch stats) and the dual TAL loss."""
    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, REFERENCE_ROOT)
    from leanyolo.models.yolov10.losses import detection_loss_v10 as ref_loss

    from leanyolo_tpu.models.yolov10.losses import build_padded_targets, detection_loss_v10
    from leanyolo_tpu.models.yolov10.model import model_apply
    from leanyolo_tpu.models.yolov10.remap import flatten_param_paths

    nc = 80
    ref = _build_reference_model("yolov10n", nc=nc)
    cfg, params = _convert_to_jax(ref, "yolov10n", nc=nc)

    rng = np.random.RandomState(11)
    x, targets = _synth_batch(rng)

    # -- torch side ----------------------------------------------------------
    ref.train()
    tt = [
        {
            "boxes": torch.from_numpy(t["boxes"]),
            "labels": torch.from_numpy(t["labels"]).long(),
        }
        for t in targets
    ]
    raw = ref(torch.from_numpy(x))
    loss = ref_loss(raw, tt, num_classes=nc)["total"]
    ref.zero_grad()
    loss.backward()

    named_params = dict(ref.named_parameters())
    base_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    grad_sd, mark_sd = {}, {}
    for k, v in base_sd.items():
        p = named_params.get(k)
        if p is not None and p.grad is not None:
            grad_sd[k] = p.grad.detach().clone()
            mark_sd[k] = torch.ones_like(v, dtype=torch.float32)
        else:
            grad_sd[k] = torch.zeros_like(v, dtype=torch.float32)
            mark_sd[k] = torch.zeros_like(v, dtype=torch.float32)
    g_ref = _remap_like_params(ref, grad_sd, nc=nc)
    mask = _remap_like_params(ref, mark_sd, nc=nc)

    # -- jax side ------------------------------------------------------------
    gl, gb, gm = build_padded_targets(targets, max_boxes=4)
    gl, gb, gm = jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    def total(p):
        raw = model_apply(p, xj, cfg, train=True, precision=jax.lax.Precision.HIGHEST)
        return detection_loss_v10(raw, gl, gb, gm, num_classes=nc)["total"]

    grads = jax.grad(total)(params)

    leaves = []
    for path, g_want in flatten_param_paths(g_ref):
        m = mask
        g = grads
        for key in path:
            m = m[key]
            g = g[key]
        m = np.asarray(m)
        if not np.any(m):
            continue  # buffer (running stats / norm constants): torch has no grad
        leaves.append((path, np.asarray(g, np.float64) * m, np.asarray(g_want, np.float64) * m))
    assert len(leaves) > 100, f"only {len(leaves)} parameter leaves compared"

    # Deep BN biases have near-zero gradients where f32 reduction-order noise
    # (ours one-pass sum/sumsq, torch two-pass) dominates any per-leaf
    # relative measure — anchor the absolute floor to the global grad scale.
    gscale = max(float(np.max(np.abs(gw))) for _, _, gw in leaves)
    for path, g, g_want in leaves:
        np.testing.assert_allclose(
            g, g_want, rtol=5e-3, atol=1e-3 * gscale,
            err_msg=f"param grad mismatch at {'/'.join(map(str, path))}",
        )


def test_bn_running_stats_update_parity():
    """Two train-mode forwards update every BN running mean/var exactly like
    torch (momentum 0.03, eps 1e-3, unbiased running var)."""
    import jax
    import jax.numpy as jnp
    import torch

    nc = 80
    ref = _build_reference_model("yolov10n", nc=nc)
    cfg, params = _convert_to_jax(ref, "yolov10n", nc=nc)

    from leanyolo_tpu.models.yolov10.layers import BNStats, merge_bn_stats
    from leanyolo_tpu.models.yolov10.model import model_apply
    from leanyolo_tpu.models.yolov10.remap import flatten_param_paths

    rng = np.random.RandomState(5)
    ref.train()
    for seed in (0, 1):
        x = np.random.RandomState(seed).randn(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref(torch.from_numpy(x))
        stats = BNStats()
        model_apply(
            params,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            cfg,
            train=True,
            stats=stats,
            precision=jax.lax.Precision.HIGHEST,
        )
        params = merge_bn_stats(params, stats.updates)

    want = _remap_like_params(ref, {k: v.detach().clone() for k, v in ref.state_dict().items()}, nc=nc)
    checked = 0
    for path, w in flatten_param_paths(want):
        if len(path) < 2 or path[-2] != "bn" or path[-1] not in ("mean", "var"):
            continue
        g = params
        for key in path:
            g = g[key]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-5,
            err_msg=f"running stat mismatch at {'/'.join(map(str, path))}",
        )
        checked += 1
    assert checked > 50, f"only {checked} BN stat leaves compared"


def test_adamw_clip_step_parity():
    """optax clip_by_global_norm + adamw (the Trainer's group transform)
    reproduces torch clip_grad_norm_ + torch.optim.AdamW over several steps."""
    import jax.numpy as jnp
    import optax
    import torch

    lr, wd, clip = 1e-3, 5e-4, 1.0
    rng = np.random.RandomState(0)
    shapes = [(3, 3, 8, 16), (16,), (1, 1, 16, 4)]
    p0 = [rng.randn(*s).astype(np.float32) for s in shapes]
    grads_per_step = [[rng.randn(*s).astype(np.float32) * (3.0 if t == 1 else 0.3) for s in shapes] for t in range(4)]

    # torch
    tp = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in p0]
    opt = torch.optim.AdamW(tp, lr=lr, weight_decay=wd)
    for gs in grads_per_step:
        for p, g in zip(tp, gs):
            p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_(tp, clip)
        opt.step()
        opt.zero_grad(set_to_none=True)

    # optax (the exact chain Trainer.make_optimizer builds per group)
    tx = optax.chain(optax.clip_by_global_norm(clip), optax.adamw(lr, weight_decay=wd))
    jp = [jnp.asarray(p) for p in p0]
    state = tx.init(jp)
    for gs in grads_per_step:
        updates, state = tx.update([jnp.asarray(g) for g in gs], state, jp)
        jp = optax.apply_updates(jp, updates)

    for a, b in zip(jp, tp):
        np.testing.assert_allclose(np.asarray(a), b.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_warmup_cosine_schedule_parity():
    """Per-epoch LR factors match the reference LambdaLR exactly
    (reference transfer_learn_aquarium.py:427-435)."""
    from leanyolo_tpu.engine.trainer import warmup_cosine_schedule

    for epochs, warmup in ((50, 3), (10, 0), (5, 5), (1, 1), (7, 2)):
        E = max(1, epochs)
        WU = max(0, min(warmup, E))

        def ref_lambda(epoch):
            if WU > 0 and epoch < WU:
                return float(epoch + 1) / float(WU)
            t = (epoch - WU) / max(1, (E - WU))
            return 0.5 * (1.0 + math.cos(math.pi * t))

        lr = 0.01
        steps_per_epoch = 7
        sched = warmup_cosine_schedule(lr, epochs=epochs, warmup_epochs=warmup, steps_per_epoch=steps_per_epoch)
        for epoch in range(epochs):
            for step_in_epoch in (0, steps_per_epoch - 1):
                got = float(sched(epoch * steps_per_epoch + step_in_epoch))
                want = lr * ref_lambda(epoch)
                # f32 cos vs math.cos: semantic parity, f32 precision.
                assert abs(got - want) < 2e-6 * lr + 1e-12, (epochs, warmup, epoch, got, want)
