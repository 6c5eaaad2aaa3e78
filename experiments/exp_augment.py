"""Probe: fuse the train-step augment chain (hflip + jitter + cast).

The bs128 roofline (experiments/roofline_train.py) shows the augment chain
costing ~4.8 ms/step: %rev.56 u8 hflip reverse 2.66 ms at 6.9x its byte
bound (W sits on LANES in the u8 layout {2,1,3,0}, so the reverse is a
lane-dim shuffle), plus the select/jitter fusion and the bf16 relayout copy
into conv0's B-minor layout {0,3,2,1}. One-pass byte floor (read 157 MB u8,
write 315 MB bf16) ~= 1.15 ms.

Key observation: in conv0's preferred layout {0,3,2,1} (minor->major
B,C,W,H) a W-reverse is a block permutation (W is a major dim) and the
per-sample flip/jitter selects are lane-wise (B on lanes) — so ordering the
chain cast -> jitter -> flip should let XLA fuse everything into one
output fusion in the layout conv0 wants. The jitter (per-sample scalars,
elementwise) commutes EXACTLY with the W permutation, so reordering is
bitwise-identical.

Formulations (all validated bitwise vs the current augment_batch):
  A current   — augment_batch as shipped (flip pre-cast on u8)
  B castfirst — y=cast(x); sel=where(bc, clip(y*a+b), y); out=where(f, rev(sel), sel)
  C transposed— same as B but computed in logical [H,W,C,B] with explicit
                u8 transpose in / bf16 transpose out (transposes should be
                layout-only if XLA cooperates)
  D pinned    — B plus with_layout_constraint pinning the result to conv0's
                {0,3,2,1} before the conv

Each leg feeds a conv0-like consumer (3x3 s2 conv + a second full read of
the augmented image, mimicking the wgrad save) inside a chained fori_loop
with host readback (CLAUDE.md measurement rules). A conv-only leg is
subtracted to isolate the chain.

Usage: python experiments/exp_augment.py

RESULT (2026-08-19): B/C are bitwise-identical to A on chip, but the
toy conv-consumer harness below is layout-fragile (two OOMs from XLA
picking C-on-lanes 42.7x-padded layouts for the consumer), so the final
measurement was the REAL train step (bench_train bs128, two samples per
arm): flip-first 603.1/603.8 img/s vs cast-first 600.3/600.1 — the
reorder LOSES ~0.5%. The u8->bf16 layout crossing just moves into the
cast, and the bf16 flip doubles the reverse bytes. Original order kept;
see PERF.md "u8 hflip reverse" ruling.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from leanyolo_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from leanyolo_tpu.engine.trainer import augment_batch

B, H, W, C = 128, 640, 640, 3
P_HFLIP, P_BC = 0.5, 0.5
DT = jnp.bfloat16


def _rands(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    do_flip = jax.random.uniform(k1, (B,)) < P_HFLIP
    do_bc = jax.random.uniform(k2, (B,)) < P_BC
    alpha = (0.8 + 0.4 * jax.random.uniform(k3, (B,))).astype(DT)
    beta = (jax.random.uniform(k4, (B,)) * 32.0 - 16.0).astype(DT)
    return do_flip, do_bc, alpha, beta


def aug_current(x, key):
    boxes = jnp.zeros((B, 1, 4), jnp.float32)
    img, _ = augment_batch(key, x, boxes, p_hflip=P_HFLIP, p_bc=P_BC, dtype=DT)
    return img


def aug_castfirst(x, key):
    do_flip, do_bc, alpha, beta = _rands(key)
    y = x.astype(DT)
    jit_ = jnp.clip(y * alpha[:, None, None, None] + beta[:, None, None, None], 0.0, 255.0)
    sel = jnp.where(do_bc[:, None, None, None], jit_, y)
    return jnp.where(do_flip[:, None, None, None], sel[:, :, ::-1, :], sel)


def aug_transposed(x, key):
    do_flip, do_bc, alpha, beta = _rands(key)
    xt = jnp.transpose(x, (1, 2, 3, 0))  # [H,W,C,B]: B on lanes
    y = xt.astype(DT)
    jit_ = jnp.clip(y * alpha[None, None, None, :] + beta[None, None, None, :], 0.0, 255.0)
    sel = jnp.where(do_bc[None, None, None, :], jit_, y)
    out = jnp.where(do_flip[None, None, None, :], sel[:, ::-1, :, :], sel)
    return jnp.transpose(out, (3, 0, 1, 2))


# D (with_layout_constraint pinning the result to conv0's {0,3,2,1}) was
# dropped: on this jax/axon stack the constrained program returned WRONG
# VALUES (max_abs_err 255 vs the unconstrained bitwise-identical B) — a
# miscompile, not a perf datum. /tmp/aug.log run of 2026-08-19 17:38.

FORMS = {
    "A_current": aug_current,
    "B_castfirst": aug_castfirst,
    "C_transposed": aug_transposed,
}


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (B, H, W, C)), jnp.uint8)
    w0 = jnp.asarray(rng.randn(3, 3, C, 32) * 0.1, DT)
    key = jax.random.PRNGKey(7)

    # --- correctness: bitwise vs A ---
    ref = np.asarray(jax.jit(aug_current)(x, key).astype(jnp.float32))
    for name, fn in FORMS.items():
        if name == "A_current":
            continue
        got = np.asarray(jax.jit(fn)(x, key).astype(jnp.float32))
        print(f"{name}: bitwise_equal={bool((ref == got).all())} "
              f"max_abs_err={float(np.abs(ref - got).max()):.3e}")

    # --- timing: augment + conv0-like consumer, chained, host readback ---
    def make_bench(aug_fn, conv_only=False):
        @jax.jit
        def bench(x, w0, iters):
            def body(i, acc):
                xi = x + (acc * 0).astype(jnp.uint8)
                img = xi.astype(DT) if conv_only else aug_fn(xi, key)
                o = jax.lax.conv_general_dilated(
                    img, w0, window_strides=(2, 2), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                # second full read of img (mimics the wgrad save consumer).
                # NOTE: a strided-slice read here (img[:, ::97, ::89, :])
                # forced XLA to keep img in a {3,0,2,1} layout with 42.7x
                # tile padding (C=3 on lanes) -> 18.75 GB OOM; a full
                # reduction keeps the natural layout.
                r2 = jnp.sum(img.astype(jnp.float32))
                return acc + jnp.float32(o[0, 0, 0, 0]) + r2 * 0
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return bench

    legs = [("conv_only", make_bench(None, conv_only=True))]
    legs += [(name, make_bench(fn)) for name, fn in FORMS.items()]

    base = None
    for name, fn in legs:
        fn(x, w0, 2).block_until_ready()
        n = 30
        t0 = time.perf_counter()
        fn(x, w0, n).block_until_ready()
        dt = (time.perf_counter() - t0) / n * 1e3
        extra = "" if base is None else f"  chain={dt - base:.3f} ms"
        if name == "conv_only":
            base = dt
        print(f"{name}: {dt:.3f} ms/iter{extra}")


if __name__ == "__main__":
    main()
