"""Fused Pallas stem kernel parity vs the XLA conv path (interpret mode on CPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # probe quarantined under experiments/
import numpy as np
import pytest


def test_fused_stem_matches_xla():
    import jax
    import jax.numpy as jnp

    from stem_pallas import fused_stem, prepare_stem_params

    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    w0 = (rng.randn(3, 3, 3, 16) * 0.1).astype(np.float32)
    b0 = (rng.randn(16) * 0.1).astype(np.float32)
    w1 = (rng.randn(3, 3, 16, 32) * 0.05).astype(np.float32)
    b1 = (rng.randn(32) * 0.1).astype(np.float32)
    sub = np.asarray([1.0, 2.0, 3.0], np.float32)
    div = np.full(3, 255.0, np.float32)

    params = prepare_stem_params(w0, b0, w1, b1, input_subtract=sub, input_divide=div)
    interpret = jax.default_backend() != "tpu"
    got = np.asarray(fused_stem(jnp.asarray(img), params, t1=8, w1t=16, interpret=interpret), np.float32)

    def ref(x):
        x = ((x - sub) / div).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w0, jnp.bfloat16), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32,
        )
        y = y + b0
        y = y * jax.nn.sigmoid(y)
        y = y.astype(jnp.bfloat16)
        z = jax.lax.conv_general_dilated(
            y, jnp.asarray(w1, jnp.bfloat16), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32,
        )
        z = z + b1
        z = z * jax.nn.sigmoid(z)
        return z.astype(jnp.bfloat16)

    want = np.asarray(jax.jit(ref)(jnp.asarray(img)), np.float32)
    assert got.shape == want.shape == (2, 16, 16, 32)
    assert np.abs(got - want).max() < 5e-3  # bf16 rounding between formulations
