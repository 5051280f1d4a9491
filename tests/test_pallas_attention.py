"""Pallas fused window attention vs the pure-XLA reference path.

Runs in interpreter mode on CPU (the kernel itself targets TPU)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from hrfuser_tpu.layers.attention import _window_attention
from hrfuser_tpu.ops.pallas_attention import fused_window_attention

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier


def _reference(x, y, wq, wk, wv, wo, bq, bk, bv, bo, bias, h):
    q = x @ wq + bq
    k = y @ wk + bk
    v = y @ wv + bv
    scale = (x.shape[-1] // h) ** -0.5
    out = _window_attention(q, k, v, h, bias, scale)
    return out @ wo + bo


def test_fused_matches_reference_self_attention():
    rng = np.random.default_rng(0)
    w, n, c, h = 10, 49, 32, 2
    x = jnp.asarray(rng.normal(0, 1, (w, n, c)), jnp.float32)
    mats = [jnp.asarray(rng.normal(0, 0.1, (c, c)), jnp.float32)
            for _ in range(4)]
    vecs = [jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
            for _ in range(4)]
    bias = jnp.asarray(rng.normal(0, 0.5, (h, n, n)), jnp.float32)

    got = fused_window_attention(x, x, *mats, *vecs, bias, num_heads=h,
                                 block_windows=4, interpret=True)
    want = _reference(x, x, *mats, *vecs, bias, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fused_cross_attention_and_padding():
    rng = np.random.default_rng(1)
    w, n, c, h = 7, 49, 16, 1          # w not divisible by block
    x = jnp.asarray(rng.normal(0, 1, (w, n, c)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 1, (w, n, c)), jnp.float32)
    mats = [jnp.asarray(rng.normal(0, 0.1, (c, c)), jnp.float32)
            for _ in range(4)]
    vecs = [jnp.zeros((c,), jnp.float32) for _ in range(4)]
    bias = jnp.zeros((h, n, n), jnp.float32)
    got = fused_window_attention(x, y, *mats, *vecs, bias, num_heads=h,
                                 block_windows=4, interpret=True)
    want = _reference(x, y, *mats, *vecs, bias, h)
    assert got.shape == (w, n, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
