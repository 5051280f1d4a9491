"""Slab window attention == windowed attention (same params, same math).

The slab formulation (`ops/window.py:slab_partition` +
`expand_window_bias`, `layers/attention.py:attn_mode='slab'`) computes
each window-row as one [T, T] masked matmul instead of per-window
[49, 49] batched dots behind 6-D partition transposes. It must be
numerically equivalent to the windowed path up to f32 reduction order —
the masked cross-window logits are exactly -1e9 before softmax.
Reference semantics being preserved: `LocalWindowSelfAttention`
(ref mmdet/models/backbones/hrformer.py:120-236, no pad mask) and
`WindowMCA` (hrfuser_hrformer_based.py:21-130).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrfuser_tpu.layers.attention import (HRFormerBlock,
                                          LocalWindowSelfAttention,
                                          MultiWindowCrossAttention)


def _x(rng, shape):
    return jnp.asarray(rng.normal(0, 1, shape), jnp.float32)


@pytest.mark.parametrize('layout', ['nhwc', 'cf'])
@pytest.mark.parametrize('hw', [(10, 18), (14, 14), (7, 7)])
def test_lsa_slab_matches_windowed(layout, hw):
    """Non-multiple-of-7 sizes exercise the center-pad ring: padded
    tokens attend inside their window in BOTH paths (no pad mask)."""
    rng = np.random.default_rng(0)
    h, w, c = *hw, 16
    x = _x(rng, (2, h, w, c))
    if layout == 'cf':
        x = x.transpose(0, 3, 1, 2)
    win = LocalWindowSelfAttention(num_heads=2, layout=layout,
                                   attn_mode='windowed')
    slab = LocalWindowSelfAttention(num_heads=2, layout=layout,
                                    attn_mode='slab')
    vs = win.init(jax.random.PRNGKey(0), x)
    a = win.apply(vs, x)
    b = slab.apply(vs, x)                  # identical params by name
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize('layout', ['nhwc', 'cf'])
def test_mwca_slab_matches_windowed(layout):
    rng = np.random.default_rng(1)
    h, w, c = 10, 18, 16
    x = _x(rng, (2, h, w, c))
    y = _x(rng, (2, h, w, c))
    if layout == 'cf':
        x, y = x.transpose(0, 3, 1, 2), y.transpose(0, 3, 1, 2)
    win = MultiWindowCrossAttention(num_heads=2, layout=layout,
                                    attn_mode='windowed')
    slab = MultiWindowCrossAttention(num_heads=2, layout=layout,
                                     attn_mode='slab')
    vs = win.init(jax.random.PRNGKey(0), x, y)
    a = win.apply(vs, x, y)
    b = slab.apply(vs, x, y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_lsa_slab_no_rpe_mask_only():
    """with_rpe=False exercises the bias=None branch of
    expand_window_bias (pure -1e9 cross-window mask)."""
    rng = np.random.default_rng(2)
    x = _x(rng, (1, 9, 11, 8))
    win = LocalWindowSelfAttention(num_heads=1, with_rpe=False,
                                   attn_mode='windowed')
    slab = LocalWindowSelfAttention(num_heads=1, with_rpe=False,
                                    attn_mode='slab')
    vs = win.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(win.apply(vs, x)),
                               np.asarray(slab.apply(vs, x)),
                               atol=2e-5, rtol=2e-5)


def test_hrformer_block_slab_matches_windowed():
    """Full block (LN + LSA + residual + CrossFFN): the attn_mode knob
    must not touch anything outside the attention core."""
    rng = np.random.default_rng(3)
    x = _x(rng, (2, 10, 18, 16))
    win = HRFormerBlock(num_heads=2, attn_mode='windowed')
    slab = HRFormerBlock(num_heads=2, attn_mode='slab')
    vs = win.init(jax.random.PRNGKey(0), x, False)
    a = win.apply(vs, x, False)
    b = slab.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-5, rtol=5e-5)
