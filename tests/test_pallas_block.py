"""Parity: fused Pallas HRFormer/HRFuser block kernels vs the flax path.

Runs the Pallas kernels in interpret mode on CPU against the reference
flax modules (`layers.attention.HRFormerBlock` / `HRFuserFusionBlock`)
in eval mode on the exact branch shapes of HRFuser-T at r640 (including
the center-pad asymmetries: 96x160 pads (1,1)/(0,1), 48x80 pads
(0,1)/(2,2), 12x20 pads (1,1)/(0,1))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrfuser_tpu.layers.attention import HRFormerBlock, HRFuserFusionBlock
from hrfuser_tpu.ops.pallas_block import (fused_cross_ffn,
                                          fused_fusion_block,
                                          fused_hrformer_block)
pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier



def _init_stats(key, model, *args):
    v = model.init(key, *args, True)  # train=True so BN stats exist
    # randomize batch_stats so BN folding is actually exercised
    k1, k2 = jax.random.split(key)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.abs(jax.random.normal(k1, a.shape)) * 0.5 + 0.3,
        v.get('batch_stats', {}))
    return {'params': v['params'], 'batch_stats': bs}


# (H, W, C, heads) — the four HRFuser-T branch shapes (batch kept small)
SHAPES = [(20, 26, 18, 1), (13, 12, 36, 2), (12, 20, 144, 8)]


@pytest.mark.parametrize('h,w,c,heads', SHAPES)
def test_hrformer_block_parity(h, w, c, heads):
    key = jax.random.PRNGKey(h * 100 + c)
    x = jax.random.normal(key, (2, h, w, c), jnp.float32)
    blk = HRFormerBlock(num_heads=heads, window_size=7)
    v = _init_stats(key, blk, x)
    ref = blk.apply(v, x, False)
    got = fused_hrformer_block(x, v, num_heads=heads, window=7,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fusion_block_parity():
    h, w, c, heads = 20, 26, 18, 1
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, h, w, c), jnp.float32)
    mods = [jax.random.normal(k, (2, h, w, c), jnp.float32)
            for k in ks[1:]]
    blk = HRFuserFusionBlock(num_heads=heads, num_modalities=2,
                             window_size=7)
    v = _init_stats(key, blk, x, mods)
    ref = blk.apply(v, x, mods, False)
    got = fused_fusion_block(x, mods, v, num_heads=heads, window=7,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ffn_zero_input_stays_finite():
    # RandomDrop feeds exactly-zero streams; LN guard must hold in-kernel
    h, w, c, heads = 13, 12, 36, 2
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((1, h, w, c), jnp.float32)
    blk = HRFormerBlock(num_heads=heads, window_size=7)
    v = _init_stats(key, blk, jnp.ones_like(x))
    ref = blk.apply(v, x, False)
    got = fused_hrformer_block(x, v, num_heads=heads, window=7,
                               interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
