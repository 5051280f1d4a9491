"""Parity: dense-packed Pallas chain kernel vs the flax block chain.

The chain kernel (`ops/pallas_chain.py`) must reproduce a sequence of
eval-mode `HRFormerBlock`s exactly (BNs folded with running stats,
DropPath identity): reference `HRFormerBlock`/`CrossFFN`
(mmdet/models/backbones/hrformer.py:239-386).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from hrfuser_tpu.layers.attention import HRFormerBlock
from hrfuser_tpu.ops.pallas_chain import hrformer_chain

pytestmark = pytest.mark.slow

INTERPRET = jax.default_backend() != 'tpu'


class _Chain(nn.Module):
    n_blocks: int
    num_heads: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.n_blocks):
            x = HRFormerBlock(num_heads=self.num_heads, window_size=7,
                              mlp_ratio=self.mlp_ratio,
                              name=f'b{i}')(x, train)
        return x


def _init_chain(rng, n_blocks, heads, h, w, c, mlp=2.0):
    m = _Chain(n_blocks, heads, mlp)
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    # randomize batch stats so BN folding is actually exercised
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(0.1, 0.3, a.shape) ** 2 + 0.5
                              if a.ndim else a, a.dtype),
        vs.get('batch_stats', {}))
    vs = {'params': vs['params'], 'batch_stats': bs}
    return m, vs, x


def _block_vars(vs, i):
    return {'params': vs['params'][f'b{i}'],
            'batch_stats': vs['batch_stats'][f'b{i}']}


@pytest.mark.parametrize('shape,heads,blocks', [
    ((14, 21, 6), 1, 2),         # 2x3 windows, 1 group
    ((16, 30, 8), 2, 2),         # ragged: pads to windows + group
    ((14, 119, 6), 1, 1),        # 17 windows -> 3 groups of 8 (2 ragged)
    ((14, 21, 6), 2, 1),         # ODD head dim (d=3 -> padded to 4)
])
def test_chain_matches_flax(shape, heads, blocks):
    h, w, c = shape
    rng = np.random.default_rng(0)
    m, vs, x = _init_chain(rng, blocks, heads, h, w, c)
    ref = m.apply(vs, x)
    xin = x.transpose(0, 3, 1, 2)                  # CF
    got = hrformer_chain(xin, [_block_vars(vs, i) for i in range(blocks)],
                         num_heads=heads, interpret=INTERPRET)
    got = got.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize('n_streams', [2, 3])
def test_chain_streams_stacked(n_streams):
    """Stream stacking: independent weight sets on one grid (2 streams
    = nuScenes lidar+radar; 3 = STF lidar+radar+gated)."""
    h, w, c, heads = 14, 21, 6, 1
    rng = np.random.default_rng(1)
    chains = [_init_chain(rng, 2, heads, h, w, c)
              for _ in range(n_streams)]
    refs = [m.apply(vs, x) for m, vs, x in chains]
    xin = jnp.concatenate([x for _, _, x in chains],
                          0).transpose(0, 3, 1, 2)
    blocks = [_block_vars(vs, i) for _, vs, _ in chains
              for i in range(2)]
    got = hrformer_chain(xin, blocks, num_heads=heads,
                         n_streams=n_streams,
                         interpret=INTERPRET).transpose(0, 2, 3, 1)
    for k, ref in enumerate(refs):
        np.testing.assert_allclose(np.asarray(got[2 * k:2 * k + 2]),
                                   np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_chain_bf16_money_geometry_small_batch():
    """r640 branch-0 geometry (96x160, C=18) at batch 1, bf16."""
    rng = np.random.default_rng(2)
    m, vs, _ = _init_chain(rng, 1, 1, 96, 160, 18, mlp=4.0)
    x = jnp.asarray(rng.normal(0, 1, (1, 96, 160, 18)), jnp.float32)
    ref = m.apply(vs, x.astype(jnp.bfloat16)).astype(jnp.float32)
    xin = x.astype(jnp.bfloat16).transpose(0, 3, 1, 2)
    got = hrformer_chain(xin, [_block_vars(vs, 0)], num_heads=1,
                         interpret=INTERPRET)
    got = got.astype(jnp.float32).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=6e-2, rtol=6e-2)


@pytest.mark.parametrize('m,heads', [(2, 1), (3, 1), (2, 2)])
def test_fusion_chain_matches_flax(m, heads):
    """fusion_chain vs HRFuserFusionBlock (2 mods = nuScenes, 3 = STF
    4-modality config; heads=2 exercises the odd-head-dim padding,
    d=3 -> 4), eval."""
    from hrfuser_tpu.layers.attention import HRFuserFusionBlock
    from hrfuser_tpu.ops.pallas_chain import fusion_chain
    h, w, c = 14, 21, 6
    rng = np.random.default_rng(5)
    blk = HRFuserFusionBlock(num_heads=heads, num_modalities=m,
                             window_size=7, mlp_ratio=2.0)
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)), jnp.float32)
    mods = [jnp.asarray(rng.normal(0, 1, (2, h, w, c)), jnp.float32)
            for _ in range(m)]
    vs = blk.init(jax.random.PRNGKey(0), x, mods, False)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(0.1, 0.3, a.shape) ** 2 + 0.5
                              if a.ndim else a, a.dtype),
        vs.get('batch_stats', {}))
    vs = {'params': vs['params'], 'batch_stats': bs}
    ref = blk.apply(vs, x, mods, False)
    got = fusion_chain(x.transpose(0, 3, 1, 2),
                       [z.transpose(0, 3, 1, 2) for z in mods], vs,
                       num_heads=heads, interpret=INTERPRET)
    got = got.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
