"""Channels-first (CF) layout path: numerical equivalence with NHWC.

The CF path exists purely for TPU lane utilization (small-C HRFormer
branches run elementwise chains at C/128 lane efficiency in NHWC; see
`layers.attention.prefer_cf`). It must be a pure re-layout: identical
parameter trees and identical math. These tests init every module in
NHWC and apply the SAME variables through the CF formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrfuser_tpu.layers.attention import (CrossFFN, HRFormerBlock,
                                          HRFuserFusionBlock,
                                          LocalWindowSelfAttention,
                                          MultiWindowCrossAttention,
                                          prefer_cf)
from hrfuser_tpu.ops.window import (window_partition, window_partition_cf,
                                    window_reverse, window_reverse_cf)
pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier



def _rand(rng, *shape):
    return jnp.asarray(rng.normal(0, 1, shape), jnp.float32)


def test_window_partition_cf_matches_nhwc():
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, 10, 13, 5)                     # non-multiple H/W
    ref = window_partition(x, 7, 7)                  # [B*nW, 49, C]
    cf = window_partition_cf(x.transpose(0, 3, 1, 2), 7, 7)
    np.testing.assert_allclose(np.asarray(cf.transpose(0, 2, 1)),
                               np.asarray(ref), rtol=0, atol=0)
    back = window_reverse_cf(cf, 2, 10, 13, 7, 7)
    np.testing.assert_allclose(np.asarray(back.transpose(0, 2, 3, 1)),
                               np.asarray(x), rtol=0, atol=0)
    ref_back = window_reverse(ref, 2, 10, 13, 7, 7)
    np.testing.assert_allclose(np.asarray(ref_back), np.asarray(x))


@pytest.mark.parametrize('heads', [1, 2])
def test_lsa_cf_equivalence(heads):
    rng = np.random.default_rng(1)
    x = _rand(rng, 2, 9, 12, 8)
    mod = LocalWindowSelfAttention(num_heads=heads, window_size=7)
    vs = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(vs, x)
    cf_mod = LocalWindowSelfAttention(num_heads=heads, window_size=7,
                                      layout='cf')
    out = cf_mod.apply(vs, x.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 3, 1)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_mwca_cf_equivalence():
    rng = np.random.default_rng(2)
    x = _rand(rng, 2, 9, 12, 8)
    y = _rand(rng, 2, 9, 12, 8)
    mod = MultiWindowCrossAttention(num_heads=2, window_size=7)
    vs = mod.init(jax.random.PRNGKey(0), x, y)
    ref = mod.apply(vs, x, y)
    cf_mod = MultiWindowCrossAttention(num_heads=2, window_size=7,
                                       layout='cf')
    out = cf_mod.apply(vs, x.transpose(0, 3, 1, 2), y.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 3, 1)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_crossffn_cf_equivalence_train_and_eval():
    rng = np.random.default_rng(3)
    x = _rand(rng, 2, 6, 10, 8)
    mod = CrossFFN(hidden=16, out=8)
    vs = mod.init(jax.random.PRNGKey(0), x, True)
    cf_mod = CrossFFN(hidden=16, out=8, layout='cf')
    for train in (False, True):
        kw = dict(mutable=['batch_stats']) if train else {}
        ref = mod.apply(vs, x, train, **kw)
        out = cf_mod.apply(vs, x.transpose(0, 3, 1, 2), train, **kw)
        if train:
            (ref, ref_bs), (out, out_bs) = ref, out
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
                ref_bs, out_bs)
        np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 3, 1)),
                                   np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_hrformer_block_cf_equivalence():
    rng = np.random.default_rng(4)
    x = _rand(rng, 2, 9, 12, 8)
    mod = HRFormerBlock(num_heads=2, window_size=7, mlp_ratio=2.0)
    vs = mod.init(jax.random.PRNGKey(0), x, False)
    ref = mod.apply(vs, x, False)
    cf_mod = HRFormerBlock(num_heads=2, window_size=7, mlp_ratio=2.0,
                           layout='cf')
    out = cf_mod.apply(vs, x.transpose(0, 3, 1, 2), False)
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 3, 1)),
                               np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_fusion_block_cf_equivalence():
    rng = np.random.default_rng(5)
    x = _rand(rng, 2, 9, 12, 8)
    mods = [_rand(rng, 2, 9, 12, 8) for _ in range(2)]
    mod = HRFuserFusionBlock(num_heads=2, num_modalities=2, window_size=7,
                             mlp_ratio=2.0)
    vs = mod.init(jax.random.PRNGKey(0), x, mods, False)
    ref = mod.apply(vs, x, mods, False)
    cf_mod = HRFuserFusionBlock(num_heads=2, num_modalities=2, window_size=7,
                                mlp_ratio=2.0, layout='cf')
    out = cf_mod.apply(vs, x.transpose(0, 3, 1, 2),
                       [m.transpose(0, 3, 1, 2) for m in mods], False)
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 3, 1)),
                               np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_prefer_cf_heuristic():
    # HRFuser-T r640 branch shapes (H, W, C)
    assert prefer_cf(96, 160, 18)        # branch 0: 14% -> 62% lanes
    assert prefer_cf(48, 80, 36)         # branch 1: 28% -> 62%
    assert not prefer_cf(24, 40, 72)     # branch 2: NHWC already better
    assert not prefer_cf(12, 20, 144)    # branch 3


def test_backbone_cf_layout_equivalence():
    """Full tiny fusion backbone: cf_layout='on' vs 'off', same variables."""
    import dataclasses

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models.backbones.hrfuser import HRFuserBackbone

    cfg = get_config('tiny_fusion_test').model.backbone
    rng = np.random.default_rng(6)
    x = _rand(rng, 1, 64, 96, 3)
    mods = [_rand(rng, 1, 64, 96, c) for c in cfg.mod_in_channels]

    off = HRFuserBackbone(dataclasses.replace(cfg, cf_layout='off'))
    on = HRFuserBackbone(dataclasses.replace(cfg, cf_layout='on'))
    vs = off.init(jax.random.PRNGKey(0), x, mods, train=False)
    ref = off.apply(vs, x, mods, train=False)
    out = on.apply(vs, x, mods, train=False)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_hrformer_block_cf_gradient_equivalence():
    """CF is selected in training too — parameter gradients must match."""
    rng = np.random.default_rng(7)
    x = _rand(rng, 2, 9, 12, 8)
    mod = HRFormerBlock(num_heads=2, window_size=7, mlp_ratio=2.0)
    vs = mod.init(jax.random.PRNGKey(0), x, False)
    params, rest = vs['params'], {k: v for k, v in vs.items()
                                  if k != 'params'}
    cf_mod = HRFormerBlock(num_heads=2, window_size=7, mlp_ratio=2.0,
                           layout='cf')

    def loss_nhwc(p):
        out = mod.apply({'params': p, **rest}, x, False)
        return jnp.sum(out * out)

    def loss_cf(p):
        out = cf_mod.apply({'params': p, **rest},
                           x.transpose(0, 3, 1, 2), False)
        return jnp.sum(out * out)

    g_ref = jax.grad(loss_nhwc)(params)
    g_cf = jax.grad(loss_cf)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4),
        g_ref, g_cf)
