"""Model stack tests on a miniature config (fast CPU compiles)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrfuser_tpu.configs import get_config
from hrfuser_tpu.layers import HRFormerBlock, HRFuserFusionBlock
from hrfuser_tpu.models import CascadeRCNN, predict

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier


@pytest.fixture(scope='module')
def tiny_fusion():
    cfg = get_config('tiny_fusion_test')
    det = CascadeRCNN(cfg.model)
    img = jnp.zeros((2, 64, 96, 3))
    mods = [jnp.zeros((2, 64, 96, 3))] * 2
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)
    return cfg, det, variables


def test_backbone_feature_shapes(tiny_fusion):
    cfg, det, variables = tiny_fusion
    img = jnp.zeros((2, 64, 96, 3))
    mods = [jnp.zeros((2, 64, 96, 3))] * 2
    feats, cls_scores, bbox_preds = det.apply(
        variables, img, mods, False, method='forward_features')
    assert [f.shape for f in feats] == [
        (2, 16, 24, 32), (2, 8, 12, 32), (2, 4, 6, 32), (2, 2, 3, 32),
        (2, 1, 1, 32)]
    assert [s.shape[-1] for s in cls_scores] == [3] * 5
    assert [p.shape[-1] for p in bbox_preds] == [12] * 5


def test_predict_end_to_end(tiny_fusion):
    cfg, det, variables = tiny_fusion
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)), jnp.float32)
    mods = [jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)), jnp.float32)
            for _ in range(2)]
    out = jax.jit(functools.partial(predict, det))(variables, img, mods)
    assert out.boxes.shape == (2, 20, 4)
    assert out.scores.shape == (2, 20)
    assert out.labels.shape == (2, 20)
    v = np.asarray(out.valid)
    b = np.asarray(out.boxes)
    s = np.asarray(out.scores)
    lbl = np.asarray(out.labels)
    assert np.isfinite(b).all()
    # valid boxes inside the image, labels in range
    assert (b[v][:, 2] >= b[v][:, 0]).all()
    assert (lbl[v] >= 0).all() and (lbl[v] < 4).all()
    assert (s[v] > 0.05).all()
    # padded rows zeroed / -1
    assert (b[~v] == 0).all() and (lbl[~v] == -1).all()


def test_modality_drop_invariance_shape(tiny_fusion):
    """Zeroed modality stream (RandomDrop semantics) must still run."""
    cfg, det, variables = tiny_fusion
    img = jnp.ones((1, 64, 96, 3))
    mods = [jnp.zeros((1, 64, 96, 3)), jnp.ones((1, 64, 96, 3))]
    out = jax.jit(functools.partial(predict, det))(variables, img, mods)
    assert np.isfinite(np.asarray(out.boxes)).all()


def test_camera_only_model():
    cfg = get_config('tiny_camera_test')
    det = CascadeRCNN(cfg.model)
    img = jnp.zeros((1, 64, 96, 3))
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, None)
    out = jax.jit(functools.partial(predict, det))(variables, img, None)
    assert out.boxes.shape == (1, 20, 4)


def test_hrformer_block_shapes():
    blk = HRFormerBlock(num_heads=2, window_size=7)
    x = jnp.zeros((2, 10, 13, 16))
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    y = blk.apply(v, x, train=False)
    assert y.shape == x.shape
    # params: fused qkv + rpe table present
    p = v['params']
    assert p['attn']['qkv']['kernel'].shape == (16, 48)
    assert p['attn']['rpe']['relative_position_bias_table'].shape == (169, 2)


def test_fusion_block_residual_semantics():
    """With zeroed attention outputs, x' = x + sum_k z_k (+ FFN path)."""
    blk = HRFuserFusionBlock(num_heads=1, num_modalities=2, window_size=7)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 7, 7, 8)), jnp.float32)
    mods = [jnp.asarray(rng.normal(0, 1, (1, 7, 7, 8)), jnp.float32)
            for _ in range(2)]
    v = blk.init(jax.random.PRNGKey(0), x, mods, train=False)

    # zero the attention out-projections and the FFN last conv + BN scale
    p = jax.tree_util.tree_map(lambda a: a, v['params'])
    for k in range(2):
        p[f'attn_{k}']['out_proj']['kernel'] = jnp.zeros_like(
            p[f'attn_{k}']['out_proj']['kernel'])
        p[f'attn_{k}']['out_proj']['bias'] = jnp.zeros_like(
            p[f'attn_{k}']['out_proj']['bias'])
    p['ffn']['fc2']['kernel'] = jnp.zeros_like(p['ffn']['fc2']['kernel'])
    p['ffn']['fc2']['bias'] = jnp.zeros_like(p['ffn']['fc2']['bias'])
    p['ffn']['norm3']['bn']['scale'] = jnp.zeros_like(
        p['ffn']['norm3']['bn']['scale'])
    p['ffn']['norm3']['bn']['bias'] = jnp.zeros_like(
        p['ffn']['norm3']['bn']['bias'])
    newv = dict(v, params=p)
    y = blk.apply(newv, x, mods, train=False)
    # FFN contributes gelu(0) = 0; attention contributes 0 -> pure residual
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x + mods[0] + mods[1]), atol=1e-5)


def test_layernorm_matches_flax_and_guards_zero_variance():
    """Guarded LN: forward == nn.LayerNorm; zero-variance rows get zero grad."""
    from flax import linen as nn

    from hrfuser_tpu.layers.common import LayerNorm

    ln = LayerNorm(epsilon=1e-6)
    ref = nn.LayerNorm(epsilon=1e-6)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 2, (4, 7, 16)),
                    jnp.float32)
    v = ln.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(ln.apply(v, x)),
                               np.asarray(ref.apply(v, x)),
                               rtol=2e-5, atol=2e-5)
    # Zero-variance rows (RandomDrop zeroing a modality): forward is `bias`
    # either way, but the guarded backward is exactly 0 instead of being
    # amplified by rsqrt(eps) ~ 1e3 per LN.
    z = jnp.zeros((2, 5, 16))
    np.testing.assert_allclose(
        np.asarray(ln.apply(v, z)),
        np.broadcast_to(np.asarray(v['params']['bias']), z.shape))
    g = jax.grad(lambda xx: (ln.apply(v, xx) ** 2).sum())(z)
    assert (np.asarray(g) == 0).all()


def test_fusion_block_zero_modality_grads_finite():
    """Grads through the fusion block stay finite with a zeroed modality."""
    blk = HRFuserFusionBlock(num_heads=1, num_modalities=1, window_size=7)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 14, 14, 8)), jnp.float32)
    z = jnp.zeros((1, 14, 14, 8))
    v = blk.init(jax.random.PRNGKey(0), x, [z], train=False)

    def loss(params, zz):
        out = blk.apply(dict(v, params=params), x, [zz], train=False)
        return (out ** 2).sum()

    gp, gz = jax.grad(loss, argnums=(0, 1))(v['params'], z)
    leaves = jax.tree_util.tree_leaves(gp) + [gz]
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)


def test_aug_test_flip_mirror_consistency(tiny_fusion):
    """predict_aug_test_flip(img) and (flip(img)) see the same two augs in
    swapped roles -> identical score multisets and mirrored boxes."""
    from hrfuser_tpu.models import predict_aug_test_flip

    cfg, det, variables = tiny_fusion
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
    mods = [jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
            for _ in range(2)]

    fn = jax.jit(functools.partial(predict_aug_test_flip, det))
    d1 = fn(variables, img, mods)
    d2 = fn(variables, img[:, :, ::-1, :], [m[:, :, ::-1, :] for m in mods])

    assert d1.boxes.shape == (1, 20, 4)
    b1, s1, v1 = (np.asarray(d1.boxes), np.asarray(d1.scores),
                  np.asarray(d1.valid))
    b2, s2, v2 = (np.asarray(d2.boxes), np.asarray(d2.scores),
                  np.asarray(d2.valid))
    assert np.isfinite(b1).all() and np.isfinite(b2).all()
    assert v1.sum() == v2.sum()
    np.testing.assert_allclose(np.sort(s1[v1]), np.sort(s2[v2]), atol=1e-4)
    # mirrored x-extents: multiset of (orig_w - x2, orig_w - x1) matches
    m2 = np.stack([96.0 - b2[v2][:, 2], 96.0 - b2[v2][:, 0]], -1)
    a1 = np.sort(np.stack([b1[v1][:, 0], b1[v1][:, 2]], -1), axis=0)
    np.testing.assert_allclose(a1, np.sort(m2, axis=0), atol=1e-3)


def test_remat_backbone_forward_identical(tiny_fusion):
    """cfg.remat recomputes activations in backward; forward must match
    the non-remat build (same params) to float-reassociation tolerance."""
    import dataclasses

    cfg, det, variables = tiny_fusion
    bb = dataclasses.replace(cfg.model.backbone, remat=True)
    det_r = CascadeRCNN(dataclasses.replace(cfg.model, backbone=bb))
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
    mods = [jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
            for _ in range(2)]
    f1 = det.apply(variables, img, mods, False, method='extract_feat')
    f2 = det_r.apply(variables, img, mods, False, method='extract_feat')
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)

    # grads exist and are finite through the remat path
    def loss(params):
        feats = det_r.apply(
            {'params': params,
             'batch_stats': variables.get('batch_stats', {})},
            img, mods, False, method='extract_feat')
        return sum((f ** 2).mean() for f in feats)

    g = jax.grad(loss)(variables['params'])
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_4mod_heterogeneous_channels_forward():
    """STF-style fusion: 3 modalities with different channel counts
    (lidar yzi=3, radar yzv=2, gated grey=1; reference STF 4-mod cfg)."""
    import dataclasses

    from hrfuser_tpu.configs.presets import detector, hrfuser_backbone

    model = detector(hrfuser_backbone(channels=(8, 16, 24, 32),
                                      heads=(1, 2, 2, 4),
                                      num_modalities=3,
                                      mod_in_channels=(3, 2, 1)),
                     num_classes=3)
    model = dataclasses.replace(
        model,
        roi=dataclasses.replace(model.roi, num_classes=3,
                                fc_out_channels=64, max_per_img=10),
        rpn_test=dataclasses.replace(model.rpn_test, nms_pre=100,
                                     max_per_img=50),
        neck_out_channels=32)
    det = CascadeRCNN(model)
    img = jnp.zeros((1, 64, 96, 3))
    mods = [jnp.zeros((1, 64, 96, c)) for c in (3, 2, 1)]
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)
    out = jax.jit(functools.partial(predict, det))(variables, img, mods)
    assert out.boxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(out.boxes)).all()


def test_hrnet_based_fusion_forward():
    """HRNet-based HRFuser variant (BASIC conv trunk + MWCA fusion,
    reference `hrfuser_hrnet_based.py:24-314`) builds and runs e2e."""
    cfg = get_config('tiny_hrnet_fusion_test')
    det = CascadeRCNN(cfg.model)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
    mods = [jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
            for _ in range(2)]
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)
    feats, cls_scores, _ = det.apply(
        variables, img, mods, False, method='forward_features')
    assert [f.shape for f in feats] == [
        (1, 16, 24, 32), (1, 8, 12, 32), (1, 4, 6, 32), (1, 2, 3, 32),
        (1, 1, 1, 32)]
    out = jax.jit(functools.partial(predict, det))(variables, img, mods)
    assert np.isfinite(np.asarray(out.boxes)).all()


def test_hrnet_w18_fusion_preset_resolves():
    cfg = get_config('cascade_rcnn_hrfuser_hrnet_w18_1x_nus_r640_l_r_fusion')
    b = cfg.model.backbone
    assert b.stage4.block == 'BASIC'
    assert b.stage4.num_channels == (18, 36, 72, 144)
    assert b.stage3.num_modules == 4 and b.stage4.num_modules == 3
    assert b.fusion_c is not None and b.num_fused_modalities == 2
