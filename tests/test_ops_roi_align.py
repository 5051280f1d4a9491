"""RoIAlign vs a naive per-sample numpy reference (aligned=True mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from hrfuser_tpu.ops import map_roi_levels, multilevel_roi_align, roi_align


def _np_roi_align(feat, rois, scale, out, samples, aligned=True):
    """Naive loop reference for RoIAlign with fixed sampling grid."""
    h, w, c = feat.shape
    n = len(rois)
    res = np.zeros((n, out, out, c), np.float32)
    off = 0.5 if aligned else 0.0
    for i, (x1, y1, x2, y2) in enumerate(rois):
        sx1, sy1 = x1 * scale - off, y1 * scale - off
        rw, rh = (x2 - x1) * scale, (y2 - y1) * scale
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out, rh / out
        for py in range(out):
            for px in range(out):
                acc = np.zeros(c, np.float32)
                for iy in range(samples):
                    for ix in range(samples):
                        y = sy1 + py * bh + (iy + 0.5) * bh / samples
                        x = sx1 + px * bw + (ix + 0.5) * bw / samples
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y = min(max(y, 0.0), h - 1)
                        x = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        wy1, wx1 = y - y0, x - x0
                        wy0, wx0 = 1 - wy1, 1 - wx1
                        acc += (feat[y0, x0] * wy0 * wx0
                                + feat[y0, x1_] * wy0 * wx1
                                + feat[y1_, x0] * wy1 * wx0
                                + feat[y1_, x1_] * wy1 * wx1)
                res[i, py, px] = acc / (samples * samples)
    return res


def test_roi_align_matches_naive():
    rng = np.random.default_rng(0)
    feat = rng.normal(0, 1, (24, 32, 8)).astype(np.float32)
    rois = np.array([[4., 4., 60., 44.],
                     [0., 0., 127., 95.],
                     [10.3, 7.7, 50.1, 33.3],
                     [100., 80., 120., 92.]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               spatial_scale=0.25, out_size=7, sample_num=2))
    ref = _np_roi_align(feat, rois, 0.25, 7, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_roi_align_outside_roi_is_zero():
    feat = np.ones((16, 16, 2), np.float32)
    # roi fully outside the feature map
    rois = np.array([[-400., -400., -200., -200.]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               spatial_scale=0.25, out_size=7))
    np.testing.assert_allclose(got, 0.0)


def test_map_roi_levels():
    # scale 56 -> level 0; 112 -> 1; 448 -> 3; tiny -> 0; giant -> clamp 3
    rois = np.array([[0, 0, 56, 56],
                     [0, 0, 112, 112],
                     [0, 0, 448, 448],
                     [0, 0, 8, 8],
                     [0, 0, 2000, 2000]], np.float32)
    lvl = np.asarray(map_roi_levels(jnp.asarray(rois), 4))
    assert lvl.tolist() == [0, 1, 3, 0, 3]


def test_multilevel_matches_single_level():
    rng = np.random.default_rng(1)
    feats = [rng.normal(0, 1, (96 // 2**i, 160 // 2**i, 4)).astype(np.float32)
             for i in range(4)]
    strides = [4, 8, 16, 32]
    # one roi per level (sized to land exactly on that level)
    rois = np.array([[10., 10., 10. + 50., 10. + 50.],     # ~50  -> lvl 0
                     [10., 10., 10. + 150., 10. + 150.],   # ~150 -> lvl 1
                     [10., 10., 10. + 250., 10. + 250.],   # ~250 -> lvl 2
                     [10., 10., 10. + 500., 10. + 350.]],  # big  -> lvl 3
                    np.float32)
    got = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), strides))
    lvls = np.asarray(map_roi_levels(jnp.asarray(rois), 4))
    for i, lvl in enumerate(lvls):
        single = np.asarray(roi_align(jnp.asarray(feats[lvl]),
                                      jnp.asarray(rois[i:i + 1]),
                                      spatial_scale=1.0 / strides[lvl]))
        np.testing.assert_allclose(got[i], single[0], atol=1e-4)


def _np_roi_align_adaptive(feat, rois, scale, out, aligned=True):
    """mmcv sampling_ratio=0 semantics: grid = ceil(bin) per axis."""
    h, w, c = feat.shape
    n = len(rois)
    res = np.zeros((n, out, out, c), np.float32)
    off = 0.5 if aligned else 0.0
    for i, (x1, y1, x2, y2) in enumerate(rois):
        sx1, sy1 = x1 * scale - off, y1 * scale - off
        rw, rh = (x2 - x1) * scale, (y2 - y1) * scale
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out, rh / out
        gx = max(int(np.ceil(bw)), 1)
        gy = max(int(np.ceil(bh)), 1)
        for py in range(out):
            for px in range(out):
                acc = np.zeros(c, np.float32)
                for iy in range(gy):
                    for ix in range(gx):
                        y = sy1 + py * bh + (iy + 0.5) * bh / gy
                        x = sx1 + px * bw + (ix + 0.5) * bw / gx
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y = min(max(y, 0.0), h - 1)
                        x = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        wy1, wx1 = y - y0, x - x0
                        wy0, wx0 = 1 - wy1, 1 - wx1
                        acc += (feat[y0, x0] * wy0 * wx0
                                + feat[y0, x1_] * wy0 * wx1
                                + feat[y1_, x0] * wy1 * wx0
                                + feat[y1_, x1_] * wy1 * wx1)
                res[i, py, px] = acc / (gy * gx)
    return res


def test_roi_align_adaptive_matches_naive():
    """sample_num=0 reproduces sampling_ratio=0 exactly (grids 1..4)."""
    rng = np.random.default_rng(1)
    feat = rng.normal(0, 1, (24, 32, 4)).astype(np.float32)
    # bin sizes spanning ceil() grids 1, 2, 3 and 4 at scale 0.25
    rois = np.array([[4., 4., 20., 18.],       # bin < 1  -> grid 1
                     [0., 0., 127., 95.],      # bin ~4.5,3.4 -> capped 4
                     [10.3, 7.7, 70.1, 53.3],  # bin ~2.1,1.6 -> 3, 2
                     [2., 2., 100., 60.]],     # bin 3.5, 2.07 -> 4, 3
                    np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               spatial_scale=0.25, out_size=7, sample_num=0,
                               max_grid=4))
    ref = _np_roi_align_adaptive(feat, rois, 0.25, 7)
    # the capped roi (grid>4) differs by construction; check the rest exact
    np.testing.assert_allclose(got[[0, 2, 3]], ref[[0, 2, 3]], atol=1e-4)
    # capped one still close (it averages a denser grid of the same bins)
    np.testing.assert_allclose(got[1], ref[1], atol=0.35)
    # with a big enough cap it is exact everywhere
    got8 = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                spatial_scale=0.25, out_size=7, sample_num=0,
                                max_grid=8))
    np.testing.assert_allclose(got8, ref, atol=1e-4)


def test_multilevel_adaptive_runs():
    rng = np.random.default_rng(2)
    feats = [jnp.asarray(rng.normal(0, 1, (32 // (2 ** i), 48 // (2 ** i), 4))
                         .astype(np.float32)) for i in range(4)]
    rois = jnp.asarray(np.array([[4., 4., 100., 90.],
                                 [0., 0., 30., 20.]], np.float32))
    out = np.asarray(multilevel_roi_align(feats, rois, [4, 8, 16, 32],
                                          sample_num=0, max_grid=4))
    assert out.shape == (2, 7, 7, 4)
    assert np.isfinite(out).all()


def test_multilevel_bf16_gather_close_to_f32():
    """bf16 gather path (train-speed default) tracks f32 within bf16 eps."""
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.normal(0, 1, (32 // (2 ** i), 48 // (2 ** i), 8))
                         .astype(np.float32)) for i in range(4)]
    rois = jnp.asarray(np.array([[4., 4., 100., 90.],
                                 [0., 0., 30., 20.],
                                 [10., 5., 120., 120.]], np.float32))
    f32 = np.asarray(multilevel_roi_align(feats, rois, [4, 8, 16, 32]))
    bf16 = np.asarray(multilevel_roi_align(feats, rois, [4, 8, 16, 32],
                                           gather_dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32          # accumulated in f32
    np.testing.assert_allclose(bf16, f32, atol=0.05, rtol=0.05)


def test_onehot_matches_gather_f32():
    """Separable one-hot matmul formulation == gather formulation (f32)."""
    from hrfuser_tpu.ops import multilevel_roi_align_onehot
    rng = np.random.default_rng(5)
    feats = [jnp.asarray(rng.normal(0, 1, (32 // (2 ** i), 48 // (2 ** i), 8))
                         .astype(np.float32)) for i in range(4)]
    rois = jnp.asarray(np.array([[4., 4., 100., 90.],
                                 [0., 0., 30., 20.],
                                 [-8., -4., 40., 44.],     # partly outside
                                 [10., 5., 120., 120.]], np.float32))
    for sn in (2, 0):
        ref = np.asarray(multilevel_roi_align(
            feats, rois, [4, 8, 16, 32], sample_num=sn, max_grid=4))
        got = np.asarray(multilevel_roi_align_onehot(
            feats, rois, [4, 8, 16, 32], sample_num=sn, max_grid=4,
            compute_dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_onehot_bf16_close_and_differentiable():
    from hrfuser_tpu.ops import multilevel_roi_align_onehot
    rng = np.random.default_rng(6)
    feats = [jnp.asarray(rng.normal(0, 1, (32 // (2 ** i), 48 // (2 ** i), 8))
                         .astype(np.float32)) for i in range(4)]
    rois = jnp.asarray(np.array([[4., 4., 100., 90.],
                                 [0., 0., 30., 20.]], np.float32))
    f32 = np.asarray(multilevel_roi_align_onehot(
        feats, rois, [4, 8, 16, 32], compute_dtype=jnp.float32))
    bf16 = np.asarray(multilevel_roi_align_onehot(
        feats, rois, [4, 8, 16, 32], compute_dtype=jnp.bfloat16))
    np.testing.assert_allclose(bf16, f32, atol=0.05, rtol=0.05)

    # backward is matmuls: grads exist, are finite, and match the gather
    # path's feature-gradients in f32
    def loss_onehot(fs):
        return (multilevel_roi_align_onehot(
            fs, rois, [4, 8, 16, 32], compute_dtype=jnp.float32) ** 2).sum()

    def loss_gather(fs):
        return (multilevel_roi_align(fs, rois, [4, 8, 16, 32]) ** 2).sum()

    g1 = jax.grad(loss_onehot)(feats)
    g2 = jax.grad(loss_gather)(feats)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
