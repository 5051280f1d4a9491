"""Fused Pallas RoIAlign vs the XLA gather formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrfuser_tpu.ops import multilevel_roi_align
from hrfuser_tpu.ops.pallas_roi_align import multilevel_roi_align_pallas

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier

INTERPRET = jax.default_backend() != 'tpu'


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def _feats(rng, h0=96, w0=160, c=256, levels=4):
    return [jnp.asarray(
        rng.normal(0, 1, (h0 // 2 ** i, w0 // 2 ** i, c)).astype(np.float32))
        for i in range(levels)]


@pytest.mark.parametrize('variant', ['v4', 'v7'])
def test_pallas_roi_align_matches_gather(variant):
    rng = np.random.default_rng(0)
    feats = _feats(rng, h0=64, w0=96, c=256)
    # spans covering every level incl. edge/outside cases
    rois = jnp.asarray(np.array(
        [[4., 4., 100., 90.],        # level 0
         [0., 0., 30., 20.],         # small, corner
         [-8., -4., 40., 44.],       # partly outside
         [10., 5., 200., 180.],      # level 1
         [0., 0., 383., 250.],       # level 2/3, full width
         [100., 60., 380., 255.],    # large
         [5., 5., 6., 6.],           # tiny
         [50., 40., 150., 120.]],    # mid
        np.float32))
    ref = np.asarray(multilevel_roi_align(
        feats, rois, [4, 8, 16, 32], gather_dtype=jnp.bfloat16))
    got = np.asarray(_f32(multilevel_roi_align_pallas(
        feats, rois, (4, 8, 16, 32), interpret=INTERPRET,
        variant=variant)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize('variant', ['v4', 'v7'])
def test_pallas_roi_align_larger_batch_of_rois(variant):
    rng = np.random.default_rng(1)
    feats = _feats(rng, h0=96, w0=160, c=256)
    n = 64
    x1 = rng.uniform(-10, 500, n)
    y1 = rng.uniform(-10, 300, n)
    w = rng.uniform(2, 400, n)
    h = rng.uniform(2, 250, n)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1)
                       .astype(np.float32))
    ref = np.asarray(multilevel_roi_align(
        feats, rois, [4, 8, 16, 32], gather_dtype=jnp.bfloat16))
    got = np.asarray(_f32(multilevel_roi_align_pallas(
        feats, rois, (4, 8, 16, 32), interpret=INTERPRET,
        variant=variant)))
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize('variant', ['v4', 'v7'])
def test_pallas_flat_out_matches_reshaped(variant):
    """flat_out returns the kernel's native row order — (q, p) for
    every QP_VARIANTS member — and consumers undo it via that set."""
    rng = np.random.default_rng(2)
    feats = _feats(rng, h0=64, w0=96, c=256)
    wh = rng.uniform(4, 300, (16, 2))
    xy = rng.uniform(0, 1, (16, 2)) * (np.array([380., 250.]) - wh)
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), np.float32)
    full = np.asarray(multilevel_roi_align_pallas(
        feats, rois, (4, 8, 16, 32), interpret=INTERPRET, variant=variant))
    flat = np.asarray(multilevel_roi_align_pallas(
        feats, rois, (4, 8, 16, 32), interpret=INTERPRET, flat_out=True,
        variant=variant))
    assert flat.shape == (16, 49, 256)
    grid = flat.reshape(16, 7, 7, 256)
    from hrfuser_tpu.ops.pallas_roi_align import QP_VARIANTS
    if variant in QP_VARIANTS:
        grid = grid.swapaxes(1, 2)
    np.testing.assert_array_equal(grid, full)


@pytest.mark.parametrize('order', ['hw', 'wh'])
def test_bbox_head_rank3_matches_rank4(order):
    """Flat [N, 49, C] input matches the [N, 7, 7, C] path in both row
    orders: 'hw' (gather-oracle order) and 'wh' (Pallas QP_VARIANTS —
    rows transposed, kernel permutation compensates)."""
    import jax as _jax
    from hrfuser_tpu.models.roi_heads.bbox_head import Shared2FCBBoxHead
    rng = np.random.default_rng(3)
    x4 = jnp.asarray(rng.normal(0, 1, (10, 7, 7, 32)), jnp.float32)
    head = Shared2FCBBoxHead(num_classes=4, fc_out_channels=64,
                             flat_row_order=order)
    vs = head.init(_jax.random.PRNGKey(0), x4)
    cls4, reg4 = head.apply(vs, x4)
    x3 = x4 if order == 'hw' else x4.swapaxes(1, 2)
    cls3, reg3 = head.apply(vs, x3.reshape(10, 49, 32))
    np.testing.assert_allclose(np.asarray(cls3), np.asarray(cls4),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(reg3), np.asarray(reg4),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('variant', ['v4', 'v7'])
def test_pallas_right_edge_on_non_multiple_of_8_level(variant):
    """STF-like stride-8 level width 156 (>SPAN, not %8): the x-origin
    clamp must bound against the PADDED width, or right-edge RoIs lose
    their rightmost taps (zero weight) with no fallback trigger."""
    rng = np.random.default_rng(31)
    feats = [jnp.asarray(
        rng.normal(0, 1, (312 // s, 1248 // s, 256)).astype(np.float32))
        for s in (4, 8, 16, 32)]
    rois_np = [[x2 - 112., y1, x2, y1 + 112.]
               for x2 in (1247., 1240., 1200.) for y1 in (10., 100., 200.)]
    rois_np += [[0., 0., 100., 80.], [600., 100., 710., 190.]]
    rois = jnp.asarray(np.array(rois_np, np.float32))
    ref = np.asarray(multilevel_roi_align(
        feats, rois, [4, 8, 16, 32], gather_dtype=jnp.bfloat16))
    got = np.asarray(_f32(multilevel_roi_align_pallas(
        feats, rois, (4, 8, 16, 32), interpret=INTERPRET,
        variant=variant)))
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize('variant', ['v4', 'v7'])
def test_pallas_many_oversize_rois_multi_iteration_fallback(variant):
    """More oversize RoIs per image than FALLBACK: the fallback
    while_loop must run multiple iterations and still be exact."""
    from hrfuser_tpu.ops import pallas_roi_align as pra
    rng = np.random.default_rng(7)
    feats = _feats(rng, h0=96, w0=160, c=256)
    # 24 > FALLBACK=16 extreme-aspect boxes (span > SPAN after routing)
    # mixed with normal ones.
    wide = [[5. + i, 40., 620. + i, 52.] for i in range(12)]
    tall = [[30. + i, 2., 44. + i, 370.] for i in range(12)]
    normal = [[10., 10., 120., 100.], [200., 80., 320., 200.],
              [0., 0., 60., 60.], [100., 100., 400., 300.]]
    rois = jnp.asarray(np.array(wide + tall + normal, np.float32))
    assert len(wide + tall) > pra.FALLBACK
    ref = np.asarray(multilevel_roi_align(
        feats, rois, [4, 8, 16, 32], gather_dtype=jnp.bfloat16))
    got = np.asarray(_f32(multilevel_roi_align_pallas(
        feats, rois, (4, 8, 16, 32), interpret=INTERPRET,
        variant=variant)))
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize('variant', ['v7'])
def test_v5_full_axis_slivers_in_kernel_no_fallback(variant):
    """v7's full-coverage window covers every clipped RoI (max extent = the stride-4
    level's own width/height), so extreme-aspect RPN slivers — 31.7% of
    stage-0 proposals on the honest bench inputs, previously 24 gather-
    fallback while iterations (perf/r4_02_roi_spans.log) — pool exactly
    in-kernel. Reference semantics: mmdet RoIAlign handles arbitrary
    aspect ratios in its CUDA loop (roi_align_kernel.cu)."""
    rng = np.random.default_rng(3)
    feats = _feats(rng, h0=64, w0=96, c=256)
    sizes = [(64, 96), (32, 48), (16, 24), (8, 12)]
    h_img, w_img = 256, 384
    boxes = [[0., 100., w_img - 1., 101.5],    # full-width sliver
             [200., 0., 201.2, h_img - 1.],    # full-height sliver
             [0., 0., w_img - 1., 12.],        # wide strip
             [370., 0., w_img - 1., h_img - 1.],
             [0., 0., w_img - 1., h_img - 1.],  # full image
             [10., 20., 60., 70.],             # normal box
             [0., 0., 2., 2.],                 # tiny corner box
             [w_img - 3., h_img - 3., w_img - 1., h_img - 1.]]
    rois = jnp.asarray(boxes, jnp.float32)
    del sizes
    ref = multilevel_roi_align(feats, rois, [4, 8, 16, 32],
                               gather_dtype=jnp.bfloat16)
    got = multilevel_roi_align_pallas(feats, rois, (4, 8, 16, 32),
                                      interpret=INTERPRET, variant=variant)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.05, rtol=0.05)
