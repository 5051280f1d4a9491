"""Anchor generator and window partition tests."""

import numpy as np
import jax.numpy as jnp

from hrfuser_tpu.ops import (AnchorGenerator, relative_position_index,
                             window_partition, window_reverse)


def test_base_anchors_hrfuser_cfg():
    gen = AnchorGenerator(strides=[4, 8, 16, 32, 64], ratios=[0.5, 1.0, 2.0],
                          scales=[8])
    # stride-4 level: base size 4, scale 8 => area 32^2 per ratio
    base = gen.base_anchors[0]
    assert base.shape == (3, 4)
    ws = base[:, 2] - base[:, 0]
    hs = base[:, 3] - base[:, 1]
    np.testing.assert_allclose(ws * hs, 32.0 * 32.0, rtol=1e-5)
    np.testing.assert_allclose(hs / ws, [0.5, 1.0, 2.0], rtol=1e-5)
    # centered at center_offset * stride = 0
    np.testing.assert_allclose(base[:, 0] + base[:, 2], 0.0, atol=1e-4)


def test_grid_anchor_layout():
    gen = AnchorGenerator(strides=[4], ratios=[1.0], scales=[8])
    anchors = gen.grid_anchors([(2, 3)])[0]
    assert anchors.shape == (6, 4)
    # row-major: x varies fastest; anchor centers at (x*4, y*4)
    ctr_x = (anchors[:, 0] + anchors[:, 2]) / 2
    ctr_y = (anchors[:, 1] + anchors[:, 3]) / 2
    np.testing.assert_allclose(ctr_x, [0, 4, 8, 0, 4, 8], atol=1e-5)
    np.testing.assert_allclose(ctr_y, [0, 0, 0, 4, 4, 4], atol=1e-5)


def test_valid_flags():
    gen = AnchorGenerator(strides=[4], ratios=[1.0], scales=[8])
    flags = gen.valid_flags([(4, 4)], pad_shape=(8, 16))[0]
    # valid rows: ceil(8/4)=2 of 4; cols: all 4
    assert flags.reshape(4, 4).sum(1).tolist() == [4, 4, 0, 0]


def test_window_roundtrip_exact_multiple():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 14, 21, 5)).astype(np.float32)
    wins = window_partition(jnp.asarray(x), 7, 7)
    assert wins.shape == (2 * 2 * 3, 49, 5)
    back = np.asarray(window_reverse(wins, 2, 14, 21, 7, 7))
    np.testing.assert_allclose(back, x)


def test_window_roundtrip_with_padding():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 10, 13, 3)).astype(np.float32)
    wins = window_partition(jnp.asarray(x), 7, 7)
    assert wins.shape == (1 * 2 * 2, 49, 3)
    back = np.asarray(window_reverse(wins, 1, 10, 13, 7, 7))
    np.testing.assert_allclose(back, x)


def test_window_center_padding_position():
    # a single nonzero pixel at (0,0) of a 6x6 map with window 7 must end up
    # at padded position (0,0)+pad_top/left = (0,0) shifted by (0,0): pad=1
    # => goes to index (0*7 + ... ) check via partition of indicator
    x = np.zeros((1, 6, 6, 1), np.float32)
    x[0, 0, 0, 0] = 1.0
    wins = np.asarray(window_partition(jnp.asarray(x), 7, 7))
    # pad_h = 1 -> top 0, bottom 1; pad_w = 1 -> left 0, right 1
    assert wins.shape == (1, 49, 1)
    assert wins[0, 0, 0] == 1.0


def test_relative_position_index():
    idx = relative_position_index(7, 7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    # symmetric pairs map to mirrored offsets, diagonal to the center row
    center = (7 - 1) * 13 + (7 - 1)
    assert (np.diag(idx) == center).all()
