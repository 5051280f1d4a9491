"""Depth-warp geometry tests with synthetic cameras."""

import numpy as np

from hrfuser_tpu.data.gated_warp import (depth_warp, disparity_to_depth,
                                         homography_from_points,
                                         homography_warp)


def _k(f=100.0, cx=32.0, cy=24.0):
    return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])


def test_identity_warp():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    depth = np.full((48, 64), 5.0, np.float32)
    out, mask = depth_warp(img, depth, _k(), _k(), np.eye(4), (64, 48))
    assert mask.all()
    np.testing.assert_allclose(out[..., 0], img, atol=1e-3)


def test_translated_camera_shifts_image():
    img = np.zeros((48, 64), np.float32)
    img[24, 32] = 1.0                      # principal-point pixel
    depth = np.full((48, 64), 10.0, np.float32)
    t = np.eye(4)
    t[0, 3] = 1.0                          # move camera 1 m left -> pixel
    out, _ = depth_warp(img, depth, _k(), _k(), t, (64, 48))
    # x' = f * (X + 1) / Z + cx = 100 * 0.1 + 32 = 42
    assert out[24, 42, 0] == 1.0


def test_zbuffer_keeps_nearest():
    img = np.zeros((2, 2), np.float32)
    img[0, 0], img[0, 1] = 1.0, 2.0
    depth = np.array([[10.0, 5.0], [0, 0]], np.float32)
    # camera setup that maps both pixels to the same target pixel:
    # use a lens with fx so small both land on cx
    k = np.array([[1e-6, 0, 16.0], [0, 100.0, 12.0], [0, 0, 1.0]])
    out, mask = depth_warp(img, depth, k, k, np.eye(4), (32, 24))
    # nearest (depth 5, value 2.0) must win
    ys, xs = np.nonzero(out[..., 0])
    assert out[..., 0].max() == 2.0


def test_homography_roundtrip():
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 100, (20, 2)).astype(np.float32)
    m_true = np.array([[1.1, 0.02, 5.0], [-0.01, 0.95, -3.0], [0, 0, 1.0]])
    dst_h = (m_true @ np.vstack([src.T, np.ones(20)]))
    dst = (dst_h[:2] / dst_h[2]).T.astype(np.float32)
    m = homography_from_points(src, dst)
    np.testing.assert_allclose(m / m[2, 2], m_true, atol=1e-3)
    img = rng.uniform(0, 1, (100, 100)).astype(np.float32)
    out = homography_warp(img, m, (100, 100))
    assert out.shape == (100, 100)


def test_disparity_to_depth():
    disp = np.array([[0.0, 1.0], [2.0, 4.0]], np.float32)
    depth = disparity_to_depth(disp, focal=100.0, baseline=0.2)
    assert depth[0, 0] == 0.0
    np.testing.assert_allclose(depth[0, 1], 20.0)
    np.testing.assert_allclose(depth[1, 1], 5.0)


def test_inverse_depth_warp_identity():
    from hrfuser_tpu.data.gated_warp import inverse_depth_warp
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 20)).astype(np.float32)
    depth = np.full((16, 20), 5.0, np.float32)
    k = np.array([[10., 0., 10.], [0., 10., 8.], [0., 0., 1.]])
    out = inverse_depth_warp(img, depth, k, k, np.eye(4))
    np.testing.assert_allclose(out[..., 0], img, atol=1e-4)


def test_inverse_depth_warp_translation_shifts():
    """x-translation of the source camera shifts samples by f*tx/z px."""
    from hrfuser_tpu.data.gated_warp import inverse_depth_warp
    img = np.zeros((16, 20), np.float32)
    img[:, 10] = 1.0
    depth = np.full((16, 20), 5.0, np.float32)
    f = 10.0
    k = np.array([[f, 0., 10.], [0., f, 8.], [0., 0., 1.]])
    t = np.eye(4)
    t[0, 3] = 1.0                 # source cam sees points 1m to the right
    out = inverse_depth_warp(img, depth, k, k, t)[..., 0]
    # u_src = u_tgt + f*tx/z = u_tgt + 2 -> column 10 of src lands at tgt 8
    assert out[:, 8].min() > 0.99
    assert out[:, 10].max() < 1e-6


def test_ego_motion_offset_direction():
    from hrfuser_tpu.data.gated_warp import ego_motion_offset
    off = ego_motion_offset(10.0, 0.0, 0.1)     # 10 m/s straight, 100 ms
    np.testing.assert_allclose(off, [0.0, 0.0, -1.0], atol=1e-9)
