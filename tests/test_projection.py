"""Projection library tests: geometry, splatting, quantization."""

import numpy as np

from hrfuser_tpu.data.projection import (dequantize, project_to_image,
                                         quantize, quat_to_rot,
                                         radar_pillar_endpoints,
                                         splat_lidar, splat_radar_pillars,
                                         transform_matrix)


def test_quantize_roundtrip():
    vals = np.array([-199.99, -1.5, 0.0, 3.14159, 100.0, 400.0])
    deq = dequantize(quantize(vals))
    np.testing.assert_allclose(deq, vals, atol=0.01)  # 1 cm quantization


def test_quat_identity_and_rotation():
    np.testing.assert_allclose(quat_to_rot([1, 0, 0, 0]), np.eye(3),
                               atol=1e-12)
    # 90 deg around z: x -> y
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    r = quat_to_rot(q)
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_transform_matrix_inverse():
    t = [1.0, -2.0, 3.0]
    q = [np.cos(0.3), 0, np.sin(0.3), 0]
    tm = transform_matrix(t, q)
    inv = transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(tm @ inv, np.eye(4), atol=1e-12)


def test_project_to_image():
    k = np.array([[500., 0., 320.], [0., 500., 180.], [0., 0., 1.]])
    pts = np.array([[0., 0., 10.],      # center, 10m ahead
                    [0., 0., -5.],      # behind camera
                    [100., 0., 10.]]).T  # far off-image
    uv, mask = project_to_image(pts, k, (640, 360))
    assert mask.tolist() == [True, False, False]
    np.testing.assert_allclose(uv[:, 0], [320., 180.], atol=1e-9)


def test_splat_lidar_background_decodes_to_zero():
    uv = np.zeros((2, 0))
    rih, xz0 = splat_lidar(uv, np.zeros(0), np.zeros(0), np.zeros((3, 0)))
    assert rih.shape == (360, 640, 3)
    np.testing.assert_allclose(dequantize(rih), 0.0)


def test_splat_lidar_writes_point():
    uv = np.array([[100.0], [50.0]])              # full-res pixel
    pts_cam = np.array([[1.0], [-2.0], [9.0]])
    rih, xz0 = splat_lidar(uv, np.array([9.1]), np.array([17.0]), pts_cam)
    # lands at (100/2.5, 50/2.5) = (40, 20)
    v = dequantize(rih[20, 40])
    np.testing.assert_allclose(v, [9.1, 17.0, 2.0], atol=0.01)
    np.testing.assert_allclose(dequantize(xz0[20, 40])[:2], [1.0, 9.0],
                               atol=0.01)


def test_splat_lidar_zbuffer_vs_reference():
    # two points on the same pixel: far written after near
    uv = np.array([[100.0, 100.0], [50.0, 50.0]])
    pts = np.array([[0., 0.], [0., 0.], [5., 20.]])
    near_then_far_ref, _ = splat_lidar(uv, np.array([5., 20.]),
                                       np.zeros(2), pts, mode='reference')
    near_then_far_zb, _ = splat_lidar(uv, np.array([5., 20.]),
                                      np.zeros(2), pts, mode='zbuffer')
    # reference mode: last write wins (the quantized-compare quirk)
    assert abs(dequantize(near_then_far_ref[20, 40, 0]) - 20.0) < 0.01
    # zbuffer mode: nearest wins
    assert abs(dequantize(near_then_far_zb[20, 40, 0]) - 5.0) < 0.01


def test_radar_pillars():
    uv = np.array([[100.0], [250.0]])             # bottom at y=100
    uv_top = np.array([[100.0], [50.0]])          # top at y=20
    pts = np.array([[2.0], [0.0], [30.0]])
    riv, _ = splat_radar_pillars(uv, uv_top, np.array([30.0]),
                                 np.array([4.0]), np.array([8.5]), pts)
    col = dequantize(riv[:, 40, 0])
    assert (np.abs(col[20:100] - 30.0) < 0.01).all()   # pillar filled
    assert (col[:20] == 0).all() and (col[100:] == 0).all()
    assert abs(dequantize(riv[50, 40, 2]) - 8.5) < 0.01


def test_radar_pillar_endpoints():
    pts = np.array([[1.0, 2.0], [3.0, 4.0], [0.5, -0.2]])
    top = radar_pillar_endpoints(pts, pillar_height=3.0)
    np.testing.assert_allclose(top[:2], pts[:2])
    np.testing.assert_allclose(top[2], 3.0)
