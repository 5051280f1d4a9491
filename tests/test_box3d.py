"""3D box utility tests (hand-computed geometry)."""

import numpy as np

from hrfuser_tpu.ops.box3d import (box3d_to_bbox, box_camera_to_lidar,
                                   camera_to_lidar, center_to_corner_box3d,
                                   iou_2d, lidar_to_camera, limit_period,
                                   points_cam2img, points_in_rbbox,
                                   remove_outside_points)


def _identity_calib():
    return np.eye(4), np.eye(4)


def test_camera_lidar_roundtrip():
    rng = np.random.default_rng(0)
    r_rect = np.eye(4)
    # velo2cam: lidar x->cam z, lidar y->cam -x, lidar z->cam -y
    velo2cam = np.array([[0., -1., 0., 0.],
                         [0., 0., -1., 0.],
                         [1., 0., 0., 0.27],
                         [0., 0., 0., 1.]])
    pts = rng.normal(0, 10, (50, 3))
    back = camera_to_lidar(lidar_to_camera(pts, r_rect, velo2cam),
                           r_rect, velo2cam)
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_center_to_corner_box3d_axis_aligned():
    c = center_to_corner_box3d(np.array([[1., 2., 3.]]),
                               np.array([[2., 4., 6.]]),
                               angles=np.array([0.0]))
    # origin (0.5, 1.0, 0.5): y spans [2-4, 2], x [0, 2], z [0, 6]
    assert c.shape == (1, 8, 3)
    np.testing.assert_allclose(c[0].min(0), [0., -2., 0.])
    np.testing.assert_allclose(c[0].max(0), [2., 2., 6.])


def test_corner_rotation_yaw90():
    c = center_to_corner_box3d(np.array([[0., 0., 0.]]),
                               np.array([[2., 1., 4.]]),
                               angles=np.array([np.pi / 2]),
                               origin=(0.5, 0.5, 0.5))
    # 90 deg about y swaps x and z extents
    np.testing.assert_allclose(c[0].max(0), [2., 0.5, 1.], atol=1e-9)


def test_points_cam2img():
    p = np.array([[[2., 4., 2.]]])
    k = np.array([[100., 0., 50., 0.], [0., 100., 60., 0.],
                  [0., 0., 1., 0.]])
    uv = points_cam2img(p, k)
    np.testing.assert_allclose(uv, [[[150., 260.]]])
    uvz = points_cam2img(p, k, with_depth=True)
    np.testing.assert_allclose(uvz[..., 2], [[2.0]])


def test_box3d_to_bbox_contains_projection():
    boxes = np.array([[0., 1., 10., 2., 2., 2., 0.]])
    k = np.array([[100., 0., 50.], [0., 100., 60.], [0., 0., 1.]])
    bb = box3d_to_bbox(boxes, k)
    x1, y1, x2, y2 = bb[0]
    assert x1 < 50 < x2 and y1 < 60 < y2


def test_points_in_rbbox():
    boxes = np.array([[0., 0., 0., 2., 4., 2., np.pi / 2]])
    pts = np.array([[1.5, 0., 0.5],     # inside after 90deg yaw (l<->w)
                    [0., 1.5, 0.5],     # outside after rotation
                    [0., 0., 2.5]])     # z above box height (z in [0, 2])
    m = points_in_rbbox(pts, boxes)
    assert m[:, 0].tolist() == [True, False, False]


def test_limit_period():
    np.testing.assert_allclose(limit_period(np.array([np.pi * 1.25])),
                               [np.pi * 0.25], atol=1e-12)


def test_iou_2d_modes():
    b = np.array([[0., 0., 2., 2.]])
    q = np.array([[1., 1., 3., 3.], [4., 4., 5., 5.]])
    iou = iou_2d(b, q)
    np.testing.assert_allclose(iou, [[1. / 7., 0.]])
    iof = iou_2d(b, q, mode='iof')
    np.testing.assert_allclose(iof, [[0.25, 0.]])


def test_remove_outside_points():
    r_rect = np.eye(4)
    velo2cam = np.array([[0., -1., 0., 0.],
                         [0., 0., -1., 0.],
                         [1., 0., 0., 0.],
                         [0., 0., 0., 1.]])
    k = np.array([[100., 0., 50.], [0., 100., 60.], [0., 0., 1.]])
    pts = np.array([[10., 0., 0., 1.],      # ahead, center -> kept
                    [-10., 0., 0., 1.],     # behind camera -> dropped
                    [10., 30., 0., 1.]])    # projects far left -> dropped
    kept = remove_outside_points(pts, r_rect, velo2cam, k, (120, 100))
    assert kept.shape == (1, 4)
    np.testing.assert_allclose(kept[0, :3], [10., 0., 0.])


def test_box_camera_to_lidar_dims():
    r_rect, velo2cam = np.eye(4), np.eye(4)
    cam = np.array([[1., 2., 3., 4., 1.5, 1.8, 0.3]])   # x,y,z,l,h,w,ry
    lid = box_camera_to_lidar(cam, r_rect, velo2cam)
    np.testing.assert_allclose(lid[0, 3:6], [1.8, 4., 1.5])   # w,l,h
    np.testing.assert_allclose(lid[0, 6], -0.3 - np.pi / 2)
