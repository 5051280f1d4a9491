"""3D box utilities (numpy, offline tooling).

Rebuild of the parts of `mmdet/core/bbox/box_np_ops.py` (896 LoC,
numba-accelerated in the reference) that the data converters and KITTI
tooling rely on, vectorized in plain numpy: frame transforms
(camera <-> lidar), box -> corner expansion with yaw rotation, image
projection, point-in-box tests and axis-aligned IoU. The 2D detection
path never touches these at runtime; they serve `tools/` preprocessing
and evaluation parity.

Conventions: KITTI camera boxes are [x, y, z, l, h, w, ry] with the
origin at the bottom center; lidar boxes [x, y, z, w, l, h, yaw].
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def camera_to_lidar(points: np.ndarray, r_rect: np.ndarray,
                    velo2cam: np.ndarray) -> np.ndarray:
    """Camera-rect frame -> lidar frame ([N, 3] -> [N, 3])."""
    pts = np.concatenate(
        [points[:, :3], np.ones((len(points), 1))], axis=1)
    out = pts @ np.linalg.inv((r_rect @ velo2cam).T)
    return out[:, :3]


def lidar_to_camera(points: np.ndarray, r_rect: np.ndarray,
                    velo2cam: np.ndarray) -> np.ndarray:
    pts = np.concatenate(
        [points[:, :3], np.ones((len(points), 1))], axis=1)
    return (pts @ (r_rect @ velo2cam).T)[:, :3]


def box_camera_to_lidar(boxes: np.ndarray, r_rect: np.ndarray,
                        velo2cam: np.ndarray) -> np.ndarray:
    """KITTI camera boxes [x,y,z,l,h,w,ry] -> lidar [x,y,z,w,l,h,yaw]."""
    xyz = camera_to_lidar(boxes[:, :3], r_rect, velo2cam)
    l, h, w = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    yaw = -boxes[:, 6:7] - np.pi / 2
    return np.concatenate([xyz, w, l, h, yaw], axis=1)


def rotation_3d_in_axis(points: np.ndarray, angles: np.ndarray,
                        axis: int = 2) -> np.ndarray:
    """Rotate [N, M, 3] point sets by per-box angles around one axis."""
    s, c = np.sin(angles), np.cos(angles)
    o = np.ones_like(c)
    z = np.zeros_like(c)
    if axis == 2:
        rot = np.stack([c, -s, z, s, c, z, z, z, o])
    elif axis == 1:
        rot = np.stack([c, z, s, z, o, z, -s, z, c])
    elif axis == 0:
        rot = np.stack([o, z, z, z, c, -s, z, s, c])
    else:
        raise ValueError(axis)
    rot = rot.reshape(3, 3, -1).transpose(2, 0, 1)       # [N, 3, 3]
    return np.einsum('nij,nmj->nmi', rot, points)


def corners_nd(dims: np.ndarray, origin=0.5) -> np.ndarray:
    """[N, D] dims -> [N, 2**D, D] axis-aligned corner offsets."""
    n, d = dims.shape
    grid = np.stack(np.meshgrid(*([[0.0, 1.0]] * d), indexing='ij'),
                    axis=-1).reshape(-1, d)
    origin = np.broadcast_to(np.asarray(origin, np.float64), (d,))
    return (grid[None] - origin[None, None]) * dims[:, None, :]


def center_to_corner_box3d(centers: np.ndarray, dims: np.ndarray,
                           angles: Optional[np.ndarray] = None,
                           origin=(0.5, 1.0, 0.5),
                           axis: int = 1) -> np.ndarray:
    """[N, 3] centers + dims (+yaw) -> [N, 8, 3] corners.

    Default origin (0.5, 1.0, 0.5)/axis 1 is the KITTI camera-frame
    convention (bottom-center origin, yaw about y).
    """
    corners = corners_nd(dims, origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis)
    return corners + centers[:, None, :]


def points_cam2img(points_3d: np.ndarray, proj: np.ndarray,
                   with_depth: bool = False) -> np.ndarray:
    """[..., 3] camera points -> [..., 2] pixels via a 3x4/4x4 P."""
    shape = points_3d.shape[:-1]
    pts = points_3d.reshape(-1, 3)
    p4 = np.eye(4)
    p4[:proj.shape[0], :proj.shape[1]] = proj
    uvw = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ p4.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    if with_depth:
        return np.concatenate([uv, uvw[:, 2:3]], 1).reshape(*shape, 3)
    return uv.reshape(*shape, 2)


def box3d_to_bbox(boxes: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """KITTI camera boxes [N, 7] -> tight image boxes [N, 4]."""
    corners = center_to_corner_box3d(boxes[:, :3], boxes[:, 3:6],
                                     boxes[:, 6])
    uv = points_cam2img(corners, proj)                   # [N, 8, 2]
    return np.concatenate([uv.min(axis=1), uv.max(axis=1)], axis=1)


def limit_period(val: np.ndarray, offset: float = 0.5,
                 period: float = np.pi) -> np.ndarray:
    """Wrap angles into [-offset*period, (1-offset)*period)."""
    return val - np.floor(val / period + offset) * period


def points_in_rbbox(points: np.ndarray, boxes: np.ndarray,
                    origin=(0.5, 0.5, 0.0)) -> np.ndarray:
    """[P, 3] points x [N, 7] lidar boxes -> [P, N] membership mask.

    Rotates points into each box frame (yaw about z) and compares
    against half-dims; replaces the reference's surface-equation numba
    path with a direct vectorized test.
    """
    centers = boxes[:, :3]
    dims = boxes[:, 3:6]
    yaw = boxes[:, 6]
    rel = points[:, None, :3] - centers[None, :, :]      # [P, N, 3]
    s, c = np.sin(-yaw), np.cos(-yaw)
    x = rel[..., 0] * c[None] - rel[..., 1] * s[None]
    y = rel[..., 0] * s[None] + rel[..., 1] * c[None]
    z = rel[..., 2]
    org = np.asarray(origin, np.float64)
    lo = -dims * org[None, :]
    hi = dims * (1.0 - org[None, :])
    return ((x >= lo[None, :, 0]) & (x <= hi[None, :, 0])
            & (y >= lo[None, :, 1]) & (y <= hi[None, :, 1])
            & (z >= lo[None, :, 2]) & (z <= hi[None, :, 2]))


def iou_2d(boxes: np.ndarray, query: np.ndarray,
           mode: str = 'iou', eps: float = 0.0) -> np.ndarray:
    """Axis-aligned [N, 4] x [K, 4] IoU/IoF (`box_np_ops.iou_jit`
    semantics incl. the +eps pixel convention), vectorized."""
    area_q = ((query[:, 2] - query[:, 0] + eps)
              * (query[:, 3] - query[:, 1] + eps))
    area_b = ((boxes[:, 2] - boxes[:, 0] + eps)
              * (boxes[:, 3] - boxes[:, 1] + eps))
    iw = (np.minimum(boxes[:, None, 2], query[None, :, 2])
          - np.maximum(boxes[:, None, 0], query[None, :, 0]) + eps)
    ih = (np.minimum(boxes[:, None, 3], query[None, :, 3])
          - np.maximum(boxes[:, None, 1], query[None, :, 1]) + eps)
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    if mode == 'iou':
        union = area_b[:, None] + area_q[None, :] - inter
    else:                                                # 'iof'
        union = area_b[:, None]
    return np.where(inter > 0, inter / np.maximum(union, 1e-12), 0.0)


def remove_outside_points(points: np.ndarray, r_rect: np.ndarray,
                          velo2cam: np.ndarray, proj: np.ndarray,
                          image_shape: Tuple[int, int]) -> np.ndarray:
    """Keep lidar points that project inside the image and in front of
    the camera (`box_np_ops.remove_outside_points` intent, implemented
    directly instead of via frustum surface equations)."""
    cam = lidar_to_camera(points[:, :3], r_rect, velo2cam)
    uvz = points_cam2img(cam, proj, with_depth=True)
    h, w = image_shape
    keep = ((uvz[:, 2] > 0) & (uvz[:, 0] >= 0) & (uvz[:, 0] < w)
            & (uvz[:, 1] >= 0) & (uvz[:, 1] < h))
    return points[keep]
