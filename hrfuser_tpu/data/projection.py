"""Offline sensor->image-plane projection math (numpy).

Rebuild of the projection half of the system: nuScenes lidar/radar ->
camera-plane "sensor images" (`tools/data_converter/nuscenes_converter.py:
281-587`, `nuscenes_explorer.py:834-989`) and the STF variant
(`SeeingThroughFog/tools/ProjectionTools/run_2d_projection_on_dataset.py`).

All geometry is dependency-free (quaternions handled here, no
pyquaternion/nuscenes-devkit needed); the dataset-specific CLI wrappers in
`tools/` call into these functions.

Storage format (matching the reference exactly):
    uint16 png, value = (raw + shift) * scale with scale=100, shift=200;
    background = shift * scale, which dequantizes to 0.

Z-buffer note: the reference's overwrite test compares the *quantized*
buffer against the *raw* distance (`nuscenes_converter.py:416-421`), which
is always true after the first write — i.e. effectively last-point-wins.
`mode='reference'` reproduces that byte-for-byte; `mode='zbuffer'` keeps
the nearest point (the documented intent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

SCALE = 100.0
SHIFT = 200.0


def quantize(values: np.ndarray, scale: float = SCALE,
             shift: float = SHIFT) -> np.ndarray:
    return ((values + shift) * scale).astype(np.uint16)


def dequantize(img: np.ndarray, scale: float = SCALE,
               shift: float = SHIFT) -> np.ndarray:
    return img.astype(np.float32) / scale - shift


def quat_to_rot(q) -> np.ndarray:
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def transform_matrix(translation, rotation_quat,
                     inverse: bool = False) -> np.ndarray:
    """4x4 homogeneous transform from translation + quaternion."""
    tm = np.eye(4)
    rot = quat_to_rot(rotation_quat)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = -rot.T @ np.asarray(translation)
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = np.asarray(translation)
    return tm


def project_to_image(points_cam: np.ndarray, intrinsic: np.ndarray,
                     img_wh: Tuple[int, int], min_dist: float = 1.0
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Pinhole projection of camera-frame points.

    Args:
        points_cam: [3, N] points in the camera frame (z forward).
        intrinsic: [3, 3].
        img_wh: (W, H) for the in-frame mask.

    Returns:
        (uv [2, N], mask [N]) — mask selects points in front of the camera
        (`z > min_dist`) and inside the image (1 px margin, matching
        `map_pointcloud_to_image`).
    """
    w, h = img_wh
    z = points_cam[2]
    uvw = intrinsic @ points_cam
    uv = uvw[:2] / np.maximum(uvw[2:3], 1e-9)
    mask = ((z > min_dist) & (uv[0] > 1) & (uv[0] < w - 1)
            & (uv[1] > 1) & (uv[1] < h - 1))
    return uv, mask


def _prep_pixels(uv: np.ndarray, scale_factor: float,
                 img_wh: Tuple[int, int]) -> np.ndarray:
    """Round + clip projected pixels onto the target grid ([N, 2] int)."""
    w, h = img_wh
    px = np.rint(uv.T / scale_factor)
    px[:, 0] = np.clip(px[:, 0], 0, w - 1)
    px[:, 1] = np.clip(px[:, 1], 0, h - 1)
    return px.astype(np.int32)


def splat_lidar(uv: np.ndarray, distances: np.ndarray,
                intensities: np.ndarray, points_cam: np.ndarray,
                target_wh: Tuple[int, int] = (640, 360),
                scale_factor: float = 2.5,
                mode: str = 'reference'
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Lidar points -> (rih, xz0) uint16 images.

    Channels: range, intensity, height (= -y_cam) and x_cam, z_cam, 0.
    """
    assert mode in ('reference', 'zbuffer')
    w, h = target_wh
    img = np.full((h, w, 6), SCALE * SHIFT, np.uint16)
    depth = np.full((h, w), np.inf)
    px = _prep_pixels(uv, scale_factor, target_wh)
    for (x, y), d, inten, p3d in zip(px, distances, intensities,
                                     points_cam.T):
        if mode == 'zbuffer' and depth[y, x] <= d:
            continue
        depth[y, x] = d
        img[y, x, 0] = np.uint16((d + SHIFT) * SCALE)
        img[y, x, 1] = np.uint16((inten + SHIFT) * SCALE)
        img[y, x, 2] = np.uint16((-p3d[1] + SHIFT) * SCALE)
        img[y, x, 3] = np.uint16((p3d[0] + SHIFT) * SCALE)
        img[y, x, 4] = np.uint16((p3d[2] + SHIFT) * SCALE)
    return img[:, :, :3], img[:, :, 3:]


def splat_radar_pillars(uv: np.ndarray, uv_top: np.ndarray,
                        distances: np.ndarray, rcs: np.ndarray,
                        velocities: np.ndarray, points_cam: np.ndarray,
                        target_wh: Tuple[int, int] = (640, 360),
                        scale_factor: float = 2.5,
                        mode: str = 'reference'
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Radar points -> (riv, xz0) images of vertical pillars.

    Each return is drawn as a column from its projected top endpoint
    (the 3 m-above-ground point computed by the caller) down to its
    ground projection (`nuscenes_converter.py:496-508`). Channels:
    range (xz-plane), RCS, ego-motion-compensated speed.
    """
    assert mode in ('reference', 'zbuffer')
    w, h = target_wh
    img = np.full((h, w, 6), SCALE * SHIFT, np.uint16)
    depth = np.full((h, w), np.inf)
    px = _prep_pixels(uv, scale_factor, target_wh)
    px_top = _prep_pixels(uv_top, scale_factor, target_wh)
    for (x, y), (_, y_top), d, r, v, p3d in zip(
            px, px_top, distances, rcs, velocities, points_cam.T):
        if y <= y_top:
            continue                       # reference skips inverted pillars
        if mode == 'zbuffer' and depth[y_top:y, x].min() <= d:
            continue
        depth[y_top:y, x] = np.minimum(depth[y_top:y, x], d)
        img[y_top:y, x, 0] = np.uint16((d + SHIFT) * SCALE)
        img[y_top:y, x, 1] = np.uint16((r + SHIFT) * SCALE)
        img[y_top:y, x, 2] = np.uint16((v + SHIFT) * SCALE)
        img[y_top:y, x, 3] = np.uint16((p3d[0] + SHIFT) * SCALE)
        img[y_top:y, x, 4] = np.uint16((p3d[2] + SHIFT) * SCALE)
    return img[:, :, :3], img[:, :, 3:]


def stf_splat(img_coords: np.ndarray, values: np.ndarray,
              target_wh: Tuple[int, int] = (1280, 768),
              radar: bool = False, mode: str = 'reference') -> np.ndarray:
    """STF lidar/radar -> 3-channel uint16 image
    (`SeeingThroughFog/.../run_2d_projection_on_dataset.py:create_img`).

    Lidar: per-pixel scatter of (y, z, intensity), last point wins.
    Radar: full-height columns of (height y, depth z, velocity) per
    return; the reference's overwrite test has the same quantized-compare
    quirk as nuScenes (always true after first write) — `mode='zbuffer'`
    applies the intended nearest-depth rule instead.

    Args:
        img_coords: [N, 2] integer (x, y) pixels.
        values: [N, 3] raw channel values.
    """
    w, h = target_wh
    img = np.full((w, h, 3), SCALE * SHIFT, np.uint16)   # note: x-major
    q = ((values + SHIFT) * SCALE).astype(np.uint16)
    coords = img_coords.astype(np.int32)
    if not radar:
        img[coords[:, 0], coords[:, 1], :] = q
    else:
        depth = np.full((w,), np.inf)
        for (x, _), qv, raw in zip(coords, q, values):
            if mode == 'zbuffer' and depth[x] <= raw[1]:
                continue
            depth[x] = raw[1]
            img[x, :, 0] = qv[0]
            img[x, :, 1] = qv[1]
            img[x, :, 2] = qv[2]
    return img.transpose(1, 0, 2)                        # -> [H, W, 3]


def box3d_corners(center, size, quat_wxyz) -> np.ndarray:
    """8 corners [3, 8] of a 3D box (w, l, h sizes; nuScenes convention:
    x-right/size[0]=w, y-forward/size[1]=l, z-up/size[2]=h)."""
    w, l, h = size
    x = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * (l / 2.0)
    y = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * (w / 2.0)
    z = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * (h / 2.0)
    corners = np.stack([x, y, z])
    return quat_to_rot(quat_wxyz) @ corners + np.asarray(center)[:, None]


def box3d_to_2d(corners_cam: np.ndarray, intrinsic: np.ndarray,
                img_wh: Tuple[int, int]) -> Optional[Tuple[float, ...]]:
    """Tight 2D box from camera-frame 3D corners
    (`nuscenes_converter.get_2d_boxes` / `post_process_coords` semantics:
    corners behind the camera are dropped, the convex extent is clipped to
    the image; None if no corner is in front / box fully outside)."""
    front = corners_cam[2] > 0.1
    if not front.any():
        return None
    pts = intrinsic @ corners_cam[:, front]
    uv = pts[:2] / pts[2:3]
    x1, y1 = uv.min(axis=1)
    x2, y2 = uv.max(axis=1)
    w, h = img_wh
    x1, x2 = np.clip([x1, x2], 0, w)
    y1, y2 = np.clip([y1, y2], 0, h)
    if x2 <= x1 or y2 <= y1:
        return None
    return float(x1), float(y1), float(x2), float(y2)


def radar_pillar_endpoints(points_sensor: np.ndarray,
                           pillar_height: float = 3.0) -> np.ndarray:
    """Top endpoints of radar pillars in the sensor frame: same (x, y),
    z raised to `pillar_height` (`nuscenes_explorer.py:966-971`)."""
    top = points_sensor.copy()
    top[2, :] = pillar_height
    return top
