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


def convex_hull_2d(pts: np.ndarray) -> np.ndarray:
    """Convex hull of [N, 2] points (Andrew's monotone chain), CCW order."""
    pts = np.unique(np.asarray(pts, np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort (x, then y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])


def clip_polygon_to_rect(poly: np.ndarray, x_max: float, y_max: float,
                         x_min: float = 0.0, y_min: float = 0.0
                         ) -> np.ndarray:
    """Sutherland–Hodgman clip of a convex polygon against an axis-aligned
    rectangle. Returns the clipped polygon vertices ([M, 2], possibly
    empty)."""
    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def x_cut(a, b, x):
        t = (x - a[0]) / (b[0] - a[0])
        return np.array([x, a[1] + t * (b[1] - a[1])])

    def y_cut(a, b, y):
        t = (y - a[1]) / (b[1] - a[1])
        return np.array([a[0] + t * (b[0] - a[0]), y])

    pts = [p for p in np.asarray(poly, np.float64)]
    for inside, intersect in (
            (lambda p: p[0] >= x_min, lambda a, b: x_cut(a, b, x_min)),
            (lambda p: p[0] <= x_max, lambda a, b: x_cut(a, b, x_max)),
            (lambda p: p[1] >= y_min, lambda a, b: y_cut(a, b, y_min)),
            (lambda p: p[1] <= y_max, lambda a, b: y_cut(a, b, y_max))):
        if not pts:
            return np.zeros((0, 2))
        pts = clip_edge(pts, inside, intersect)
    return np.asarray(pts) if pts else np.zeros((0, 2))


def box3d_to_2d(corners_cam: np.ndarray, intrinsic: np.ndarray,
                img_wh: Tuple[int, int]) -> Optional[Tuple[float, ...]]:
    """Tight 2D box from camera-frame 3D corners.

    Exact `nuscenes_converter.get_2d_boxes`/`post_process_coords`
    semantics: corners behind the camera (z <= 0) are dropped, the convex
    hull of the projected corners is intersected with the image canvas
    (shapely in the reference; monotone-chain hull + polygon clip here),
    and the intersection's bounding box is returned. None if no corner is
    in front or the hull misses the canvas."""
    front = corners_cam[2] > 0
    if not front.any():
        return None
    pts = intrinsic @ corners_cam[:, front]
    uv = (pts[:2] / pts[2:3]).T                           # [N, 2]
    w, h = img_wh
    hull = convex_hull_2d(uv)
    if len(hull) == 1:                                    # degenerate: point
        clipped = hull if (0 <= hull[0, 0] <= w
                           and 0 <= hull[0, 1] <= h) else np.zeros((0, 2))
    elif len(hull) == 2:                                  # degenerate: segment
        clipped = clip_polygon_to_rect(np.vstack([hull, hull[::-1]]), w, h)
    else:
        clipped = clip_polygon_to_rect(hull, w, h)
    if len(clipped) == 0:
        return None
    x1, y1 = clipped.min(axis=0)
    x2, y2 = clipped.max(axis=0)
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
