"""STF gated-camera -> RGB-frame warping (numpy/cv2).

Rebuild of the Gated2RGB preprocessing
(`SeeingThroughFog/tools/ProjectionTools/Gated2RGB/`): the gated camera
sits in its own frame; its slices are re-rendered into the RGB camera
frame either (a) per-pixel via stereo depth + the calib TF tree
(`image_transformer.py` / `run_depth_warping.py`) or (b) through a global
homography fallback (`warp_gatedimage.py:34-60`). Both are exposed here
as geometry functions; the offline CLI wires them to the STF calib files.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np


def depth_warp(src_img: np.ndarray, src_depth: np.ndarray,
               k_src: np.ndarray, k_tgt: np.ndarray,
               t_src_to_tgt: np.ndarray,
               tgt_wh: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """Forward-warp `src_img` into the target camera using per-pixel depth.

    Every source pixel is back-projected with its depth, transformed with
    the extrinsic `t_src_to_tgt` (4x4), projected with `k_tgt`, and
    splatted with a z-buffer (nearest depth wins).

    Args:
        src_img: [H, W] or [H, W, C].
        src_depth: [H, W] metric depth (<=0 = invalid).
        tgt_wh: (W_t, H_t).

    Returns:
        (warped [H_t, W_t, C], valid_mask [H_t, W_t]).
    """
    h, w = src_depth.shape
    wt, ht = tgt_wh
    img = src_img[..., None] if src_img.ndim == 2 else src_img
    c = img.shape[2]

    ys, xs = np.mgrid[0:h, 0:w]
    valid = src_depth > 0
    z = src_depth[valid]
    px = np.stack([xs[valid] * z, ys[valid] * z, z])       # [3, N]
    pts_src = np.linalg.inv(k_src) @ px
    pts_h = np.vstack([pts_src, np.ones((1, pts_src.shape[1]))])
    pts_tgt = (t_src_to_tgt @ pts_h)[:3]

    zt = pts_tgt[2]
    front = zt > 1e-6
    uvw = k_tgt @ pts_tgt[:, front]
    u = np.rint(uvw[0] / uvw[2]).astype(np.int64)
    v = np.rint(uvw[1] / uvw[2]).astype(np.int64)
    zt = zt[front]
    vals = img[valid][front]

    inb = (u >= 0) & (u < wt) & (v >= 0) & (v < ht)
    u, v, zt, vals = u[inb], v[inb], zt[inb], vals[inb]

    out = np.zeros((ht, wt, c), img.dtype)
    zbuf = np.full((ht, wt), np.inf)
    # z-buffered splat: sort far-to-near so the nearest write lands last
    order = np.argsort(-zt)
    out[v[order], u[order]] = vals[order]
    zbuf[v[order], u[order]] = zt[order]
    return out, np.isfinite(zbuf)


def inverse_depth_warp(src_img: np.ndarray, tgt_depth: np.ndarray,
                       k_src: np.ndarray, k_tgt: np.ndarray,
                       t_tgt_to_src: np.ndarray,
                       ego_offset: Optional[np.ndarray] = None
                       ) -> np.ndarray:
    """Inverse warp: render `src_img` onto the TARGET grid using the
    target camera's per-pixel depth.

    This is the reference's `image_transformer.transform_with_target_depth`
    scheme (Gated2RGB): back-project every target pixel with its stereo
    depth, optionally shift by the ego-motion offset (`:201-202`),
    transform into the source camera, project with `k_src` and bilinearly
    sample the source image. No holes, unlike forward splatting.

    Args:
        src_img: [H_s, W_s] or [H_s, W_s, C].
        tgt_depth: [H_t, W_t] metric depth (<=0 treated as far plane).
        t_tgt_to_src: 4x4 target-cam -> source-cam extrinsic.
        ego_offset: optional [3] translation applied to the target-frame
            points (the reference's speed/steering/delay correction).

    Returns:
        warped [H_t, W_t, C] float32 (0 where the sample falls outside).
    """
    ht, wt = tgt_depth.shape
    img = src_img[..., None] if src_img.ndim == 2 else src_img
    hs, ws, c = img.shape

    z = np.where(tgt_depth > 0, tgt_depth, 250.0).astype(np.float64)
    ys, xs = np.mgrid[0:ht, 0:wt]
    px = np.stack([xs.ravel() * z.ravel(), ys.ravel() * z.ravel(),
                   z.ravel()])                             # [3, N]
    pts_tgt = np.linalg.inv(k_tgt) @ px
    if ego_offset is not None:
        pts_tgt = pts_tgt + np.asarray(ego_offset, np.float64)[:, None]
    pts_h = np.vstack([pts_tgt, np.ones((1, pts_tgt.shape[1]))])
    pts_src = (t_tgt_to_src @ pts_h)[:3]

    zs = pts_src[2]
    ok = zs > 1e-6
    u = np.zeros(zs.shape)
    v = np.zeros(zs.shape)
    uvw = k_src @ pts_src[:, ok]
    u[ok] = uvw[0] / uvw[2]
    v[ok] = uvw[1] / uvw[2]

    ok &= (u >= 0) & (u <= ws - 1) & (v >= 0) & (v <= hs - 1)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    u0c = np.clip(u0, 0, ws - 2)
    v0c = np.clip(v0, 0, hs - 2)
    fu = (u - u0c)[:, None]
    fv = (v - v0c)[:, None]
    f = img.astype(np.float64)
    val = ((1 - fv) * ((1 - fu) * f[v0c, u0c] + fu * f[v0c, u0c + 1])
           + fv * ((1 - fu) * f[v0c + 1, u0c] + fu * f[v0c + 1, u0c + 1]))
    val[~ok] = 0.0
    return val.reshape(ht, wt, c).astype(np.float32)


def ego_motion_offset(speed_mps: float, heading_deg: float,
                      delay_s: float) -> np.ndarray:
    """Target-frame point offset for ego motion during a slice delay
    (`image_transformer.py:201-202`: z -= cos(a)*v*dt, y += sin(a)*v*dt)."""
    a = np.deg2rad(heading_deg)
    return np.array([0.0, np.sin(a) * speed_mps * delay_s,
                     -np.cos(a) * speed_mps * delay_s])


def homography_from_points(src_pts: np.ndarray, dst_pts: np.ndarray,
                           ransac_thresh: float = 10.0) -> np.ndarray:
    """RANSAC homography (the reference's hand-labeled-points fallback)."""
    m, _ = cv2.findHomography(
        np.asarray(src_pts, np.float32).reshape(-1, 1, 2),
        np.asarray(dst_pts, np.float32).reshape(-1, 1, 2),
        method=cv2.RANSAC, ransacReprojThreshold=ransac_thresh)
    return m


def homography_warp(src_img: np.ndarray, m: np.ndarray,
                    tgt_wh: Tuple[int, int]) -> np.ndarray:
    return cv2.warpPerspective(src_img, m, tgt_wh)


def disparity_to_depth(disparity: np.ndarray, focal: float,
                       baseline: float) -> np.ndarray:
    """Stereo disparity -> metric depth (`image_transformer.
    disparity2depth_psm` semantics: depth = f * B / disparity)."""
    depth = np.zeros_like(disparity, np.float32)
    ok = disparity > 0
    depth[ok] = focal * baseline / disparity[ok]
    return depth
