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
