#!/usr/bin/env python
"""STF offline projection: velodyne/radar -> camera-frame sensor PNGs.

Rebuild of `SeeingThroughFog/tools/ProjectionTools/
run_2d_projection_on_dataset.py`: for every frame in a split, project the
lidar scan and radar targets into the (gated-cropped) camera frame and
write quantized uint16 'yzi' / 'yzv' images.

Usage:
    python tools/stf_projection.py --root data/dense \
        --calib-root calibs/ --split splits/train_clear.txt
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import os

import cv2
import numpy as np


def project_frame(scan, radar, k, t_velo2cam, target_wh=(1280, 768),
                  mode='reference'):
    """One frame: returns (yzi uint16 [H,W,3], yzv uint16 [H,W,3])."""
    from hrfuser_tpu.data.projection import project_to_image, stf_splat

    pts = scan[:, :3].T                                   # [3, N] velodyne
    pts_h = np.vstack([pts, np.ones((1, pts.shape[1]))])
    cam = (t_velo2cam @ pts_h)[:3]
    uv, mask = project_to_image(cam, k, target_wh, min_dist=1.0)
    coords = np.rint(uv[:, mask].T).astype(np.int32)
    np.clip(coords[:, 0], 0, target_wh[0] - 1, out=coords[:, 0])
    np.clip(coords[:, 1], 0, target_wh[1] - 1, out=coords[:, 1])
    # channels: height(-y_cam), depth(z_cam), intensity
    vals = np.stack([-cam[1, mask], cam[2, mask], scan[mask, 3]], -1)
    yzi = stf_splat(coords, vals, target_wh, radar=False, mode=mode)

    r_pts = radar[:, :3].T
    r_h = np.vstack([r_pts, np.ones((1, r_pts.shape[1]))])
    r_cam = (t_velo2cam @ r_h)[:3]
    r_uv, r_mask = project_to_image(r_cam, k, target_wh, min_dist=1.0)
    r_coords = np.rint(r_uv[:, r_mask].T).astype(np.int32)
    np.clip(r_coords[:, 0], 0, target_wh[0] - 1, out=r_coords[:, 0])
    np.clip(r_coords[:, 1], 0, target_wh[1] - 1, out=r_coords[:, 1])
    r_vals = np.stack([-r_cam[1, r_mask], r_cam[2, r_mask],
                       radar[r_mask, 3]], -1)
    yzv = stf_splat(r_coords, r_vals, target_wh, radar=True, mode=mode)
    return yzi, yzv


def main():
    from hrfuser_tpu.data.stf_io import (load_calib, load_radar_targets,
                                         load_velodyne_scan)

    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--calib-root', required=True)
    ap.add_argument('--split', required=True,
                    help='txt file of frame ids (one per line)')
    ap.add_argument('--lidar-dir', default='lidar_hdl64_strongest')
    ap.add_argument('--radar-dir', default='radar_targets')
    ap.add_argument('--mode', default='reference',
                    choices=['reference', 'zbuffer'])
    args = ap.parse_args()

    k, t = load_calib(args.calib_root)
    with open(args.split) as f:
        frames = [ln.strip().replace(',', '_') for ln in f if ln.strip()]

    out_lidar = os.path.join(args.root, 'lidar_projections', 'yzi')
    out_radar = os.path.join(args.root, 'radar_projections', 'yzv')
    os.makedirs(out_lidar, exist_ok=True)
    os.makedirs(out_radar, exist_ok=True)

    for fid in frames:
        scan = load_velodyne_scan(
            os.path.join(args.root, args.lidar_dir, fid + '.bin'))
        radar_path = os.path.join(args.root, args.radar_dir, fid + '.json')
        radar = (load_radar_targets(radar_path)
                 if os.path.exists(radar_path)
                 else np.zeros((0, 5)))
        yzi, yzv = project_frame(scan, radar, k, t, mode=args.mode)
        cv2.imwrite(os.path.join(out_lidar, fid + '.png'), yzi)
        cv2.imwrite(os.path.join(out_radar, fid + '.png'), yzv)
        print(f'[stf] {fid}')


if __name__ == '__main__':
    main()
