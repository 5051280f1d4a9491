#!/usr/bin/env python
"""SeeingThroughFog gated->RGB depth warping CLI.

Rebuild of `SeeingThroughFog/tools/ProjectionTools/Gated2RGB/
run_depth_warping.py`: for every frame in a split, the three gated
slices are re-rendered into the RGB stereo-left frame using per-pixel
stereo depth (SGM/PSMNet disparity), ego-motion compensation (vehicle
speed + steering heading x per-slice capture delay), max-accumulated and
written as grey PNGs to `gated_acc_wraped_grey/` at the reference's RGB
crop (768x1280 @ (202, 280)).

The warp geometry lives in `hrfuser_tpu.data.gated_warp`; calib/split IO
in `hrfuser_tpu.data.stf_io`.

Usage:
    python tools/stf_gated_warp.py --root data/dense \
        --split SeeingThroughFog/splits/all.txt \
        --depth-folder cam_stereo_sgm
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import os
import os.path as osp

import numpy as np

GATED_SLICES = ('gated0', 'gated1', 'gated2')
# RGB2Gatedv2 crop (CreateTFRecords/generic_tf_tools/resize.py:100-107)
CROP = (202, 970, 280, 1560)
# stereo-left rig constants (`image_transformer.disparity2depth_psm`)
STEREO_BASELINE = 0.202993
STEREO_FOCAL = 2355.722801


def _load_json(path, key, default=0.0):
    if osp.exists(path):
        with open(path) as f:
            return json.load(f)[key]
    return default


def _slice_delays(root: str, frame: str):
    """Per-slice capture delay vs the RGB frame, seconds
    (`run_depth_warping.py:159-166`); 0 when timestamps are absent."""
    ts_path = osp.join(root, 'timestamps.json')
    if not osp.exists(ts_path):
        return {g: 0.0 for g in GATED_SLICES}
    with open(ts_path) as f:
        data = json.load(f)

    def t(sensor):
        return int(data[sensor][frame].split('_')[1])

    rgb = t('rgb')
    return {g: (t(g) - rgb) / 1e9 for g in GATED_SLICES}


def warp_frame(root: str, frame: str, depth_folder: str,
               use_lut8: bool = False) -> np.ndarray:
    """Warp + accumulate one frame's gated slices; returns the grey
    uint8/uint16 image at the RGB crop."""
    import cv2

    from hrfuser_tpu.data.gated_warp import (disparity_to_depth,
                                             ego_motion_offset,
                                             inverse_depth_warp)
    from hrfuser_tpu.data.stf_io import load_calib
    from hrfuser_tpu.data.stf_lut import gated_raw_to_lut8

    k_rgb, t_velo_to_rgb = load_calib(
        root, camera_calib='calib_cam_stereo_left.json')
    k_gated, t_velo_to_gated = load_calib(
        root, camera_calib='calib_gated_bwv.json')
    # RGB optical frame -> gated optical frame (via the velodyne root)
    t_rgb_to_gated = t_velo_to_gated @ np.linalg.inv(t_velo_to_rgb)

    disp = np.load(osp.join(root, depth_folder, frame + '.npz'))['arr_0']
    if 'psmnet' in depth_folder:
        # PSMNet ran at half resolution (`run_depth_warping.py:76-79`)
        disp = 2.0 * disp
    disp = np.nan_to_num(disp, nan=float(np.nanmean(disp) or 1.0))
    depth = disparity_to_depth(disp, STEREO_FOCAL, STEREO_BASELINE)
    depth = cv2.resize(depth, (1920, 1024))

    speed = _load_json(
        osp.join(root, 'filtered_relevant_can_data/can_body_basic',
                 frame + '.json'), 'VehSpd_Disp') / 3.6
    steer = _load_json(
        osp.join(root, 'filtered_relevant_can_data/can_body_chassis',
                 frame + '.json'), 'StWhl_Angl') / 520.0 * 30.0
    delays = _slice_delays(root, frame)

    warped = []
    for g in GATED_SLICES:
        path = osp.join(root, f'{g}_raw', frame + '.tiff')
        raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if raw is None:
            raise FileNotFoundError(path)
        img = gated_raw_to_lut8(raw) if use_lut8 else raw
        out = inverse_depth_warp(
            img, depth, k_gated, k_rgb, t_rgb_to_gated,
            ego_offset=ego_motion_offset(speed, steer, delays[g]))
        warped.append(out[..., 0])

    acc = np.max(np.stack(warped), axis=0)
    acc = acc.astype(np.uint8 if use_lut8 else np.uint16)
    return acc[CROP[0]:CROP[1], CROP[2]:CROP[3]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--split', required=True,
                    help='split txt (scene,frame per line)')
    ap.add_argument('--depth-folder', default='cam_stereo_sgm',
                    choices=['cam_stereo_sgm', 'psmnet_sweden'])
    ap.add_argument('--out-folder', default='gated_acc_wraped_grey')
    ap.add_argument('--lut8', action='store_true',
                    help='tone-map slices to 8-bit before warping')
    args = ap.parse_args()

    import cv2

    from hrfuser_tpu.data.stf_io import load_split

    out_dir = osp.join(args.root, args.out_folder)
    os.makedirs(out_dir, exist_ok=True)
    frames = load_split(args.split)
    done = 0
    for frame in frames:
        out_path = osp.join(out_dir, frame + '.png')
        if osp.exists(out_path):
            continue
        img = warp_frame(args.root, frame, args.depth_folder, args.lut8)
        cv2.imwrite(out_path, img)
        done += 1
        if done % 50 == 0:
            print(f'[gated_warp] {done}/{len(frames)}')
    print(f'[gated_warp] wrote {done} frames to {out_dir}')


if __name__ == '__main__':
    main()
