#!/usr/bin/env python
"""Offline data preparation CLI.

Rebuild of the reference `tools/create_data.py` +
`tools/data_converter/nuscenes_converter.py`: walks nuScenes samples,
projects LIDAR_TOP and the 5 radars into every camera at 640x360, writes
quantized uint16 sensor PNGs (rih/xz0, riv/xz0), and emits
`nuscenes_infos_{train,val}_mono3d.coco.json` — the extended COCO json
with `lidar_projections` / `radar_projections` arrays consumed by
`hrfuser_tpu.data.datasets.coco`.

The geometry/splat math lives dependency-free in
`hrfuser_tpu/data/projection.py` and the json assembly in
`hrfuser_tpu/data/nuscenes_export.py`; this CLI needs the `nuscenes`
devkit for DB access and is gated on its availability.

Usage:
    python tools/create_data.py nuscenes --root-path data/nuscenes \
        --version v1.0-trainval
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import os
import os.path as osp
import pickle

import numpy as np

CAMS = ['CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_FRONT_LEFT', 'CAM_BACK',
        'CAM_BACK_LEFT', 'CAM_BACK_RIGHT']
RADARS = ['RADAR_FRONT', 'RADAR_FRONT_LEFT', 'RADAR_FRONT_RIGHT',
          'RADAR_BACK_LEFT', 'RADAR_BACK_RIGHT']


def nuscenes_data_prep(root_path: str, version: str, out_dir: str = None,
                       skip_pngs: bool = False):
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils import splits as nus_splits
        from nuscenes.utils.data_classes import (LidarPointCloud,
                                                 RadarPointCloud)
    except ImportError as e:
        raise SystemExit(
            'The nuScenes devkit is required for offline conversion '
            '(`pip install nuscenes-devkit` on a machine with network '
            'access). The projection/export math itself is self-contained '
            'in hrfuser_tpu/data/{projection,nuscenes_export}.py.') from e

    import cv2
    from hrfuser_tpu.data.nuscenes_export import export_2d_annotation
    from hrfuser_tpu.data.projection import (SCALE, SHIFT,
                                             project_to_image,
                                             radar_pillar_endpoints,
                                             splat_lidar,
                                             splat_radar_pillars,
                                             transform_matrix)

    out_dir = out_dir or root_path
    nusc = NuScenes(version=version, dataroot=root_path, verbose=True)

    if version == 'v1.0-trainval':
        train_scenes = set(nus_splits.train)
        val_scenes = set(nus_splits.val)
    elif version == 'v1.0-mini':
        train_scenes = set(nus_splits.mini_train)
        val_scenes = set(nus_splits.mini_val)
    elif version == 'v1.0-test':
        train_scenes, val_scenes = set(nus_splits.test), set()
    else:
        raise SystemExit(f'unknown version {version}')

    for sub in ('lidar_samples/rih', 'lidar_samples/xz0',
                'radar_samples/riv', 'radar_samples/xz0'):
        os.makedirs(osp.join(out_dir, sub), exist_ok=True)

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

    def group_info(folder, groups, token):
        """Per-camera projection info entry (reference `:426-431`)."""
        entry = {'width': 640, 'height': 360,
                 'background': SCALE * SHIFT, 'img_scale_factor': 2.5}
        for g, empty in groups:
            entry[g] = {
                'file_name': osp.join(folder, g, token + '.png'),
                'pixel_scale_factor': SCALE, 'shift': SHIFT,
                'empty_channels': empty,
            }
        return entry

    train_infos, val_infos = [], []
    for si, sample in enumerate(nusc.sample):
        scene = nusc.get('scene', sample['scene_token'])
        dest = (train_infos if scene['name'] in train_scenes
                else val_infos if scene['name'] in val_scenes else None)
        if dest is None:
            continue
        lidar_sd = nusc.get('sample_data', sample['data']['LIDAR_TOP'])
        pose = nusc.get('ego_pose', lidar_sd['ego_pose_token'])
        pc = LidarPointCloud.from_file(
            osp.join(root_path, lidar_sd['filename']))
        info = {'token': sample['token'],
                'timestamp': sample['timestamp'],
                'ego2global_translation': pose['translation'],
                'ego2global_rotation': pose['rotation'],
                'cams': {}, 'lidar_img': {}, 'radar_img': {}}
        for cam in CAMS:
            cam_sd = nusc.get('sample_data', sample['data'][cam])
            cs_cam = nusc.get('calibrated_sensor',
                              cam_sd['calibrated_sensor_token'])
            k = np.asarray(cs_cam['camera_intrinsic'])
            wh = (cam_sd['width'], cam_sd['height'])
            info['cams'][cam] = {
                'sample_data_token': cam_sd['token'],
                'data_path': cam_sd['filename'],
                'cam_intrinsic': cs_cam['camera_intrinsic'],
                'sensor2ego_translation': cs_cam['translation'],
                'sensor2ego_rotation': cs_cam['rotation'],
                'width': cam_sd['width'], 'height': cam_sd['height'],
            }
            info['lidar_img'][cam] = group_info(
                'lidar_samples', [('rih', None), ('xz0', [2])],
                cam_sd['token'])
            info['radar_img'][cam] = group_info(
                'radar_samples', [('riv', None), ('xz0', [2])],
                cam_sd['token'])
            if skip_pngs:
                continue

            pts_cam = sensor_to_cam_points(pc.points, lidar_sd, cam_sd)
            uv, mask = project_to_image(pts_cam, k, wh)
            dist = np.linalg.norm(pts_cam[:, mask], axis=0)
            inten = pc.points[3, mask]
            rih, xz0 = splat_lidar(uv[:, mask], dist, inten,
                                   pts_cam[:, mask])
            li = info['lidar_img'][cam]
            cv2.imwrite(osp.join(out_dir, li['rih']['file_name']), rih)
            cv2.imwrite(osp.join(out_dir, li['xz0']['file_name']), xz0)

            # radar pillars from all 5 radars
            all_uv, all_uv_top, all_d, all_rcs, all_v, all_p = \
                [], [], [], [], [], []
            for radar in RADARS:
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
            riv, rxz0 = splat_radar_pillars(
                np.concatenate(all_uv, 1), np.concatenate(all_uv_top, 1),
                np.concatenate(all_d), np.concatenate(all_rcs),
                np.concatenate(all_v), np.concatenate(all_p, 1))
            ri = info['radar_img'][cam]
            cv2.imwrite(osp.join(out_dir, ri['riv']['file_name']), riv)
            cv2.imwrite(osp.join(out_dir, ri['xz0']['file_name']), rxz0)
        dest.append(info)
        if si % 100 == 0:
            print(f'[create_data] {si}/{len(nusc.sample)} samples')

    for split, infos in (('train', train_infos), ('val', val_infos)):
        if not infos:
            continue
        base = osp.join(out_dir, f'nuscenes_infos_{split}')
        with open(base + '.pkl', 'wb') as f:
            pickle.dump({'infos': infos, 'metadata': {'version': version}},
                        f)
        export_2d_annotation(nusc, infos, base + '_mono3d.coco.json')
        print(f'[create_data] wrote {base}_mono3d.coco.json '
              f'({len(infos)} samples)')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('dataset', choices=['nuscenes'])
    ap.add_argument('--root-path', required=True)
    ap.add_argument('--version', default='v1.0-trainval')
    ap.add_argument('--out-dir', default=None)
    ap.add_argument('--skip-pngs', action='store_true',
                    help='only (re)generate the annotation jsons')
    args = ap.parse_args()
    if args.dataset == 'nuscenes':
        nuscenes_data_prep(args.root_path, args.version, args.out_dir,
                           args.skip_pngs)


if __name__ == '__main__':
    main()
