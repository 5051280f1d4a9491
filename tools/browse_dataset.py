#!/usr/bin/env python
"""Pipeline visualization tool.

Rebuild of `tools/misc/browse_dataset.py` / `browse_dataset_nus_vis.py`:
runs the training pipeline on dataset samples and writes composites of
the (de-normalized) camera image with gt boxes plus each sensor-image
channel as a heatmap.

Usage:
    python tools/browse_dataset.py cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
        --data-root data/nuscenes --out-dir vis/ --num 10
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import os

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--data-root', required=True)
    ap.add_argument('--out-dir', default='vis')
    ap.add_argument('--num', type=int, default=10)
    args = ap.parse_args()

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.data import norms
    from hrfuser_tpu.data.loader import build_pipeline
    from hrfuser_tpu.utils.visualization import (denormalize_image,
                                                 draw_detections,
                                                 sensor_image_to_heatmap)

    cfg = get_config(args.config)
    if cfg.data.dataset == 'stf':
        from hrfuser_tpu.data.datasets.kitti2d import Kitti2DDataset
        dataset = Kitti2DDataset('dense_infos_train.pkl', cfg.data.classes,
                                 data_root=args.data_root)
        norm = norms.STF
    else:
        from hrfuser_tpu.data.datasets.coco import CocoFusionDataset
        dataset = CocoFusionDataset('nuscenes_infos_train_mono3d.coco.json',
                                    cfg.data.classes,
                                    data_root=args.data_root)
        norm = norms.NUS

    pipe = build_pipeline(cfg.data, train=True)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.num, len(dataset))):
        res = dataset.sample(i)
        res['rng'] = np.random.default_rng(i)
        out = pipe(res)
        img = denormalize_image(out['img'], **norm['img'])
        v = out['gt_valid']
        img = draw_detections(img, out['gt_boxes'][v], out['gt_labels'][v],
                              class_names=cfg.data.classes)
        panels = [img]
        for m in cfg.data.modalities:
            panels.append(sensor_image_to_heatmap(out[f'{m}_img']))
        composite = np.concatenate(panels, axis=0)
        cv2.imwrite(os.path.join(args.out_dir, f'sample_{i}.jpg'), composite)
        print(f'[browse] sample_{i}.jpg')


if __name__ == '__main__':
    main()
