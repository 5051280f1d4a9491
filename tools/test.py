#!/usr/bin/env python
"""Evaluation CLI.

Rebuild of the reference `tools/test.py`: config + checkpoint -> batched
inference over the test split -> metric (`--eval bbox` equivalent is the
default). `--synthetic` drives the full pipeline end-to-end on random
data without datasets (smoke/latency checks).

Usage:
    python tools/test.py cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
        --checkpoint work_dirs/.../latest --data-root data/nuscenes
    python tools/test.py tiny_fusion_test --synthetic
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Test a detector')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--data-root', default='')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--synthetic', action='store_true')
    p.add_argument('--img-hw', type=int, nargs=2, default=None,
                   help='override input H W (synthetic mode)')
    p.add_argument('--out', default=None, help='dump metrics json')
    p.add_argument('--eval', default='bbox', dest='eval_metrics',
                   help='comma-separated metrics: bbox and/or '
                        'proposal_fast (reference --eval; '
                        '`mmdet/datasets/coco.py:331-351,485-486`)')
    p.add_argument('--show-dir', default=None,
                   help='render detections onto the original images and '
                        'write PNGs here (reference --show-dir)')
    p.add_argument('--show-score-thr', type=float, default=0.3)
    return p.parse_args()


def main():
    args = parse_args()
    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN, predict
    from hrfuser_tpu.utils.checkpoint import load_weights

    cfg = get_config(args.config)
    det = CascadeRCNN(cfg.model)
    nmod = cfg.model.backbone.num_fused_modalities
    mod_ch = cfg.model.backbone.mod_in_channels

    if args.synthetic:
        if args.img_hw:
            h, w = args.img_hw
        else:
            w, h = cfg.data.img_scale
            h = (h + 31) // 32 * 32
            w = (w + 31) // 32 * 32
        b = args.batch_size or 2
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(0, 1, (b, h, w, 3)), jnp.float32)
        mods = [jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.float32)
                for c in mod_ch] if nmod else None
        variables = jax.jit(functools.partial(det.init, train=False))(
            jax.random.PRNGKey(0), img, mods)
        if args.checkpoint:
            variables = load_weights(args.checkpoint, variables)
        pred = jax.jit(functools.partial(predict, det))
        t0 = time.time()
        out = pred(variables, img, mods)
        jax.block_until_ready(out)
        print(f'[synthetic] compile+run {time.time() - t0:.1f}s')
        t0 = time.time()
        out = pred(variables, img, mods)
        jax.block_until_ready(out)
        dt = time.time() - t0
        nvalid = int(np.asarray(out.valid).sum())
        print(f'[synthetic] {b} imgs in {dt * 1e3:.1f} ms '
              f'({b / dt:.1f} img/s); {nvalid} detections')
        if args.out:
            with open(args.out, 'w') as f:
                json.dump({'synthetic_img_per_s': round(b / dt, 2),
                           'num_detections': nvalid}, f, indent=2)
        return

    from hrfuser_tpu.apis.test import evaluate, run_inference
    from hrfuser_tpu.data.loader import DetDataLoader
    if cfg.data.dataset == 'stf':
        from hrfuser_tpu.data.datasets.kitti2d import Kitti2DDataset
        splits = ['dense_infos_test_clear.pkl', 'dense_infos_light_fog.pkl',
                  'dense_infos_dense_fog.pkl', 'dense_infos_snow.pkl']
        dataset = Kitti2DDataset(splits, cfg.data.classes,
                                 data_root=args.data_root, test_mode=True)
    else:
        from hrfuser_tpu.data.datasets.coco import CocoFusionDataset
        dataset = CocoFusionDataset('nuscenes_infos_val_mono3d.coco.json',
                                    cfg.data.classes,
                                    data_root=args.data_root,
                                    test_mode=True)
    bs = args.batch_size or max(len(jax.devices()), 1)
    loader = DetDataLoader(dataset, cfg.data, bs, train=False)

    # init + load
    batch = next(iter(loader))
    img = jnp.asarray(batch['img'][:1])
    mods = ([jnp.asarray(m[:1]) for m in batch['mod_imgs']]
            if nmod else None)
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)
    if args.checkpoint:
        variables = load_weights(args.checkpoint, variables)
    else:
        print('[warn] no --checkpoint: evaluating random weights')

    results = run_inference(det, variables, loader)
    wanted = [m.strip() for m in args.eval_metrics.split(',') if m.strip()]
    metrics = {}
    if 'bbox' in wanted:
        metrics.update(evaluate(cfg, results, dataset))
    if 'proposal_fast' in wanted:
        from hrfuser_tpu.apis.test import evaluate_proposal_recall
        metrics.update(evaluate_proposal_recall(results, dataset))
    for k, v in metrics.items():
        print(f'{k}: {v:.4f}')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(metrics, f, indent=2)

    if args.show_dir:
        import os

        import cv2

        from hrfuser_tpu.utils.visualization import draw_detections
        os.makedirs(args.show_dir, exist_ok=True)
        prefix = getattr(dataset, 'img_prefix', args.data_root)
        n_drawn = 0
        for r in results:
            fname = (r['meta'] or {}).get('filename')
            if not fname:
                continue
            path = fname if _osp.isabs(fname) else _osp.join(prefix, fname)
            img = cv2.imread(path)
            if img is None:
                continue
            vis = draw_detections(img, r['boxes'], r['labels'],
                                  r['scores'],
                                  class_names=cfg.data.classes,
                                  score_thr=args.show_score_thr)
            out_name = _osp.basename(fname)
            cv2.imwrite(_osp.join(args.show_dir, out_name), vis)
            n_drawn += 1
        print(f'[show] wrote {n_drawn} visualizations to {args.show_dir}')


if __name__ == '__main__':
    main()
