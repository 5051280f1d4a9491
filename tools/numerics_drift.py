#!/usr/bin/env python
"""Quantify bf16-vs-f32 detection drift through the full detector.

Pre-certifies numerics for the real-checkpoint parity day (VERDICT r3
next #7): the accuracy bar is "mAP within 0.1" of the reference
(BASELINE.md), and the bench config runs bf16 end-to-end, so the risk
to bound is how far bf16 compute moves boxes / scores / ranks relative
to the f32 path on the SAME weights. Reference numerics surface being
matched: fp32 torch inference (the reference has no AMP eval path).

Method: N seeded synthetic batches through `predict` twice (f32 and
bf16 params/compute), matching detections pairwise per image in score
rank. Reported per batch and aggregate:
  * max / p99 box-corner delta (pixels) over matched valid detections
  * max / p99 score delta
  * rank churn: fraction of top-K detections whose identity differs
    (greedy IoU>=0.7 box matching between the two runs)
  * valid-count delta (NMS boundary effects)

Usage:
    python tools/numerics_drift.py [--batches 4] [--batch 4] [--topk 50]
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _iou_matrix(a, b):
    """[N,4] x [M,4] -> [N,M] IoU (numpy, xyxy)."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(
        a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
        b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    ap.add_argument('--batches', type=int, default=4)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--hw', type=int, nargs=2, default=(384, 640))
    ap.add_argument('--topk', type=int, default=50)
    ap.add_argument('--overfit-steps', type=int, default=0,
                    help='first overfit the model on one fixed synthetic '
                         'GT batch for N steps (bf16 train step, f32 '
                         'master params), then measure drift on THAT '
                         'batch. Random-init weights produce near-'
                         'uniform scores whose NMS survivors are tie-'
                         'broken by rounding noise (rank churn ~1 by '
                         'construction, meaningless for parity risk); '
                         'confident detections are the regime the '
                         '"mAP within 0.1" bar lives in.')
    args = ap.parse_args()

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN, predict

    h, w = args.hw
    cfg = get_config(args.config)
    nmod = cfg.model.backbone.num_fused_modalities

    det32 = CascadeRCNN(cfg.model, dtype=None)
    det16 = CascadeRCNN(cfg.model, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.normal(0., 1., (args.batch, h, w, 3)),
                       jnp.float32)
    mods0 = [jnp.asarray(rng.normal(0., 1., (args.batch, h, w, c)),
                         jnp.float32)
             for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]
    mods0 = mods0 if nmod else None

    # ONE set of weights (f32 master), shared by both paths — flax casts
    # per-module via the dtype attribute, params stay f32.
    variables = jax.jit(functools.partial(det32.init, train=True))(
        jax.random.PRNGKey(0), img0, mods0) if args.overfit_steps else \
        jax.jit(functools.partial(det32.init, train=False))(
            jax.random.PRNGKey(0), img0, mods0)

    eval_batches = None
    if args.overfit_steps:
        import sys as _s
        _s.path.insert(0, _osp.dirname(_osp.abspath(__file__)))
        from train import synthetic_batches
        from hrfuser_tpu.apis.train import (create_train_state,
                                            make_train_step)
        batch = next(synthetic_batches(cfg, args.batch, hw=(h, w), pool=1))
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        state, tx = create_train_state(det16, variables, cfg.optim,
                                       cfg.schedule, steps_per_epoch=1000)
        step_fn = jax.jit(make_train_step(det16, tx), donate_argnums=0)
        rng_t = jax.random.PRNGKey(7)
        for i in range(args.overfit_steps):
            state, metrics = step_fn(state, batch, rng_t)
            if (i + 1) % 50 == 0 or i == 0:
                print(f'[overfit {i + 1}/{args.overfit_steps}] '
                      f'loss={float(metrics["loss"]):.4f}', flush=True)
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        eval_batches = [(batch['img'],
                         list(batch.get('mod_imgs', [])) or None)]

    p32 = jax.jit(functools.partial(predict, det32))
    p16 = jax.jit(functools.partial(predict, det16))

    box_deltas, score_deltas, churns, cnt_deltas = [], [], [], []
    for bi in range(len(eval_batches) if eval_batches else args.batches):
        if eval_batches:
            img, mods = eval_batches[bi]
        else:
            r = np.random.default_rng(100 + bi)
            img = jnp.asarray(r.normal(0., 1., (args.batch, h, w, 3)),
                              jnp.float32)
            mods = ([jnp.asarray(r.normal(0., 1., (args.batch, h, w, c)),
                                 jnp.float32)
                     for c in (cfg.model.backbone.mod_in_channels or [])
                     ][:nmod] if nmod else None)
        d32 = jax.tree_util.tree_map(np.asarray, p32(variables, img, mods))
        d16 = jax.tree_util.tree_map(np.asarray, p16(variables, img, mods))

        for i in range(args.batch):
            v32 = d32.valid[i].astype(bool)
            v16 = d16.valid[i].astype(bool)
            cnt_deltas.append(int(v16.sum()) - int(v32.sum()))
            k = min(args.topk, int(v32.sum()), int(v16.sum()))
            if k == 0:
                continue
            b32 = d32.boxes[i][v32][:k].astype(np.float64)
            b16 = d16.boxes[i][v16][:k].astype(np.float64)
            s32 = d32.scores[i][v32][:k].astype(np.float64)
            s16 = d16.scores[i][v16][:k].astype(np.float64)
            l32 = d32.labels[i][v32][:k]
            l16 = d16.labels[i][v16][:k]
            # greedy identity match by IoU + same label
            iou = _iou_matrix(b32, b16)
            iou[l32[:, None] != l16[None, :]] = 0.
            matched = 0
            used = np.zeros(k, bool)
            for a in range(k):
                j = int(np.argmax(np.where(used, -1., iou[a])))
                if iou[a, j] >= 0.7 and not used[j]:
                    used[j] = True
                    matched += 1
                    box_deltas.append(np.abs(b32[a] - b16[j]).max())
                    score_deltas.append(abs(s32[a] - s16[j]))
            churns.append(1.0 - matched / k)

    bd = np.asarray(box_deltas)
    sd = np.asarray(score_deltas)
    print(f'config={args.config} batches={args.batches}x{args.batch} '
          f'hw={h}x{w} topk={args.topk}')
    print(f'matched detections: {len(bd)}')
    if len(bd):
        print(f'box corner delta px : max={bd.max():.4f} '
              f'p99={np.percentile(bd, 99):.4f} '
              f'median={np.median(bd):.4f}')
        print(f'score delta         : max={sd.max():.5f} '
              f'p99={np.percentile(sd, 99):.5f} '
              f'median={np.median(sd):.5f}')
    print(f'rank churn @top{args.topk}: '
          f'mean={np.mean(churns):.4f} max={np.max(churns):.4f}')
    print(f'valid-count delta   : mean={np.mean(cnt_deltas):+.2f} '
          f'max|.|={np.max(np.abs(cnt_deltas))}')


if __name__ == '__main__':
    main()
