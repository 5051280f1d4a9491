#!/usr/bin/env python
"""Probe the cascade's actual RoI span distribution (fallback pressure).

The r4 honest-input trace showed the RoIAlign oversize fallback
(`pallas_roi_align._pool_batched`'s while_loop + gather merges) costing
MORE than the kernel itself (~60-70 ms/step of a 210 ms step at b8)
once bench inputs stopped being all-zero: RPN proposals on random
images include extreme-aspect boxes whose feature-space span exceeds
the kernel window (SPAN=64). This probe measures, per cascade stage:

  * the span histogram (max of x/y feature-space extents at the routed
    level, the exact `span_of` quantity the fallback keys on)
  * how many RoIs per image exceed the in-kernel threshold (SPAN-9)
  * the worst aspect ratios and what SPAN would be needed to cover
    p99 / p99.9 / max in-kernel

Usage (TPU or CPU):
    python tools/probe_roi_spans.py [--batch 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config',
                    default='cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--hw', type=int, nargs=2, default=(384, 640))
    args = ap.parse_args()

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN
    from hrfuser_tpu.models.dense_heads.rpn_head import get_proposals_single
    from hrfuser_tpu.ops.boxes import delta2bbox
    from hrfuser_tpu.ops.roi_align import map_roi_levels

    h, w = args.hw
    cfg = get_config(args.config)
    det = CascadeRCNN(cfg.model, dtype=jnp.bfloat16)
    nmod = cfg.model.backbone.num_fused_modalities

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0., 1., (args.batch, h, w, 3)),
                      jnp.float32)
    mods = [jnp.asarray(rng.normal(0., 1., (args.batch, h, w, c)),
                        jnp.float32)
            for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]
    mods = mods if nmod else None

    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)

    mcfg = det.cfg

    def stage_rois_fn(self, feats_i, proposals, valid, img_shape):
        rcfg = self.roi_head.cfg
        rois = proposals
        out = [rois]
        for i in range(rcfg.num_stages - 1):
            logits, deltas = self.roi_head.forward_stage(i, feats_i, rois)
            rois = delta2bbox(rois, deltas, stds=rcfg.stage_stds[i],
                              max_shape=img_shape)
            out.append(rois)
        return out

    @jax.jit
    def run(variables, img, mods):
        feats, cls_scores, bbox_preds = det.apply(
            variables, img, mods, False, method='forward_features')
        gen = mcfg.anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        anchors = [jnp.asarray(a) for a in gen.grid_anchors(featmap_sizes)]

        def per_image(feats_i, scores_i, preds_i):
            props = get_proposals_single(
                scores_i, preds_i, anchors, (h, w),
                nms_pre=mcfg.rpn_test.nms_pre,
                max_per_img=mcfg.rpn_test.max_per_img,
                nms_iou=mcfg.rpn_test.nms_iou,
                min_bbox_size=mcfg.rpn_test.min_bbox_size)
            stage_rois = det.apply(
                variables, feats_i[:4],
                props.boxes, props.valid, (h, w), method=stage_rois_fn)
            return stage_rois, props.valid

        return jax.vmap(per_image)([f for f in feats], cls_scores,
                                   bbox_preds)

    stage_rois, valid = run(variables, img, mods)
    stage_rois = [np.asarray(r, np.float64) for r in stage_rois]
    valid = np.asarray(valid)

    strides = list(mcfg.roi.featmap_strides)
    finest = mcfg.roi.finest_scale
    from hrfuser_tpu.ops.pallas_roi_align import SPAN
    thresh = SPAN - 9

    for si, rois in enumerate(stage_rois):
        b, n, _ = rois.shape
        flat = rois.reshape(-1, 4)
        lvl = np.asarray(map_roi_levels(jnp.asarray(flat), len(strides),
                                        finest))
        scale = np.asarray([1.0 / strides[i] for i in lvl])
        sx = (flat[:, 2] - flat[:, 0]) * scale
        sy = (flat[:, 3] - flat[:, 1]) * scale
        span = np.maximum(sx, sy)
        vmask = valid.reshape(-1) if si == 0 else np.ones_like(
            span, bool)  # refined stages keep all slots
        span_v = span[vmask]
        over = (span > thresh).reshape(b, n)
        print(f'--- stage {si} ({b}x{n} RoIs, valid {vmask.sum()}) ---')
        print(f'  span px (feature units): p50={np.percentile(span_v, 50):.1f} '
              f'p90={np.percentile(span_v, 90):.1f} '
              f'p99={np.percentile(span_v, 99):.1f} '
              f'p99.9={np.percentile(span_v, 99.9):.1f} '
              f'max={span_v.max():.1f}')
        print(f'  oversize (> {thresh}): total={over.sum()} '
              f'({over.sum() / over.size * 100:.2f}%) '
              f'per-image max={over.sum(1).max()} '
              f'-> fallback iters (fb=16): {int(np.ceil(over.sum(1).max() / 16))}')
        # what the oversize set looks like
        if over.sum():
            osp_ = span[over.reshape(-1)]
            o_sx, o_sy = sx[over.reshape(-1)], sy[over.reshape(-1)]
            ar = np.maximum(o_sx / np.maximum(o_sy, 1e-3),
                            o_sy / np.maximum(o_sx, 1e-3))
            print(f'  oversize spans: p50={np.percentile(osp_, 50):.1f} '
                  f'p99={np.percentile(osp_, 99):.1f} max={osp_.max():.1f}; '
                  f'aspect p50={np.percentile(ar, 50):.1f} '
                  f'max={ar.max():.1f}')
            for cover in (96, 128, 192, 256):
                pct = (osp_ <= cover - 9).mean() * 100
                print(f'    SPAN={cover} would cover {pct:.1f}% of oversize')


if __name__ == '__main__':
    main()
