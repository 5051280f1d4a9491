#!/usr/bin/env python
"""Per-op TPU microbenchmarks for the HRFuser hot path.

Times each hot component in isolation (honest host-transfer sync — see
`bench.hard_sync`), so kernel work can be iterated without recompiling
the whole detector:

    python tools/bench_ops.py roi            # RoIAlign formulations
    python tools/bench_ops.py nms            # RPN-shaped batched NMS
    python tools/bench_ops.py backbone       # HRFuser-T backbone fwd
    python tools/bench_ops.py rpn            # proposal decode + NMS
    python tools/bench_ops.py head           # cascade RoI head

Shapes default to the flagship r640 nuScenes config (batch 8).
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def hard_sync(out):
    """Materialize a scalar on the host (block_until_ready is unreliable
    on the tunneled TPU platform — see bench.py)."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timeit(fn, *args, iters=20, warmup=2, label=''):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{label:42s} {dt * 1e3:9.3f} ms')
    return dt


def fpn_feats(batch, h=384, w=640, c=256, dtype=jnp.float32, levels=4):
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.normal(0, 1, (batch, h // s, w // s, c)),
                        dtype) for s in (4, 8, 16, 32, 64)[:levels]]


def rand_rois(batch, n, h=384, w=640):
    rng = np.random.default_rng(1)
    x1 = rng.uniform(0, w * 0.8, (batch, n))
    y1 = rng.uniform(0, h * 0.8, (batch, n))
    bw = rng.uniform(8, w * 0.5, (batch, n))
    bh = rng.uniform(8, h * 0.5, (batch, n))
    rois = np.stack([x1, y1, np.minimum(x1 + bw, w),
                     np.minimum(y1 + bh, h)], -1)
    return jnp.asarray(rois, jnp.float32)


def bench_roi(args):
    from hrfuser_tpu.ops.roi_align import (multilevel_roi_align,
                                           multilevel_roi_align_onehot)
    from hrfuser_tpu.ops.pallas_roi_align import multilevel_roi_align_pallas

    b, n = args.batch, args.rois
    feats = fpn_feats(b)
    rois = rand_rois(b, n)

    # vmapped single-image calls, like the cascade head does
    def gather(feats, rois):
        return jax.vmap(lambda f0, f1, f2, f3, r: multilevel_roi_align(
            [f0, f1, f2, f3], r, [4, 8, 16, 32],
            gather_dtype=jnp.bfloat16))(*feats, rois)

    def onehot(feats, rois):
        return jax.vmap(lambda f0, f1, f2, f3, r: multilevel_roi_align_onehot(
            [f0, f1, f2, f3], r, [4, 8, 16, 32]))(*feats, rois)

    def pallas(feats, rois):
        return jax.vmap(lambda f0, f1, f2, f3, r: multilevel_roi_align_pallas(
            [f0, f1, f2, f3], r, (4, 8, 16, 32)))(*feats, rois)

    print(f'RoIAlign: batch={b} rois={n} (per call = {3} stages worth /3)')
    timeit(jax.jit(gather), feats, rois, label='gather bf16')
    if args.all:
        timeit(jax.jit(onehot), feats, rois, label='onehot bf16')
    timeit(jax.jit(pallas), feats, rois, label='pallas')


def bench_nms(args):
    from hrfuser_tpu.ops.nms import batched_nms

    b = args.batch
    n = 5 * 1000                      # 5 levels x nms_pre
    rng = np.random.default_rng(0)
    rois = rand_rois(b, n)
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 5, (b, n)), jnp.int32)

    def run(rois, scores, ids):
        return jax.vmap(lambda r, s, i: batched_nms(r, s, i, 0.7, 1000))(
            rois, scores, ids)

    print(f'batched NMS: batch={b} cands={n} -> 1000')
    timeit(jax.jit(run), rois, scores, ids, label='batched_nms rpn-shape')


def bench_backbone(args):
    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN

    cfg = get_config('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    import dataclasses
    model_cfg = cfg.model
    dtype = jnp.bfloat16 if args.bf16 else None
    det = CascadeRCNN(model_cfg, dtype=dtype)
    b, h, w = args.batch, 384, 640
    img = jnp.zeros((b, h, w, 3), jnp.float32)
    mods = [jnp.zeros((b, h, w, c), jnp.float32)
            for c in model_cfg.backbone.mod_in_channels]
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)

    feat_fn = jax.jit(lambda v, i, m: det.apply(v, i, m, False,
                                                method='extract_feat'))
    print(f'backbone+neck fwd: batch={b} r640 '
          f'{"bf16" if args.bf16 else "f32"}')
    timeit(feat_fn, variables, img, mods, label='extract_feat')

    full_fn = jax.jit(lambda v, i, m: det.apply(
        v, i, m, False, method='forward_features'))
    timeit(full_fn, variables, img, mods, label='forward_features (+RPN conv)')


def bench_rpn(args):
    from hrfuser_tpu.models.dense_heads.rpn_head import get_proposals_single
    from hrfuser_tpu.ops.anchors import AnchorGenerator

    b, h, w = args.batch, 384, 640
    gen = AnchorGenerator(strides=[4, 8, 16, 32, 64], ratios=[0.5, 1.0, 2.0],
                          scales=[8])
    sizes = [(h // s, w // s) for s in (4, 8, 16, 32, 64)]
    anchors = [jnp.asarray(a) for a in gen.grid_anchors(sizes)]
    rng = np.random.default_rng(0)
    scores = [jnp.asarray(rng.normal(0, 1, (b, hh, ww, 3)), jnp.float32)
              for hh, ww in sizes]
    deltas = [jnp.asarray(rng.normal(0, 0.1, (b, hh, ww, 12)), jnp.float32)
              for hh, ww in sizes]

    def run(scores, deltas):
        def one(ss, dd):
            return get_proposals_single(ss, dd, anchors,
                                        (jnp.float32(h), jnp.float32(w)))
        return jax.vmap(one)(scores, deltas)

    print(f'RPN decode+NMS: batch={b}')
    timeit(jax.jit(run), scores, deltas, label='get_proposals (5 lvl + nms)')


def bench_head(args):
    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN

    cfg = get_config('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    det = CascadeRCNN(cfg.model)
    b, n = args.batch, 1000
    feats = fpn_feats(b)
    rois = rand_rois(b, n)
    valid = jnp.ones((b, n), bool)

    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    mods = [jnp.zeros((1, 64, 96, c), jnp.float32)
            for c in cfg.model.backbone.mod_in_channels]
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)

    def run(feats, rois, valid):
        def one(f0, f1, f2, f3, r, v):
            return det.apply(variables, [f0, f1, f2, f3], r, v,
                             (jnp.float32(384), jnp.float32(640)),
                             jnp.ones((4,), jnp.float32), True,
                             method='roi_test')
        return jax.vmap(one)(*feats[:4], rois, valid)

    print(f'cascade RoI head (3 stages + final NMS): batch={b} rois={n} '
          f'pool_eval={cfg.model.roi.pool_method_eval}')
    timeit(jax.jit(run), feats, rois, valid, label='roi_test')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('which', choices=['roi', 'nms', 'backbone', 'rpn',
                                      'head', 'all'])
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--rois', type=int, default=1000)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--all', action='store_true',
                    help='include slow variants')
    args = ap.parse_args()
    fns = dict(roi=bench_roi, nms=bench_nms, backbone=bench_backbone,
               rpn=bench_rpn, head=bench_head)
    if args.which == 'all':
        for f in fns.values():
            f(args)
    else:
        fns[args.which](args)


if __name__ == '__main__':
    main()
