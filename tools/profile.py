#!/usr/bin/env python
"""Profiling harness: jax.profiler trace + simple timing breakdown.

TPU-native replacement for the reference's ad-hoc CUDA-event timers
(`mmdet/utils/profiling.py:11-40`) and IterTimerHook logs: captures a
Perfetto/XPlane trace of N inference (or train) steps into
`--trace-dir`, viewable at ui.perfetto.dev or TensorBoard's profile
plugin, and prints wall-time percentiles.

Usage:
    python tools/profile.py cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
        --mode infer --batch 8 --iters 20 --trace-dir /tmp/hrfuser_trace
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--mode', choices=['infer', 'train'], default='infer')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--img-hw', type=int, nargs=2, default=None)
    ap.add_argument('--trace-dir', default='')
    ap.add_argument('--remat', action='store_true',
                    help='rematerialize backbone modules in backward '
                         '(fits larger train batches)')
    ap.add_argument('--pool', choices=['onehot', 'gather'], default=None)
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 params/compute (the bench configuration)')
    ap.add_argument('--roi-variant', choices=['v4', 'v7'], default=None)
    ap.add_argument('--chain', choices=['auto', 'off', 'on'], default=None,
                    help='override backbone chain_kernel')
    ap.add_argument('--zeros', action='store_true',
                    help='all-zero inference inputs (pre-r4 methodology; '
                         'flatters data-dependent paths — see bench.py)')
    args = ap.parse_args()

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN, predict

    cfg = get_config(args.config)
    if args.img_hw:
        h, w = args.img_hw
    else:
        w, h = cfg.data.img_scale
        h, w = (h + 31) // 32 * 32, (w + 31) // 32 * 32

    import dataclasses
    model_cfg = cfg.model
    if args.remat:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(model_cfg.backbone, remat=True))
    if args.pool:
        model_cfg = dataclasses.replace(
            model_cfg, roi=dataclasses.replace(model_cfg.roi,
                                               pool_method=args.pool))
    if args.roi_variant:
        model_cfg = dataclasses.replace(
            model_cfg, roi=dataclasses.replace(
                model_cfg.roi, pallas_variant=args.roi_variant))
    if args.chain:
        model_cfg = dataclasses.replace(
            model_cfg, backbone=dataclasses.replace(
                model_cfg.backbone, chain_kernel=args.chain))
    cfg = dataclasses.replace(cfg, model=model_cfg)

    det = CascadeRCNN(cfg.model,
                      dtype=jnp.bfloat16 if args.bf16 else None)
    nmod = cfg.model.backbone.num_fused_modalities
    if args.zeros:
        img = jnp.zeros((args.batch, h, w, 3), jnp.float32)
        mods = [jnp.zeros((args.batch, h, w, c), jnp.float32)
                for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]
    else:
        # seeded random inputs, same as bench.py's honest default:
        # non-degenerate RPN proposals exercise the data-dependent
        # RoI/NMS paths the way real data does
        npr0 = np.random.default_rng(0)
        img = jnp.asarray(npr0.normal(0., 1., (args.batch, h, w, 3)),
                          jnp.float32)
        mods = [jnp.asarray(npr0.normal(0., 1., (args.batch, h, w, c)),
                            jnp.float32)
                for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]
    mods = mods if nmod else None

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(functools.partial(det.init, train=False))(
        rng, img, mods)

    if args.mode == 'infer':
        step = jax.jit(functools.partial(predict, det))

        def run():
            return step(variables, img, mods)
    else:
        from hrfuser_tpu.apis.train import (create_train_state,
                                            make_train_step)
        state, tx = create_train_state(det, variables, cfg.optim,
                                       cfg.schedule, steps_per_epoch=100)
        train_step = jax.jit(make_train_step(det, tx), donate_argnums=0)
        npr = np.random.default_rng(0)
        batch = dict(
            img=jnp.asarray(npr.normal(0, 1, (args.batch, h, w, 3)),
                            jnp.float32),
            gt_boxes=jnp.tile(jnp.asarray(
                [[[10., 10., 100., 80.], [50., 30., 200., 160.]]],
                jnp.float32), (args.batch, 1, 1)),
            gt_labels=jnp.tile(jnp.asarray([[0, 1]], jnp.int32),
                               (args.batch, 1)),
            gt_valid=jnp.ones((args.batch, 2), bool),
        )
        if mods is not None:
            batch['mod_imgs'] = [
                jnp.asarray(npr.normal(0, 1, (args.batch, h, w, c)),
                            jnp.float32)
                for c in cfg.model.backbone.mod_in_channels]

        def run():
            nonlocal state
            state, metrics = train_step(state, batch, rng)
            return metrics

    def hard_sync(out):
        """Force REAL completion by materializing a scalar on the host.

        `jax.block_until_ready` on the tunneled TPU platform returns
        before execution finishes (a 355 ms XLA module "blocked" in
        3 ms; verified against module spans in the profiler trace), so
        every timing here syncs through a host transfer instead.
        """
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))

    hard_sync(run())                             # compile + real sync
    times = []
    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = run()
        hard_sync(out)
        times.append(time.perf_counter() - t0)
    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f'[profile] trace written to {args.trace_dir}')

    ms = np.asarray(times) * 1e3
    print(f'[profile] {args.mode} batch={args.batch} hw={h}x{w} '
          f'iters={args.iters}')
    print(f'[profile] per-step (hard sync): p50={np.percentile(ms, 50):.2f}ms '
          f'p90={np.percentile(ms, 90):.2f}ms mean={ms.mean():.2f}ms '
          f'-> {args.batch / (ms.mean() / 1e3):.1f} img/s')

    # queued throughput: dispatch every step back-to-back, sync once at
    # the end (the device executes submissions in order, so the last
    # output's readiness implies all finished)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    hard_sync(out)
    dt = time.perf_counter() - t0
    print(f'[profile] queued: {dt / args.iters * 1e3:.2f}ms/step '
          f'-> {args.batch * args.iters / dt:.1f} img/s')


if __name__ == '__main__':
    main()
