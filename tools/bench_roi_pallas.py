#!/usr/bin/env python
"""Micro-benchmark of the Pallas RoIAlign at the r640 eval shapes.

Usage: python tools/bench_roi_pallas.py [--chunk N] [--iters K]
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--chunk', type=int, default=0,
                    help='override pallas_roi_align.CHUNK')
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--rois', type=int, default=1000)
    args = ap.parse_args()

    from hrfuser_tpu.ops import pallas_roi_align as pra
    if args.chunk:
        pra.CHUNK = args.chunk

    sizes = [(96, 160), (48, 80), (24, 40), (12, 20)]
    c = 256
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, (args.batch, h, w, c)),
                         jnp.bfloat16).astype(jnp.float32)
             for h, w in sizes]
    # realistic box mix across levels
    n = args.rois
    wh = rng.uniform(8, 500, (args.batch, n, 2))
    xy = rng.uniform(0, 1, (args.batch, n, 2)) * \
        (np.asarray([640., 384.]) - wh)
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    fn = jax.jit(jax.vmap(lambda f, r: pra.multilevel_roi_align_pallas(
        f, r, strides=(4, 8, 16, 32))))

    def sync(o):
        return float(np.asarray(jnp.sum(o.astype(jnp.float32))))

    out = fn(feats, rois)
    sync(out)
    t0 = time.perf_counter()
    outs = [fn(feats, rois) for _ in range(args.iters)]
    for o in outs:
        sync(o)
    dt = (time.perf_counter() - t0) / args.iters
    print(f'CHUNK={pra.CHUNK}: {dt * 1e3:.2f} ms per '
          f'[{args.batch}x{n}] pool')


if __name__ == '__main__':
    main()
