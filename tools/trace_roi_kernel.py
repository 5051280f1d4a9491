#!/usr/bin/env python
"""Trace the standalone Pallas RoIAlign kernel (device spans, not wall).

Wall-clock on the tunneled TPU is dispatch-floor bound (~40 ms/call),
so kernel A/B comparisons must read the custom-call spans from a
profiler trace instead:

    HRFUSER_ROI_CHUNK=4 python tools/trace_roi_kernel.py /tmp/tr_c4
    python tools/trace_ops.py /tmp/tr_c4 --top 5
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    trace_dir = sys.argv[1]
    from hrfuser_tpu.ops import pallas_roi_align as pra
    sizes = [(96, 160), (48, 80), (24, 40), (12, 20)]
    c = 256
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 1, (8, h, w, c)), jnp.float32)
             for h, w in sizes]
    wh = rng.uniform(8, 500, (8, 1000, 2))
    xy = rng.uniform(0, 1, (8, 1000, 2)) * (np.asarray([640., 384.]) - wh)
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)

    fn = jax.jit(jax.vmap(lambda f, r: pra.multilevel_roi_align_pallas(
        f, r, strides=(4, 8, 16, 32))))

    def sync(o):
        return float(np.asarray(jnp.sum(o.astype(jnp.float32))))

    sync(fn(feats, rois))
    jax.profiler.start_trace(trace_dir)
    outs = [fn(feats, rois) for _ in range(10)]
    for o in outs:
        sync(o)
    jax.profiler.stop_trace()
    print(f'CHUNK={pra.CHUNK}: trace in {trace_dir}')


if __name__ == '__main__':
    main()
