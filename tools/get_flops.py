#!/usr/bin/env python
"""FLOPs / memory-traffic accounting for a config.

TPU-native replacement for the reference's FLOPs path — the
`forward_dummy` hook (`mmdet/models/detectors/two_stage.py:86-105`)
exists exactly so an op-counting wrapper can measure the forward cost.
Here XLA already knows: `jit(predict).lower().compile().cost_analysis()`
returns the compiler's own FLOP/byte counts for the real compiled
program (fusions included), which is the honest denominator for
per-chip utilization numbers.

Usage:
    python tools/get_flops.py cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion \
        [--batch 1] [--img-hw 384 640] [--train] [--bf16]
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--img-hw', type=int, nargs=2, default=None)
    ap.add_argument('--train', action='store_true',
                    help='cost of the full train step (fwd+bwd+update) '
                         'instead of inference')
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--json', action='store_true', help='machine output')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN, predict

    cfg = get_config(args.config)
    if args.img_hw:
        h, w = args.img_hw
    else:
        w, h = cfg.data.img_scale
        h, w = (h + 31) // 32 * 32, (w + 31) // 32 * 32

    det = CascadeRCNN(cfg.model,
                      dtype=jnp.bfloat16 if args.bf16 else None)
    nmod = cfg.model.backbone.num_fused_modalities
    b = args.batch
    img = jnp.zeros((b, h, w, 3), jnp.float32)
    mods = [jnp.zeros((b, h, w, c), jnp.float32)
            for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]
    mods = mods if nmod else None

    variables = jax.eval_shape(
        functools.partial(det.init, train=False),
        jax.random.PRNGKey(0), img, mods)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    if args.train:
        from hrfuser_tpu.apis.train import create_train_state, make_train_step
        state, tx = create_train_state(det, variables, cfg.optim,
                                       cfg.schedule, steps_per_epoch=100)
        step = make_train_step(det, tx)
        npr = np.random.default_rng(0)
        batch = dict(
            img=img,
            gt_boxes=jnp.tile(jnp.asarray([[[10., 10., 100., 80.]]],
                                          jnp.float32), (b, 1, 1)),
            gt_labels=jnp.zeros((b, 1), jnp.int32),
            gt_valid=jnp.ones((b, 1), bool))
        if mods is not None:
            batch['mod_imgs'] = mods
        lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(0))
    else:
        lowered = jax.jit(functools.partial(predict, det)).lower(
            variables, img, mods)

    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):           # one entry per device program
        cost = cost[0]
    flops = float(cost.get('flops', 0.0))
    bytes_moved = float(cost.get('bytes accessed', 0.0))
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(variables['params']))

    out = {
        'config': args.config,
        'mode': 'train_step' if args.train else 'inference',
        'input': f'{b}x{h}x{w}x3 (+{nmod} modalities)',
        'params': n_params,
        'gflops_total': flops / 1e9,
        'gflops_per_image': flops / 1e9 / b,
        'gbytes_accessed': bytes_moved / 1e9,
        'arithmetic_intensity_flop_per_byte':
            flops / bytes_moved if bytes_moved else None,
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(f"config:    {out['config']}")
        print(f"mode:      {out['mode']}   input: {out['input']}")
        print(f"params:    {n_params / 1e6:.2f} M")
        print(f"FLOPs:     {out['gflops_per_image']:.2f} GFLOPs/image "
              f"({out['gflops_total']:.2f} total)")
        ai = out['arithmetic_intensity_flop_per_byte']
        gb = out['gbytes_accessed']
        if gb is not None and ai is not None:
            print(f"HBM bytes: {gb:.2f} GB (AI = {ai:.1f} FLOP/B)")
        else:
            print("HBM bytes: (not reported by this backend)")


if __name__ == '__main__':
    main()
