#!/usr/bin/env python
"""Convert a released HRFuser .pth checkpoint to this framework's format.

Usage:
    python tools/convert_pth.py ckpt.pth \
        cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion out_dir/
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('pth')
    ap.add_argument('config')
    ap.add_argument('out_dir')
    ap.add_argument('--input-hw', type=int, nargs=2, default=(384, 640))
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN
    from hrfuser_tpu.utils.pth_convert import convert_state_dict, verify_against

    ckpt = torch.load(args.pth, map_location='cpu')
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}

    cfg = get_config(args.config)
    converted = convert_state_dict(sd, cfg.model)

    # verify against an initialized tree
    det = CascadeRCNN(cfg.model)
    h, w = args.input_hw
    nmod = cfg.model.backbone.num_fused_modalities
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    mods = [jnp.zeros((1, h, w, c), jnp.float32)
            for c in cfg.model.backbone.mod_in_channels][:nmod] or None
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)
    problems = verify_against(variables, converted)
    for p in problems:
        print('[convert]', p)
    print(f'[convert] {len(problems)} problems; '
          f'{len(jax.tree_util.tree_leaves(converted["params"]))} params '
          f'converted')

    import os
    path = os.path.abspath(os.path.join(args.out_dir, 'converted'))
    # context-manage the checkpointer: its metadata commit is async and
    # gets severed at interpreter shutdown otherwise (incomplete ckpt)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {'params': converted['params'],
                          'batch_stats': converted['batch_stats']},
                   force=True)
        ckptr.wait_until_finished()
    print(f'[convert] saved -> {path}')


if __name__ == '__main__':
    main()
