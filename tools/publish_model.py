#!/usr/bin/env python
"""Strip a training checkpoint to release weights.

Rebuild of `tools/model_converters/publish_model.py`: drops the optimizer
state and step, keeps params + batch_stats, appends a content hash to the
output name.

Usage:
    python tools/publish_model.py work_dirs/<cfg>/step_1234 out/<name>
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import hashlib
import os.path as osp

import jax
import numpy as np
import orbax.checkpoint as ocp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('in_ckpt')
    ap.add_argument('out_prefix')
    args = ap.parse_args()

    ckptr = ocp.StandardCheckpointer()
    with ocp.PyTreeCheckpointer() as loader:
        payload = loader.restore(osp.abspath(args.in_ckpt))
    weights = {'params': payload['params'],
               'batch_stats': payload.get('batch_stats', {})}

    hasher = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(weights):
        hasher.update(np.asarray(leaf).tobytes())
    digest = hasher.hexdigest()[:8]

    out = osp.abspath(f'{args.out_prefix}-{digest}')
    ckptr.save(out, weights, force=True)
    ckptr.wait_until_finished()
    print(f'[publish] {out}')


if __name__ == '__main__':
    main()
