"""Checkpoint save/load (orbax) + metadata.

Rebuild of the mmcv CheckpointHook/resume semantics (SURVEY §5.4): every
checkpoint carries params, batch_stats, optimizer state and step, plus
meta (config name, classes). `load_weights` restores weights only
(`load_from`); `load_state` restores the full training state
(`resume_from`).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state, meta: Optional[Dict] = None):
    path = osp.join(osp.abspath(ckpt_dir), f'step_{step}')
    ckptr = ocp.StandardCheckpointer()
    payload = {'params': state.params, 'batch_stats': state.batch_stats,
               'opt_state': state.opt_state,
               'step': np.asarray(state.step)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if meta:
        with open(osp.join(ckpt_dir, f'step_{step}.meta.json'), 'w') as f:
            json.dump(meta, f)
    latest = osp.join(ckpt_dir, 'latest')
    with open(latest, 'w') as f:
        f.write(f'step_{step}')
    return path


def _resolve(ckpt_path: str) -> str:
    if osp.isfile(osp.join(ckpt_path, 'latest')):
        with open(osp.join(ckpt_path, 'latest')) as f:
            return osp.join(ckpt_path, f.read().strip())
    return ckpt_path


def load_state(ckpt_path: str, target_state) -> Any:
    """Full resume: returns a TrainState-like pytree matching target."""
    path = osp.abspath(_resolve(ckpt_path))
    ckptr = ocp.StandardCheckpointer()
    target = {'params': target_state.params,
              'batch_stats': target_state.batch_stats,
              'opt_state': target_state.opt_state,
              'step': np.asarray(target_state.step)}
    restored = ckptr.restore(path, target)
    return type(target_state)(
        step=jax.numpy.asarray(restored['step']),
        params=restored['params'],
        batch_stats=restored['batch_stats'],
        opt_state=restored['opt_state'])


def load_weights(ckpt_path: str, variables: Dict) -> Dict:
    """Weights-only warm start (params + batch_stats).

    Works on both full training checkpoints (which also carry opt_state +
    step) and published weights-only checkpoints: the checkpoint is
    restored without a target and only the weight collections are taken.
    """
    path = osp.abspath(_resolve(ckpt_path))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    out = {'params': restored['params'],
           'batch_stats': restored.get('batch_stats', {})}

    want_tree = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    want = jax.tree_util.tree_structure(want_tree)
    if jax.tree_util.tree_structure(out) != want:
        # `.pth`-converted checkpoints legitimately carry EXTRA leaves
        # (the converter dual-emits transition weights because it cannot
        # know which forward variant a config uses — see
        # `pth_convert.convert_state_dict`). Drop extras; still refuse
        # checkpoints MISSING leaves the model needs.
        flat_got = dict(jax.tree_util.tree_flatten_with_path(out)[0])
        flat_want = jax.tree_util.tree_flatten_with_path(want_tree)[0]
        missing = [k for k, _ in flat_want if k not in flat_got]
        if missing:
            raise ValueError(
                f'checkpoint at {path} is missing {len(missing)} leaves '
                f'the model needs, e.g. {missing[:3]}')
        pruned = [flat_got[k] for k, _ in flat_want]
        out = jax.tree_util.tree_unflatten(want, pruned)
    return out
