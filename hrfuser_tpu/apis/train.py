"""Training API: optimizer, LR schedule, train state and step function.

Rebuild of `train_detector` (`mmdet/apis/train.py:71-203`) mechanics for
TPU: AdamW with the reference's paramwise no-decay groups, step LR with
linear warmup, and a single jitted train step carrying
(params, batch_stats, opt_state). Distribution is data-parallel sharding
of the batch axis under `jit` over a `Mesh` (see `hrfuser_tpu.parallel`);
gradient reduction is XLA's — no DDP analogue exists or is needed.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hrfuser_tpu.configs.presets import OptimCfg, ScheduleCfg
from hrfuser_tpu.models.detectors.train_loss import forward_train

Array = jnp.ndarray


class TrainState(NamedTuple):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(optim: OptimCfg, sched: ScheduleCfg,
                     steps_per_epoch: int):
    """Step decay x0.1 at `lr_steps` epochs + linear warmup
    (`configs/_base_/schedules/schedule_1x.py`)."""
    boundaries = [s * steps_per_epoch for s in sched.lr_steps]

    def schedule(step):
        lr = optim.lr
        factor = jnp.ones((), jnp.float32)
        for b in boundaries:
            factor = jnp.where(step >= b, factor * 0.1, factor)
        # linear warmup: lr * (1 - (1 - ratio) * (1 - t/warmup))
        t = jnp.minimum(step.astype(jnp.float32), sched.warmup_iters)
        warm = 1.0 - (1.0 - sched.warmup_ratio) * \
            (1.0 - t / max(sched.warmup_iters, 1))
        return lr * factor * warm

    return schedule


def _decay_mask(params, no_decay_keys: Tuple[str, ...]):
    def mask_fn(path, _):
        names = [str(getattr(k, 'key', k)).lower() for k in path]
        return not any(nd in n for n in names for nd in no_decay_keys)
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(optim: OptimCfg, sched: ScheduleCfg,
                   steps_per_epoch: int, params) -> optax.GradientTransformation:
    schedule = make_lr_schedule(optim, sched, steps_per_epoch)
    tx = optax.adamw(schedule, b1=optim.betas[0], b2=optim.betas[1],
                     weight_decay=optim.weight_decay,
                     mask=_decay_mask(params, optim.no_decay_keys))
    # Skip updates with non-finite gradients (belt-and-suspenders; the
    # historical trigger — LayerNorm backward amplifying cotangents by
    # rsqrt(eps) on RandomDrop-zeroed modality streams — is root-fixed
    # by the zero-variance guard in `layers.common.LayerNorm`).
    return optax.apply_if_finite(tx, max_consecutive_errors=25)


def create_train_state(detector, variables, optim: OptimCfg,
                       sched: ScheduleCfg, steps_per_epoch: int
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx = make_optimizer(optim, sched, steps_per_epoch, params)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                      opt_state), tx


def make_train_step(detector, tx: optax.GradientTransformation,
                    rpn_proposal_cfg: Optional[dict] = None,
                    rcnn_train_cfgs: Optional[Tuple] = None):
    """Build the (jittable) train step: loss -> grads -> AdamW update.

    `rpn_proposal_cfg` / `rcnn_train_cfgs` override the reference train
    caps (2000 proposals, 512 sampled RoIs/stage) — used by tests and
    the multichip dry run to keep compile-time-bounded graphs.
    """

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            loss, metrics, updated = forward_train(
                detector, variables, batch, rng,
                rpn_proposal_cfg=rpn_proposal_cfg,
                rcnn_train_cfgs=rcnn_train_cfgs)
            return loss, (metrics, updated.get('batch_stats',
                                               state.batch_stats))

        grads, (metrics, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, new_params, new_stats,
                               new_opt)
        return new_state, metrics

    return train_step
