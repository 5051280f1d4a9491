"""Sharded train/eval step builders (jit over a Mesh)."""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
from jax.sharding import Mesh

from hrfuser_tpu.apis.train import TrainState, make_train_step
from hrfuser_tpu.models.detectors.cascade_rcnn import predict
from hrfuser_tpu.parallel.mesh import batch_sharding, replicated


def make_sharded_train_step(detector, tx, mesh: Mesh, **step_kwargs):
    """Data-parallel train step: replicated state, batch-sharded inputs.

    The gradient allreduce (reference: DDP/NCCL) is inserted by XLA
    because gradients of replicated params over a sharded batch reduce
    across the mesh; BN batch statistics likewise become global (SyncBN).
    `step_kwargs` forward to `make_train_step` (train-cap overrides).
    """
    step = make_train_step(detector, tx, **step_kwargs)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    return jax.jit(
        step,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_sharded_predict(detector, mesh: Mesh):
    """Data-parallel batched inference; detections come back sharded on
    batch (gather with `parallel.mesh.gather`)."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def fn(variables, img, mod_imgs, img_shapes, scale_factors):
        return predict(detector, variables, img, mod_imgs, img_shapes,
                       scale_factors)

    return jax.jit(fn, in_shardings=(rep, bsh, bsh, bsh, bsh),
                   out_shardings=bsh)
