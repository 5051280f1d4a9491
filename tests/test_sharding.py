"""Data-parallel sharding tests on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrfuser_tpu.apis.train import create_train_state
from hrfuser_tpu.configs import get_config
from hrfuser_tpu.models import CascadeRCNN
from hrfuser_tpu.parallel.api import (make_sharded_predict,
                                      make_sharded_train_step)
from hrfuser_tpu.parallel.mesh import (gather, make_mesh, replicate,
                                       shard_batch)

pytestmark = [
    pytest.mark.slow,  # compile-heavy: ~17 min of 8-device CPU compiles
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason='needs 8 (virtual) devices'),
]


@pytest.fixture(scope='module')
def setup():
    cfg = get_config('tiny_fusion_test')
    det = CascadeRCNN(cfg.model)
    img = jnp.zeros((8, 64, 96, 3))
    mods = [jnp.zeros((8, 64, 96, 3))] * 2
    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods)
    return cfg, det, variables


def test_sharded_predict_matches_single_device(setup):
    import dataclasses

    cfg, _, variables = setup
    # exact-f32 RoI gathers: this test isolates sharding effects, and the
    # bf16 gather path rounds differently between per-device and full-
    # batch fusion layouts
    model_cfg = dataclasses.replace(
        cfg.model, roi=dataclasses.replace(cfg.model.roi,
                                           gather_bf16=False))
    det = CascadeRCNN(model_cfg)
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (8, 64, 96, 3)), jnp.float32)
    mods = [jnp.asarray(rng.normal(0, 1, (8, 64, 96, 3)), jnp.float32)
            for _ in range(2)]
    shapes = jnp.tile(jnp.asarray([[64., 96.]]), (8, 1))
    sfs = jnp.ones((8, 4))

    sharded = make_sharded_predict(det, mesh)
    out_sharded = sharded(replicate(mesh, variables),
                          *shard_batch(mesh, (img, mods, shapes, sfs)))

    from hrfuser_tpu.models.detectors.cascade_rcnn import predict
    out_single = jax.jit(functools.partial(predict, det))(
        variables, img, mods, shapes, sfs)

    g_sh = gather(out_sharded)
    g_si = gather(out_single)
    np.testing.assert_allclose(g_sh.scores, g_si.scores, atol=2e-3)
    assert (g_sh.valid == g_si.valid).mean() > 0.97   # NMS edge tolerance


def test_run_inference_uses_mesh_and_pads_ragged_batch(setup):
    """The eval API (used by tools/test.py) must shard over all visible
    devices automatically and pad ragged final batches to the mesh size
    (reference `multi_gpu_test`, `mmdet/apis/test.py:187-308`)."""
    cfg, det, variables = setup
    from hrfuser_tpu.apis.test import run_inference

    rng = np.random.default_rng(2)

    def make_batch(n, num_real):
        return dict(
            img=rng.normal(0, 1, (n, 64, 96, 3)).astype(np.float32),
            mod_imgs=[rng.normal(0, 1, (n, 64, 96, 3)).astype(np.float32)
                      for _ in range(2)],
            img_shapes=np.tile(np.asarray([[64., 96.]], np.float32),
                               (n, 1)),
            scale_factors=np.ones((n, 4), np.float32),
            num_real=num_real,
            metas=[{'filename': f'img{i}.jpg'} for i in range(n)],
        )

    # full batch of 8 + ragged final batch of 3 (padded to 8 internally)
    loader = [make_batch(8, 8), make_batch(3, 3)]
    results = run_inference(det, variables, loader, progress=False)
    assert len(results) == 11
    for r in results:
        assert r['boxes'].shape[1:] == (4,)
        assert np.isfinite(r['scores']).all()


def test_sharded_train_step_runs_and_syncs(setup):
    cfg, det, variables = setup
    mesh = make_mesh(8)
    state, tx = create_train_state(det, variables, cfg.optim, cfg.schedule,
                                   100)
    step = make_sharded_train_step(det, tx, mesh)
    rng = np.random.default_rng(1)
    batch = dict(
        img=jnp.asarray(rng.normal(0, 1, (8, 64, 96, 3)), jnp.float32),
        mod_imgs=[jnp.asarray(rng.normal(0, 1, (8, 64, 96, 3)), jnp.float32)
                  for _ in range(2)],
        gt_boxes=jnp.tile(jnp.asarray([[[10., 10., 50., 40.]]]), (8, 1, 1)),
        gt_labels=jnp.zeros((8, 1), jnp.int32),
        gt_valid=jnp.ones((8, 1), bool),
    )
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    new_state, metrics = step(state, batch,
                              replicate(mesh, jax.random.PRNGKey(0)))
    loss = float(metrics['loss'])
    assert np.isfinite(loss)
    # params stay replicated (same value on all shards by construction)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated
