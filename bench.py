"""Benchmark: HRFuser-T nuScenes r640 3-modality inference fps/chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Baseline note: the reference repo publishes no throughput numbers
(BASELINE.md). `vs_baseline` is computed against a 10 fps/GPU proxy for
the PyTorch reference (HRFuser-T cascade inference at 640x384 on the
reference's CUDA-10.1-era hardware); BASELINE.json's north star is >10x
that proxy, i.e. vs_baseline >= 10.

Methodology: steady-state streaming throughput. All iterations are
enqueued back-to-back and the LAST iteration's output is hard-synced to
the host: the TPU executes XLA programs serially in submission order,
so completion of step N proves completion of steps 1..N-1 (verified
against XLA-module spans in profiler traces — N programs of ~equal
device duration back-to-back). Round 2 synced EVERY output, which
injected 30 extra sum-program dispatches + tunnel round-trips into the
timed window and under-reported throughput by ~18% (the round-2
"dispatch gap" — 46 vs 55 fps — was bench overhead, not device idle).
Per-step latency (sync each step before issuing the next) is reported
on stderr with --latency. `jax.block_until_ready` is never used for
timing: on this tunneled TPU platform it returns before execution
finishes (see `hard_sync`).
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS_PROXY = 10.0


def hard_sync(out):
    """Force REAL completion: materialize a value on the host.

    On the tunneled TPU platform `jax.block_until_ready` returns before
    the device has executed (verified against XLA-module spans in
    profiler traces: a 355 ms program "blocked" in 3 ms). Pulling a
    scalar to the host cannot complete early, so this is the honest
    synchronization for timing.
    """
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jnp.sum(leaves[1].astype(jnp.float32))))


def _trained_weights(cfg, det, variables, args, h, w, batch):
    """Overfit-trained weights for proposal-realistic benching.

    Runs `--overfit-steps` bf16 train steps on one fixed synthetic GT
    batch (the `tools/numerics_drift.py --overfit-steps` machinery) and
    caches the result under ~/.cache keyed by config + param structure,
    so repeat bench runs skip the train compile entirely.
    """
    import hashlib
    import os
    import pickle

    flat, treedef = jax.tree_util.tree_flatten(variables)
    sig = hashlib.sha1(
        (cfg.name + str(treedef)
         + str([tuple(x.shape) for x in flat])).encode()).hexdigest()[:16]
    cache = os.path.expanduser(
        f'~/.cache/hrfuser_bench_w_{sig}_{args.overfit_steps}.pkl')
    if os.path.exists(cache):
        with open(cache, 'rb') as f:
            leaves = pickle.load(f)
        print(f'[bench] trained weights from cache {cache}',
              file=sys.stderr)
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(a) for a in leaves])

    import os.path as _osp
    import sys as _s
    _s.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)),
                                'tools'))
    from train import synthetic_batches

    from hrfuser_tpu.apis.train import create_train_state, make_train_step
    det16 = type(det)(det.cfg, dtype=jnp.bfloat16)
    gt_batch = next(synthetic_batches(cfg, batch, hw=(h, w), pool=1))
    gt_batch = jax.tree_util.tree_map(jnp.asarray, gt_batch)
    state, tx = create_train_state(det16, variables, cfg.optim,
                                   cfg.schedule, steps_per_epoch=1000)
    step_fn = jax.jit(make_train_step(det16, tx), donate_argnums=0)
    rng_t = jax.random.PRNGKey(7)
    for i in range(args.overfit_steps):
        state, metrics = step_fn(state, gt_batch, rng_t)
        if (i + 1) % 50 == 0 or i == 0:
            print(f'[bench overfit {i + 1}/{args.overfit_steps}] '
                  f'loss={float(metrics["loss"]):.4f}', file=sys.stderr,
                  flush=True)
    out = {'params': state.params}
    if state.batch_stats:
        out['batch_stats'] = state.batch_stats
    flat2, treedef2 = jax.tree_util.tree_flatten(out)
    with open(cache, 'wb') as f:
        pickle.dump([__import__('numpy').asarray(a) for a in flat2], f)
    print(f'[bench] trained weights cached -> {cache}', file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true',
                    help='small spatial size + fewer iters (CPU smoke)')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--f32', action='store_true',
                    help='f32 params/compute (default bf16: measured '
                         'faster end-to-end with hard sync)')
    ap.add_argument('--latency', action='store_true',
                    help='also report per-step latency (sync every step)')
    ap.add_argument('--pool', choices=['onehot', 'gather', 'pallas'],
                    default=None,
                    help='override RoIAlign formulation (default: config)')
    ap.add_argument('--cf', choices=['auto', 'off', 'on'], default=None,
                    help='override backbone cf_layout (default: config)')
    ap.add_argument('--chain', choices=['auto', 'off', 'on'], default=None,
                    help='override backbone chain_kernel (default: config)')
    ap.add_argument('--weights', choices=['random', 'trained'],
                    default='random',
                    help="'trained' benches with weights overfit on a "
                         'synthetic GT batch (cached on disk), so the '
                         'RPN emits structured proposals instead of the '
                         'noise distribution whose full-extent slivers '
                         '(31.7%% of stage-0 proposals, perf/r4_02) '
                         'over-pay the extent-proportional RoIAlign '
                         '(VERDICT r4 #4)')
    ap.add_argument('--overfit-steps', type=int, default=200,
                    help='train steps for --weights trained (cache miss '
                         'only)')
    ap.add_argument('--roi-variant', choices=['v4', 'v7'], default=None,
                    help='override the Pallas RoIAlign kernel variant '
                         '(default: config)')
    ap.add_argument('--zeros', action='store_true',
                    help='all-zero inputs (pre-r4 methodology). Zero '
                         'images make every RPN proposal an identical '
                         'degenerate box, flattering the data-dependent '
                         'paths (RoI staging, NMS block early-exit); the '
                         'default is seeded random images (VERDICT r3 #4)')
    args = ap.parse_args()

    import dataclasses

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN, predict

    if args.quick:
        cfg = get_config('tiny_fusion_test')
        h, w, batch, iters = 64, 96, 2, 3
    else:
        cfg = get_config('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
        h, w, batch, iters = 384, 640, args.batch, args.iters

    model_cfg = cfg.model
    if args.pool:
        model_cfg = dataclasses.replace(
            model_cfg, roi=dataclasses.replace(model_cfg.roi,
                                               pool_method=args.pool,
                                               pool_method_eval=args.pool))
    if args.cf:
        model_cfg = dataclasses.replace(
            model_cfg, backbone=dataclasses.replace(model_cfg.backbone,
                                                    cf_layout=args.cf))
    if args.chain:
        model_cfg = dataclasses.replace(
            model_cfg, backbone=dataclasses.replace(
                model_cfg.backbone, chain_kernel=args.chain))
    if args.roi_variant:
        model_cfg = dataclasses.replace(
            model_cfg, roi=dataclasses.replace(
                model_cfg.roi, pallas_variant=args.roi_variant))
    dtype = None if (args.f32 or args.quick) else jnp.bfloat16
    det = CascadeRCNN(model_cfg, dtype=dtype)
    nmod = cfg.model.backbone.num_fused_modalities
    if args.zeros:
        img = jnp.zeros((batch, h, w, 3), jnp.float32)
        mods = [jnp.zeros((batch, h, w, c), jnp.float32)
                for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]
    else:
        # Seeded random inputs at ImageNet-normalized scale: makes RPN
        # scores spatially varied, so the NMS/RoI paths see a realistic
        # non-degenerate box distribution (VERDICT r3 weak #2: zeros
        # collapse all proposals onto one degenerate box and flatter
        # the data-dependent kernels by ~10%).
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(0., 1., (batch, h, w, 3)),
                          jnp.float32)
        mods = [jnp.asarray(rng.normal(0., 1., (batch, h, w, c)),
                            jnp.float32)
                for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]

    variables = jax.jit(functools.partial(
        det.init, train=args.weights == 'trained'))(
        jax.random.PRNGKey(0), img, mods if nmod else None)
    if args.weights == 'trained':
        variables = _trained_weights(cfg, det, variables, args, h, w, batch)

    pred = jax.jit(functools.partial(predict, det))
    out = pred(variables, img, mods if nmod else None)
    hard_sync(out)                                 # compile + real sync

    # streaming throughput: enqueue everything, then hard-sync the last
    # output — in-order execution makes it prove completion of all
    t0 = time.perf_counter()
    outs = [pred(variables, img, mods if nmod else None)
            for _ in range(iters)]
    hard_sync(outs[-1])
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    if args.latency:
        ts = []
        for _ in range(max(iters // 3, 3)):
            t1 = time.perf_counter()
            hard_sync(pred(variables, img, mods if nmod else None))
            ts.append(time.perf_counter() - t1)
        print(f'[latency] p50={np.median(ts) * 1e3:.1f}ms '
              f'-> {batch / np.median(ts):.1f} fps synced',
              file=sys.stderr)

    print(json.dumps({
        'metric': 'hrfuser_t_nus_r640_3mod_inference_fps_per_chip',
        'value': round(fps, 2),
        'unit': 'frames/sec/chip',
        'vs_baseline': round(fps / REFERENCE_FPS_PROXY, 2),
    }))


if __name__ == '__main__':
    main()
