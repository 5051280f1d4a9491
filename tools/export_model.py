#!/usr/bin/env python
"""Model export: serialize the jitted inference function (StableHLO).

TPU-native replacement for the reference deployment path
(`tools/deployment/pytorch2onnx.py` / `onnx2tensorrt.py`): instead of
ONNX/TensorRT, the end-to-end `predict` function (backbone + RPN decode +
NMS + cascade head) is exported with `jax.export` to a serialized
StableHLO artifact with the weights baked in. The artifact is
hardware-retargetable (it re-lowers through XLA on load) and
version-stable per StableHLO's compatibility guarantees.

Usage:
    python tools/export_model.py <config> --checkpoint ckpt.msgpack \
        --batch 1 --out model.stablehlo
    # smoke-verify the artifact round-trips and runs:
    python tools/export_model.py <config> --out model.stablehlo --verify
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--img-hw', type=int, nargs=2, default=None)
    ap.add_argument('--out', required=True)
    ap.add_argument('--verify', action='store_true',
                    help='deserialize + run the artifact on zeros')
    args = ap.parse_args()

    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN, predict

    cfg = get_config(args.config)
    if args.img_hw:
        h, w = args.img_hw
    else:
        w, h = cfg.data.img_scale
        h, w = (h + 31) // 32 * 32, (w + 31) // 32 * 32

    det = CascadeRCNN(cfg.model)
    nmod = cfg.model.backbone.num_fused_modalities
    img = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    mods = [jnp.zeros((args.batch, h, w, c), jnp.float32)
            for c in (cfg.model.backbone.mod_in_channels or [])][:nmod]

    variables = jax.jit(functools.partial(det.init, train=False))(
        jax.random.PRNGKey(0), img, mods if nmod else None)
    if args.checkpoint:
        from hrfuser_tpu.utils.checkpoint import load_weights
        variables = load_weights(args.checkpoint, variables)

    # bake weights in; inputs are (img, *mod_imgs)
    if nmod:
        def infer(image, *mod_imgs):
            return predict(det, variables, image, list(mod_imgs))
    else:
        def infer(image):
            return predict(det, variables, image)

    from jax import export as jexport
    from hrfuser_tpu.models import Detections
    jexport.register_namedtuple_serialization(
        Detections, serialized_name='hrfuser_tpu.Detections')
    in_specs = [jax.ShapeDtypeStruct(img.shape, img.dtype)]
    in_specs += [jax.ShapeDtypeStruct(m.shape, m.dtype) for m in mods]
    # NOTE: traced on the session's default backend — on TPU the
    # chain_kernel='auto' routing bakes the Pallas chain kernels into
    # the artifact (TPU-serving artifact); exporting under
    # JAX_PLATFORMS=cpu produces the portable pure-XLA flax path.
    exported = jexport.export(jax.jit(infer))(*in_specs)
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    print(f'[export] {args.out}: {len(blob) / 1e6:.1f} MB, '
          f'platforms={exported.platforms}')

    if args.verify:
        back = jexport.deserialize(blob)
        out = back.call(img, *mods)
        dets = jax.tree_util.tree_leaves(out)
        assert all(np.isfinite(np.asarray(x)).all() for x in dets)
        print(f'[export] verify ok: output pytree '
              f'{[tuple(np.asarray(x).shape) for x in dets]}')


if __name__ == '__main__':
    main()
