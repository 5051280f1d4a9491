"""Single-image inference API.

Rebuild of `init_detector` / `inference_detector`
(`mmdet/apis/inference.py:17-153`) — and unlike the reference demo path
(camera-only, `:89-153`), this one accepts the sensor modalities too.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Detector:
    """A ready-to-run detector (module + weights + jitted predict)."""

    def __init__(self, cfg, module, variables):
        self.cfg = cfg
        self.module = module
        self.variables = variables
        from hrfuser_tpu.models.detectors.cascade_rcnn import predict
        self._predict = jax.jit(functools.partial(predict, module))

    def __call__(self, img: np.ndarray,
                 mod_imgs: Optional[Sequence[np.ndarray]] = None,
                 img_shape=None, scale_factor=None) -> Dict[str, np.ndarray]:
        """img: [H, W, 3] preprocessed (normalized, padded /32) image."""
        b_img = jnp.asarray(img)[None]
        b_mods = ([jnp.asarray(m)[None] for m in mod_imgs]
                  if mod_imgs is not None else None)
        shapes = (jnp.asarray([img_shape], jnp.float32)
                  if img_shape is not None else None)
        sfs = (jnp.asarray([scale_factor], jnp.float32)
               if scale_factor is not None else None)
        out = self._predict(self.variables, b_img, b_mods, shapes, sfs)
        v = np.asarray(out.valid[0])
        return dict(boxes=np.asarray(out.boxes[0])[v],
                    scores=np.asarray(out.scores[0])[v],
                    labels=np.asarray(out.labels[0])[v])


def init_detector(config: str, checkpoint: Optional[str] = None,
                  input_hw: Tuple[int, int] = (384, 640),
                  seed: int = 0) -> Detector:
    """Build a detector from a config name (+ optional checkpoint)."""
    from hrfuser_tpu.configs import get_config
    from hrfuser_tpu.models import CascadeRCNN

    cfg = get_config(config)
    module = CascadeRCNN(cfg.model)
    h, w = input_hw
    nmod = cfg.model.backbone.num_fused_modalities
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    mods = [jnp.zeros((1, h, w, c), jnp.float32)
            for c in cfg.model.backbone.mod_in_channels][:nmod] or None
    variables = jax.jit(functools.partial(module.init, train=False))(
        jax.random.PRNGKey(seed), img, mods)
    if checkpoint:
        from hrfuser_tpu.utils.checkpoint import load_weights
        variables = load_weights(checkpoint, variables)
    return Detector(cfg, module, variables)


def inference_detector(detector: Detector, img: np.ndarray,
                       mod_imgs: Optional[Sequence[np.ndarray]] = None
                       ) -> Dict[str, np.ndarray]:
    """Run the preprocessing pipeline + model on a raw BGR uint8 image."""
    from hrfuser_tpu.data import norms
    from hrfuser_tpu.data.pipelines.transforms import (Normalize, Pad,
                                                       Resize)

    is_stf = detector.cfg.data.dataset == 'stf'
    norm = norms.STF if is_stf else norms.NUS
    results = dict(img=img.astype(np.float32), img_shape=img.shape,
                   ori_shape=img.shape, img_fields=['img'])
    mods_names = list(detector.cfg.data.modalities)
    for name, m in zip(mods_names, mod_imgs or []):
        results[f'{name}_img'] = m.astype(np.float32)
        results['img_fields'].append(f'{name}_img')
        results = Normalize(**norm[name], keys=[f'{name}_img'],
                            sensor_type=name)(results)
    results = Resize(detector.cfg.data.img_scale, keep_ratio=True,
                     skip_keys=[f'{n}_img' for n in mods_names])(results)
    # offline sensor projections are rendered at the model grid, so the
    # dataset pipeline never resizes them (`skip_keys`); for this
    # convenience API, bring mismatched streams onto the camera's grid
    # with nearest-neighbour (preserves sparse-splat semantics)
    cam_hw = results['img'].shape[:2]
    for n in mods_names:
        key = f'{n}_img'
        if key in results and results[key].shape[:2] != cam_hw:
            import cv2
            m = cv2.resize(results[key], (cam_hw[1], cam_hw[0]),
                           interpolation=cv2.INTER_NEAREST)
            results[key] = m[..., None] if m.ndim == 2 else m
    results = Normalize(**norm['img'], keys=['img'])(results)
    results = Pad(detector.cfg.data.pad_divisor)(results)
    if mods_names and mod_imgs is None:
        # camera-only request on a fusion model: feed zeroed sensor
        # streams in NORMALIZED space — exactly what RandomDrop trains
        # the model to tolerate (`transforms.py:486-514`), so this
        # degrades gracefully instead of failing like the reference's
        # camera-only inference API
        mod_ch = detector.cfg.model.backbone.mod_in_channels
        hw = results['img'].shape[:2]
        mod_arrays = [np.zeros((*hw, c), np.float32) for c in mod_ch]
    else:
        mod_arrays = [results[f'{n}_img'] for n in mods_names] or None
    return detector(results['img'], mod_arrays,
                    img_shape=results['img_shape'][:2],
                    scale_factor=results['scale_factor'])
