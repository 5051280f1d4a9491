"""Device-side preprocessing (jit-able, fuses into the model graph).

The reference does all preprocessing in CPU numpy inside DataLoader
workers (`mmdet/datasets/pipelines/`); on TPU the arithmetic part
(BGR->RGB, normalization, sensor dequantization, padding) fuses into the
inference program for free HBM-bandwidth-bound execution, leaving the CPU
only decode + resize. This is the production serving path:

    raw uint8/uint16 host arrays -> device -> `preprocess_*` -> model
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hrfuser_tpu.data import norms as norm_tables

Array = jnp.ndarray


def normalize_image(img: Array, mean, std, to_rgb: bool = True) -> Array:
    """uint8/float BGR [B, H, W, 3] -> normalized float32 (RGB)."""
    x = img.astype(jnp.float32)
    if to_rgb:
        x = x[..., ::-1]
    return (x - jnp.asarray(mean, jnp.float32)) \
        / jnp.asarray(std, jnp.float32)


def dequantize_sensor(img_u16: Array, scale: float = 100.0,
                      shift: float = 200.0) -> Array:
    """uint16 sensor png values -> raw float (`loading.py:303-310`)."""
    return img_u16.astype(jnp.float32) / scale - shift


def normalize_sensor(raw: Array, mean, std) -> Array:
    return (raw - jnp.asarray(mean, jnp.float32)) \
        / jnp.asarray(std, jnp.float32)


def pad_to_divisor(x: Array, divisor: int = 32) -> Array:
    b, h, w, c = x.shape
    ph = (-h) % divisor
    pw = (-w) % divisor
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


def modality_drop(rng: Array, streams: List[Array],
                  drop_p: Sequence[float]) -> List[Array]:
    """Train-time modality dropout on device (RandomDrop semantics):
    zero each stream independently per sample with prob p."""
    out = []
    for i, (x, p) in enumerate(zip(streams, drop_p)):
        k = jax.random.fold_in(rng, i)
        keep = jax.random.bernoulli(k, 1.0 - p, (x.shape[0],))
        out.append(x * keep[:, None, None, None].astype(x.dtype))
    return out


def make_device_preprocess(dataset: str = 'nuscenes',
                           modalities: Sequence[str] = ('lidar', 'radar'),
                           pad_divisor: int = 32,
                           sensor_scale: float = 100.0,
                           sensor_shift: float = 200.0):
    """Jittable preprocess: raw host arrays -> model-ready batch.

    Inputs: img uint8 [B,H,W,3] BGR; per-modality uint16 [B,H,W,C].
    The camera image must already be resized to the target grid (resize
    stays on CPU where cv2's exact interpolation is required for parity).
    """
    tables = norm_tables.STF if dataset == 'stf' else norm_tables.NUS

    def preprocess(img_u8: Array, mod_u16: Optional[List[Array]] = None
                   ) -> Tuple[Array, Optional[List[Array]]]:
        img = normalize_image(img_u8, **tables['img'])
        img = pad_to_divisor(img, pad_divisor)
        mods = None
        if mod_u16:
            mods = []
            for name, m in zip(modalities, mod_u16):
                raw = dequantize_sensor(m, sensor_scale, sensor_shift)
                t = tables[name]
                raw = normalize_sensor(raw, t['mean'], t['std'])
                mods.append(pad_to_divisor(raw, pad_divisor))
        return img, mods

    return preprocess


def make_raw_predictor(detector, variables, dataset: str = 'nuscenes',
                       modalities: Sequence[str] = ('lidar', 'radar')):
    """End-to-end raw-input predictor: uint8/uint16 in, detections out,
    one fused XLA program (preprocess + backbone + heads + NMS)."""
    from hrfuser_tpu.models.detectors.cascade_rcnn import predict

    pre = make_device_preprocess(dataset, modalities)

    @jax.jit
    def run(img_u8, mod_u16, img_shapes, scale_factors):
        img, mods = pre(img_u8, mod_u16)
        return predict(detector, variables, img, mods, img_shapes,
                       scale_factors)

    return run
