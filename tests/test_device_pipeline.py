"""Device-side preprocessing vs the CPU pipeline (numerical parity)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from hrfuser_tpu.data import norms
from hrfuser_tpu.data.device_pipeline import (dequantize_sensor,
                                              make_device_preprocess,
                                              modality_drop,
                                              normalize_image,
                                              pad_to_divisor)
from hrfuser_tpu.data.pipelines.transforms import Normalize, Pad

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier


def test_normalize_matches_cpu_pipeline():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (30, 40, 3), np.uint8).astype(np.float32)
    cpu = Normalize(**norms.NUS['img'], keys=['img'])(
        dict(img=img.copy(), img_fields=['img']))['img']
    dev = np.asarray(normalize_image(jnp.asarray(img)[None],
                                     **norms.NUS['img']))[0]
    np.testing.assert_allclose(dev, cpu, atol=1e-5)


def test_dequantize_matches_loader_math():
    raw = np.array([[[20000, 20100, 30000]]], np.uint16)
    out = np.asarray(dequantize_sensor(jnp.asarray(raw)))
    np.testing.assert_allclose(out, [[[0.0, 1.0, 100.0]]], atol=1e-4)


def test_pad_matches_cpu_pad():
    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (30, 40, 3)).astype(np.float32)
    cpu = Pad(32)(dict(img=img.copy(), img_fields=['img']))['img']
    dev = np.asarray(pad_to_divisor(jnp.asarray(img)[None], 32))[0]
    assert dev.shape == cpu.shape == (32, 64, 3)
    np.testing.assert_allclose(dev, cpu, atol=1e-6)


def test_full_preprocess_parity():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (2, 36, 44, 3), np.uint8)
    lidar = rng.integers(0, 65535, (2, 36, 44, 3), np.uint16)
    pre = jax.jit(make_device_preprocess('nuscenes', ('lidar',)))
    out_img, mods = pre(jnp.asarray(img), [jnp.asarray(lidar)])
    assert out_img.shape == (2, 64, 64, 3)
    assert mods[0].shape == (2, 64, 64, 3)
    # CPU reference for sample 0
    res = dict(img=img[0].astype(np.float32),
               lidar_img=lidar[0].astype(np.float32) / 100.0 - 200.0,
               img_fields=['img', 'lidar_img'])
    res = Normalize(**norms.NUS['lidar'], keys=['lidar_img'],
                    sensor_type='lidar')(res)
    res = Normalize(**norms.NUS['img'], keys=['img'])(res)
    res = Pad(32)(res)
    np.testing.assert_allclose(np.asarray(out_img)[0], res['img'],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mods[0])[0], res['lidar_img'],
                               atol=1e-3)


def test_modality_drop_zeroes_entire_streams():
    rng = jax.random.PRNGKey(0)
    streams = [jnp.ones((8, 4, 4, 2)), jnp.ones((8, 4, 4, 2))]
    out = modality_drop(rng, streams, [0.5, 0.5])
    for o in out:
        per_sample = np.asarray(o).reshape(8, -1)
        # each sample is either fully kept or fully zero
        assert all(v.min() == v.max() for v in per_sample)
