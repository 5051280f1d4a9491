"""Native C++ loader vs cv2 golden tests."""

import os
import tempfile

import cv2
import numpy as np
import pytest

from hrfuser_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native toolchain unavailable')


@pytest.fixture(scope='module')
def png16(tmp_path_factory):
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 65535, (40, 60, 3), np.uint16)
    path = str(tmp_path_factory.mktemp('native') / 'x.png')
    cv2.imwrite(path, raw)
    return path, raw


def test_png16_shape(png16):
    path, raw = png16
    assert native.png16_shape(path) == (40, 60, 3)


def test_png16_matches_cv2(png16):
    path, raw = png16
    dec = native.decode_png16(path)
    ref = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(dec, ref)
    np.testing.assert_array_equal(dec, raw)


def test_fused_sensor_decode(png16):
    path, raw = png16
    mean, std = [1., 2., 3.], [2., 3., 4.]
    fused = native.decode_sensor_png(path, 100.0, 200.0, mean, std)
    manual = ((raw.astype(np.float32) / 100.0 - 200.0
               - np.asarray(mean, np.float32))
              / np.asarray(std, np.float32))
    np.testing.assert_allclose(fused, manual, atol=1e-4)


def test_jpeg_matches_cv2(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 48, 3), np.uint8)
    path = str(tmp_path / 'x.jpg')
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    dec = native.decode_jpeg_bgr(path)
    ref = cv2.imread(path)
    # decoders may differ by tiny IDCT rounding; demand near-exactness
    assert np.abs(dec.astype(int) - ref.astype(int)).mean() < 0.5


def test_threaded_batch(png16):
    path, raw = png16
    outs = native.decode_sensor_batch([path] * 6, [(40, 60, 3)] * 6,
                                      100.0, 200.0, num_threads=3)
    single = native.decode_sensor_png(path, 100.0, 200.0)
    for o in outs:
        np.testing.assert_allclose(o, single)


def test_missing_file_errors():
    with pytest.raises(IOError):
        native.png16_shape('/nonexistent/file.png')
