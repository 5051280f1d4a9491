"""init_detector/inference_detector on raw images (reference
`apis/inference.py`, plus modality support the reference lacks)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full tiny-detector jit (~6 min CPU)


@pytest.fixture(scope='module')
def tiny_detector():
    from hrfuser_tpu.apis.inference import init_detector
    return init_detector('tiny_fusion_test', input_hw=(64, 96))


def test_inference_with_mods(tiny_detector):
    from hrfuser_tpu.apis.inference import inference_detector
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (60, 90, 3)).astype(np.uint8)
    mods = [rng.uniform(0, 50, (60, 90, 3)).astype(np.float32)
            for _ in range(2)]
    det = inference_detector(tiny_detector, img, mods)
    assert set(det) == {'boxes', 'scores', 'labels'}
    assert det['boxes'].ndim == 2 and det['boxes'].shape[1] == 4
    # detections are rescaled to the ORIGINAL image frame
    if len(det['boxes']):
        assert det['boxes'][:, 2].max() <= 90 + 1e-3


def test_inference_camera_only_on_fusion_model(tiny_detector):
    """Missing modality streams degrade to zeroed (RandomDrop) inputs
    instead of failing."""
    from hrfuser_tpu.apis.inference import inference_detector
    img = np.random.default_rng(1).uniform(0, 255, (60, 90, 3)) \
        .astype(np.uint8)
    det = inference_detector(tiny_detector, img)
    assert np.isfinite(det['boxes']).all()
