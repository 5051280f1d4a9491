"""LoadStackedGatedImageFromFile: 3 gated slices stacked channel-wise,
missing slices substituted with zeros (reference
`mmdet/datasets/pipelines/loading.py:155-229`)."""

import cv2
import numpy as np

from hrfuser_tpu.data.pipelines.loading import LoadStackedGatedImageFromFile


def test_stacked_gated_loads_and_zero_fills(tmp_path):
    h, w = 24, 32
    rng = np.random.default_rng(0)
    imgs = []
    # slice 0 and 2 exist; slice 1 missing -> zeros
    for folder in ('gated0_rect', 'gated2_rect'):
        (tmp_path / folder).mkdir()
        img = rng.integers(0, 255, (h, w), np.uint8)
        cv2.imwrite(str(tmp_path / folder / 'f0.png'), img)
        imgs.append(img)

    loader = LoadStackedGatedImageFromFile(expected_shape=(h, w))
    results = loader(dict(gated_prefix=str(tmp_path),
                          img_info=dict(filename='f0.png')))

    out = results['gated_img']
    assert out.shape == (h, w, 3)
    np.testing.assert_array_equal(out[..., 0], imgs[0].astype(np.float32))
    assert (out[..., 1] == 0).all()
    np.testing.assert_array_equal(out[..., 2], imgs[1].astype(np.float32))
    assert 'gated_img' in results['img_fields']
    assert len(results['gated_filenames']) == 3


def test_stacked_gated_rejects_wrong_shape(tmp_path):
    (tmp_path / 'gated0_rect').mkdir()
    cv2.imwrite(str(tmp_path / 'gated0_rect' / 'f0.png'),
                np.zeros((8, 8), np.uint8))
    loader = LoadStackedGatedImageFromFile(expected_shape=(24, 32))
    try:
        loader(dict(gated_prefix=str(tmp_path),
                    img_info=dict(filename='f0.png')))
    except ValueError as e:
        assert 'unexpected gated image shape' in str(e)
    else:
        raise AssertionError('expected ValueError')
