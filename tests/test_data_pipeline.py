"""Data pipeline tests on a synthetic on-disk nuScenes-style mini set."""

import json
import os

import cv2
import numpy as np
import pytest

from hrfuser_tpu.configs import get_config
from hrfuser_tpu.data.datasets.coco import CocoFusionDataset
from hrfuser_tpu.data.loader import DetDataLoader, build_pipeline


@pytest.fixture(scope='module')
def mini_nuscenes(tmp_path_factory):
    root = tmp_path_factory.mktemp('nus')
    os.makedirs(root / 'samples', exist_ok=True)
    os.makedirs(root / 'lidar_samples', exist_ok=True)
    os.makedirs(root / 'radar_samples', exist_ok=True)

    rng = np.random.default_rng(0)
    images, annotations, lidar_proj, radar_proj = [], [], [], []
    for i in range(4):
        img_name = f'samples/cam_{i}.jpg'
        # full-res camera image 1600x900 like nuScenes
        img = rng.integers(0, 255, (900, 1600, 3), np.uint8)
        cv2.imwrite(str(root / img_name), img)
        images.append(dict(file_name=img_name, id=f'tok{i}',
                           width=1600, height=900))
        # two boxes per image
        for j in range(2):
            x, y = 100 + 300 * j + 10 * i, 200 + 100 * j
            annotations.append(dict(
                image_id=f'tok{i}', id=i * 10 + j, bbox=[x, y, 120, 80],
                category_id=j, iscrowd=0, area=120 * 80,
                visibility_token='4'))
        # sensor projections at 360x640, uint16 quantized (v+shift)*scale
        for kind, arr_list, suffix in (('lidar', lidar_proj, 'l'),
                                       ('radar', radar_proj, 'r')):
            ch = 'rih' if kind == 'lidar' else 'riv'
            png_name = f'{kind}_samples/{ch}_{i}.png'
            raw = rng.uniform(-1, 5, (360, 640, 3)).astype(np.float32)
            enc = ((raw + 200.0) * 100.0).astype(np.uint16)
            cv2.imwrite(str(root / png_name), enc)
            arr_list.append({
                'id': f'tok{i}{suffix}',
                ch: dict(file_name=png_name, pixel_scale_factor=100.0,
                         shift=200.0, empty_channels=[]),
            })

    classes = ['car', 'truck']
    coco = dict(
        images=images, annotations=annotations,
        categories=[dict(id=i, name=c) for i, c in enumerate(classes)],
        lidar_projections=lidar_proj, radar_projections=radar_proj)
    with open(root / 'ann.json', 'w') as f:
        json.dump(coco, f)
    return root, classes


def test_dataset_and_loader(mini_nuscenes):
    root, classes = mini_nuscenes
    ds = CocoFusionDataset('ann.json', classes, data_root=str(root))
    assert len(ds) == 4
    ann = ds.get_ann_info(0)
    assert ann['bboxes'].shape == (2, 4)

    cfg = get_config('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    loader = DetDataLoader(ds, cfg.data, batch_size=2, train=True, seed=0)
    batch = next(iter(loader))
    # 900x1600 -> x0.4 = 360x640 -> pad/32 = 384x640
    assert batch['img'].shape == (2, 384, 640, 3)
    assert len(batch['mod_imgs']) == 2
    assert batch['mod_imgs'][0].shape == (2, 384, 640, 3)
    assert batch['gt_boxes'].shape == (2, 100, 4)
    assert batch['gt_valid'].sum() > 0
    # boxes scaled into resized frame and inside it
    v = batch['gt_valid'][0]
    assert (batch['gt_boxes'][0][v] <= 640).all()
    np.testing.assert_allclose(batch['scale_factors'][0], 0.4, atol=1e-3)


def test_sensor_dequantization(mini_nuscenes):
    """uint16 -> /scale - shift roundtrip within quantization error, then
    normalized by the per-sensor stats."""
    root, classes = mini_nuscenes
    ds = CocoFusionDataset('ann.json', classes, data_root=str(root))
    cfg = get_config('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    pipe = build_pipeline(cfg.data, train=False)
    res = ds.sample(0)
    res['rng'] = np.random.default_rng(0)
    out = pipe(res)
    lidar = out['lidar_img']
    # normalized values should be finite & roughly standardized
    assert np.isfinite(lidar).all()
    assert abs(np.mean(lidar)) < 5


def test_test_mode_loader(mini_nuscenes):
    root, classes = mini_nuscenes
    ds = CocoFusionDataset('ann.json', classes, data_root=str(root),
                           test_mode=True)
    cfg = get_config('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    loader = DetDataLoader(ds, cfg.data, batch_size=4, train=False)
    batch = next(iter(loader))
    assert batch['img'].shape[0] == 4
    assert int(batch['num_real']) == 4


def test_modality_drop_reproducible(mini_nuscenes):
    root, classes = mini_nuscenes
    ds = CocoFusionDataset('ann.json', classes, data_root=str(root))
    cfg = get_config('cascade_rcnn_hrfuser_t_1x_nus_r640_l_r_fusion')
    l1 = DetDataLoader(ds, cfg.data, batch_size=2, train=True, seed=7)
    l2 = DetDataLoader(ds, cfg.data, batch_size=2, train=True, seed=7)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1['img'], b2['img'])
    np.testing.assert_array_equal(b1['mod_imgs'][0], b2['mod_imgs'][0])
