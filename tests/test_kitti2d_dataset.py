"""Kitti2DDataset round-trip on a synthetic dense_infos pkl."""

import pickle

import numpy as np
import pytest

from hrfuser_tpu.data.datasets.kitti2d import Kitti2DDataset

CLASSES = ['PassengerCar', 'Pedestrian', 'RidableVehicle']


def _info(name, boxes, names, shape=(1024, 1920)):
    return {
        'image': {'image_path': f'cam_stereo_left_lut/{name}.png',
                  'image_shape': np.asarray(shape)},
        'annos': {
            'name': np.asarray(names),
            'bbox': np.asarray(boxes, np.float32).reshape(-1, 4),
            'truncated': np.zeros(len(names)),
            'occluded': np.zeros(len(names)),
        },
        'lidar_projections': {'yzi': {'file_name': f'lidar/{name}.png'}},
        'radar_projections': {'yzv': {'file_name': f'radar/{name}.png'}},
    }


@pytest.fixture
def pkl_files(tmp_path):
    train = [
        _info('a', [[100., 100., 300., 260.]], ['PassengerCar']),
        _info('b', [], []),                       # empty -> filtered
        _info('c', [[0., 0., 50., 50.], [400., 300., 480., 420.]],
              ['DontCare', 'Pedestrian']),
    ]
    split1 = [_info('d', [[10., 10., 60., 60.]], ['PassengerCar'])]
    split2 = [_info('e', [[20., 20., 70., 70.]], ['Pedestrian'])]
    paths = []
    for name, infos in (('train.pkl', train), ('s1.pkl', split1),
                        ('s2.pkl', split2)):
        p = tmp_path / name
        with open(p, 'wb') as f:
            pickle.dump(infos, f)
        paths.append(str(p))
    return paths


def test_train_filtering_and_labels(pkl_files):
    ds = Kitti2DDataset(pkl_files[0], CLASSES)
    assert len(ds) == 2                          # empty frame dropped
    ann = ds.get_ann_info(1)
    # DontCare not in class map -> only the pedestrian survives
    assert ann['labels'].tolist() == [1]
    np.testing.assert_allclose(ann['bboxes'], [[400., 300., 480., 420.]])
    s = ds.sample(0)
    assert s['lidar_info']['yzi']['file_name'] == 'lidar/a.png'


def test_weather_split_concat(pkl_files):
    ds = Kitti2DDataset(pkl_files[1:], CLASSES, test_mode=True)
    assert len(ds) == 2                          # concat of both splits


def test_detections_roundtrip(pkl_files):
    ds = Kitti2DDataset(pkl_files[0], CLASSES, test_mode=True)
    boxes = np.zeros((3, 5, 4), np.float32)
    scores = np.zeros((3, 5), np.float32)
    labels = -np.ones((3, 5), np.int64)
    valid = np.zeros((3, 5), bool)
    boxes[0, 0] = [1., 2., 3., 4.]
    scores[0, 0] = 0.9
    labels[0, 0] = 2
    valid[0, 0] = True
    annos = ds.detections_to_kitti(boxes, scores, labels, valid)
    assert annos[0]['name'].tolist() == ['RidableVehicle']
    np.testing.assert_allclose(annos[0]['score'], [0.9])
    assert len(annos[1]['name']) == 0


def test_eval_on_crop_gt(pkl_files):
    ds = Kitti2DDataset(pkl_files[0], CLASSES, test_mode=True)
    # reference STF eval crop: (384, 1248) @ (394, 296)
    gts = ds.gt_annos(crop=(384, 1248, 394, 296))
    assert len(gts) == 3
    # frame 'a' box [100..300, 100..260] is fully above the crop -> gone
    assert len(gts[0]['bbox']) == 0
    # uncropped GT unchanged
    raw = ds.gt_annos()
    np.testing.assert_allclose(raw[0]['bbox'],
                               [[100., 100., 300., 260.]])


def test_eval_pipeline_with_kitti_eval(pkl_files):
    """Detections == (cropped) GT must yield AP 100 via kitti_eval."""
    from hrfuser_tpu.evaluation.kitti_eval import kitti_eval_2d

    ds = Kitti2DDataset(pkl_files[0], CLASSES, test_mode=True)
    gts = ds.gt_annos()
    dets = []
    for g in gts:
        n = len(g['bbox'])
        keep = [i for i, nm in enumerate(g['name'])
                if nm in CLASSES]
        dets.append(dict(
            name=np.asarray([g['name'][i] for i in keep]),
            bbox=np.asarray(g['bbox'])[keep].reshape(-1, 4),
            score=np.ones(len(keep), np.float32),
            truncated=np.zeros(len(keep)), occluded=np.zeros(len(keep)),
            alpha=np.zeros(len(keep)),
            dimensions=np.full((len(keep), 3), 10.0),
            location=np.zeros((len(keep), 3)),
            rotation_y=np.zeros(len(keep))))
        del n
    res = kitti_eval_2d(gts, dets, CLASSES)
    assert any('PassengerCar' in k or 'bbox' in k for k in res)
