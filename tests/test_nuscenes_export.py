"""nuScenes 2D export: box projection semantics + json assembly
(reference `tools/data_converter/nuscenes_converter.py:650-960`)."""

import json

import numpy as np

from hrfuser_tpu.data.nuscenes_export import (NUS_CATEGORIES,
                                              export_2d_annotation,
                                              get_2d_boxes)
from hrfuser_tpu.data.projection import (box3d_corners, box3d_to_2d,
                                         convex_hull_2d)


def test_hull_clip_tighter_than_minmax():
    """bbox(hull ∩ canvas) can be tighter than clip(bbox(points))."""
    # triangle poking its apex into the canvas from the lower-left
    pts = np.array([[10., -50., -50.],     # x
                    [10., -20., -10.],     # y
                    [1., 1., 1.]])         # z=1 (K=I -> uv = xy)
    k = np.eye(3)
    bbox = box3d_to_2d(pts, k, (100, 100))
    x1, y1, x2, y2 = bbox
    assert abs(x1 - 0.0) < 1e-9 and abs(x2 - 10.0) < 1e-9
    assert abs(y2 - 10.0) < 1e-9
    assert abs(y1 - 5.0) < 1e-9          # naive clip would give y1 = 0


def test_box_behind_camera_none():
    pts = np.array([[0., 1.], [0., 1.], [-1., -2.]])
    assert box3d_to_2d(pts, np.eye(3), (100, 100)) is None


def test_convex_hull_basic():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1]], float)
    hull = convex_hull_2d(pts)
    assert len(hull) == 4
    assert {tuple(p) for p in hull} == {(0., 0.), (2., 0.), (2., 2.),
                                        (0., 2.)}


class FakeDB:
    """Minimal nuScenes-devkit-shaped DB: one sample, one camera."""

    def __init__(self):
        ident = [1.0, 0.0, 0.0, 0.0]
        # camera: looks along global +x; cam frame z=forward, x=right,
        # y=down  <=>  rotation quat for R_cam columns (x_cam=-g_y ...)
        # keep it simple: identity extrinsics, boxes defined in cam frame
        self.tables = {
            'sample_data': {'sd1': {
                'token': 'sd1', 'sample_token': 's1',
                'sensor_modality': 'camera', 'is_key_frame': True,
                'calibrated_sensor_token': 'cs1', 'ego_pose_token': 'ep1',
                'filename': 'samples/CAM_FRONT/img1.jpg',
                'width': 1600, 'height': 900}},
            'sample': {'s1': {'token': 's1', 'anns': ['a1', 'a2', 'a3']}},
            'calibrated_sensor': {'cs1': {
                'translation': [0., 0., 0.], 'rotation': ident,
                'camera_intrinsic': [[800., 0., 800.],
                                     [0., 800., 450.],
                                     [0., 0., 1.]]}},
            'ego_pose': {'ep1': {'translation': [0., 0., 0.],
                                 'rotation': ident}},
            'sample_annotation': {
                # 4m ahead (z_cam = +4 after identity transforms)
                'a1': {'token': 'a1', 'translation': [0., 0., 4.],
                       'size': [2., 2., 2.], 'rotation': ident,
                       'category_name': 'vehicle.car',
                       'visibility_token': '4', 'attribute_tokens': []},
                # behind the camera
                'a2': {'token': 'a2', 'translation': [0., 0., -10.],
                       'size': [2., 2., 2.], 'rotation': ident,
                       'category_name': 'vehicle.car',
                       'visibility_token': '4', 'attribute_tokens': []},
                # filtered by visibility
                'a3': {'token': 'a3', 'translation': [1., 0., 6.],
                       'size': [2., 2., 2.], 'rotation': ident,
                       'category_name': 'human.pedestrian.adult',
                       'visibility_token': '1', 'attribute_tokens': []},
            },
        }

    def get(self, table, token):
        return self.tables[table][token]

    def box_velocity(self, token):
        return np.array([1.0, 0.0, 0.0])


def test_get_2d_boxes_fake_db():
    db = FakeDB()
    recs = get_2d_boxes(db, 'sd1', visibilities=('2', '3', '4'),
                        mono3d=True)
    assert len(recs) == 1
    r = recs[0]
    assert r['category_name'] == 'car'
    assert r['category_id'] == NUS_CATEGORIES.index('car')
    assert r['visibility_token'] == '4'
    # cube center z=4, half-size 1 -> nearest face z=3, |x|,|y| <= 1
    # -> u in 800 +- 800/3*1... widest extent from the near face:
    x1, y1, w, h = r['bbox']
    np.testing.assert_allclose([x1, y1], [800 - 800 / 3, 450 - 800 / 3],
                               rtol=1e-6)
    np.testing.assert_allclose([x1 + w, y1 + h],
                               [800 + 800 / 3, 450 + 800 / 3], rtol=1e-6)
    assert r['center2d'][2] == 4.0
    assert r['attribute_name'] == 'None'


def test_export_roundtrip_into_dataset(tmp_path):
    db = FakeDB()
    infos = [{
        'token': 's1',
        'ego2global_translation': [0., 0., 0.],
        'ego2global_rotation': [1., 0., 0., 0.],
        'cams': {'CAM_FRONT': {
            'sample_data_token': 'sd1',
            'data_path': 'data/nuscenes/samples/CAM_FRONT/img1.jpg',
            'cam_intrinsic': db.tables['calibrated_sensor']['cs1'][
                'camera_intrinsic'],
            'sensor2ego_translation': [0., 0., 0.],
            'sensor2ego_rotation': [1., 0., 0., 0.],
            'width': 1600, 'height': 900}},
        'lidar_img': {'CAM_FRONT': {
            'width': 640, 'height': 360, 'background': 20000.0,
            'img_scale_factor': 2.5,
            'rih': {'file_name': 'data/nuscenes/lidar_samples/rih/sd1.png',
                    'pixel_scale_factor': 100.0, 'shift': 200.0,
                    'empty_channels': None},
            'xz0': {'file_name': 'data/nuscenes/lidar_samples/xz0/sd1.png',
                    'pixel_scale_factor': 100.0, 'shift': 200.0,
                    'empty_channels': [2]}}},
        'radar_img': {'CAM_FRONT': {
            'width': 640, 'height': 360, 'background': 20000.0,
            'img_scale_factor': 2.5,
            'riv': {'file_name': 'data/nuscenes/radar_samples/riv/sd1.png',
                    'pixel_scale_factor': 100.0, 'shift': 200.0,
                    'empty_channels': None},
            'xz0': {'file_name': 'data/nuscenes/radar_samples/xz0/sd1.png',
                    'pixel_scale_factor': 100.0, 'shift': 200.0,
                    'empty_channels': [2]}}},
    }]
    out = tmp_path / 'nuscenes_infos_val_mono3d.coco.json'
    coco = export_2d_annotation(db, infos, str(out))

    blob = json.loads(out.read_text())
    assert blob == json.loads(json.dumps(coco))
    assert len(blob['images']) == 1
    assert blob['images'][0]['id'] == 'sd1'
    assert blob['images'][0]['file_name'] == 'samples/CAM_FRONT/img1.jpg'
    assert len(blob['annotations']) == 1
    assert blob['annotations'][0]['id'] == 0
    assert blob['annotations'][0]['segmentation'] == []
    assert blob['lidar_projections'][0]['id'] == 'sd1l'
    assert blob['radar_projections'][0]['id'] == 'sd1r'
    assert blob['lidar_projections'][0]['rih']['file_name'] == \
        'lidar_samples/rih/sd1.png'

    # the emitted json is directly consumable by the dataset reader
    from hrfuser_tpu.data.datasets.coco import CocoFusionDataset
    ds = CocoFusionDataset(str(out), classes=list(NUS_CATEGORIES),
                           test_mode=True)
    assert len(ds) == 1
    ann = ds.get_ann_info(0)
    assert ann['bboxes'].shape == (1, 4)
    assert ds.lidar_by_img['sd1']['rih']['pixel_scale_factor'] == 100.0
