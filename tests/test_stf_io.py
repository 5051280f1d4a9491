"""STF reader + projection-CLI math tests (synthetic data)."""

import json
import sys

import numpy as np
import pytest

from hrfuser_tpu.data.projection import dequantize, transform_matrix
from hrfuser_tpu.data.stf_io import (_chain_transform, load_calib,
                                     load_radar_targets,
                                     load_velodyne_scan)


def test_velodyne_roundtrip(tmp_path):
    scan = np.random.default_rng(0).normal(0, 1, (100, 5)).astype(np.float32)
    path = tmp_path / 's.bin'
    scan.tofile(path)
    out = load_velodyne_scan(str(path))
    np.testing.assert_array_equal(out, scan)


def test_radar_targets(tmp_path):
    data = dict(targets=[
        dict(x_sc=1.0, y_sc=2.0, rVelOverGroundOdo_sc=3.0, rDist_sc=4.0),
        dict(x_sc=-1.0, y_sc=0.5, rVelOverGroundOdo_sc=0.0, rDist_sc=9.0),
    ])
    path = tmp_path / 'r.json'
    path.write_text(json.dumps(data))
    out = load_radar_targets(str(path))
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out[0], [1.0, 2.0, 0.0, 3.0, 4.0])


def _tf_entry(child, parent, t, q):
    return dict(child_frame_id=child, frame_id=parent,
                transform=dict(
                    translation=dict(x=t[0], y=t[1], z=t[2]),
                    rotation=dict(w=q[0], x=q[1], y=q[2], z=q[3])))


def test_chain_transform():
    # lidar -> base -> cam chain; verify composed transform
    q_id = [1.0, 0, 0, 0]
    tree = [
        _tf_entry('lidar', 'base', [0, 0, 2.0], q_id),
        _tf_entry('cam', 'base', [1.0, 0, 1.5], q_id),
    ]
    t = _chain_transform(tree, 'lidar', 'cam')
    # lidar origin (0,0,0) -> base (0,0,2) -> cam frame (-1, 0, 0.5)
    p = t @ np.array([0., 0., 0., 1.])
    np.testing.assert_allclose(p[:3], [-1.0, 0.0, 0.5], atol=1e-12)


def test_load_calib(tmp_path):
    cam = dict(P=[[100.0, 0, 32, 0], [0, 100.0, 24, 0], [0, 0, 1, 0]])
    (tmp_path / 'calib_cam_stereo_left.json').write_text(json.dumps(cam))
    tree = [
        _tf_entry('lidar_hdl64_s3_roof', 'base', [0, 0, 2.0],
                  [1.0, 0, 0, 0]),
        _tf_entry('cam_stereo_left_optical', 'base', [0, 0, 1.0],
                  [1.0, 0, 0, 0]),
    ]
    (tmp_path / 'calib_tf_tree_full.json').write_text(json.dumps(tree))
    k, t = load_calib(str(tmp_path))
    assert k.shape == (3, 3)
    assert k[0, 0] == 100.0
    p = t @ np.array([0., 0., 0., 1.])
    np.testing.assert_allclose(p[:3], [0, 0, 1.0], atol=1e-12)


def test_project_frame_smoke():
    sys.path.insert(0, '/root/repo/tools')
    from stf_projection import project_frame
    rng = np.random.default_rng(0)
    # points in front of a camera looking down +z after velo->cam
    scan = np.zeros((50, 5), np.float32)
    scan[:, 0] = rng.uniform(5, 40, 50)        # velodyne x = forward
    scan[:, 1] = rng.uniform(-5, 5, 50)
    scan[:, 2] = rng.uniform(-1, 2, 50)
    scan[:, 3] = rng.uniform(0, 1, 50)
    radar = np.zeros((3, 5))
    radar[:, 0] = [10.0, 20.0, 30.0]
    radar[:, 3] = [1.0, -2.0, 0.5]
    # velodyne(x fwd, y left, z up) -> cam(z fwd, x right, y down)
    t = np.array([[0., -1., 0., 0.],
                  [0., 0., -1., 0.],
                  [1., 0., 0., 0.],
                  [0., 0., 0., 1.]])
    k = np.array([[500., 0., 640.], [0., 500., 384.], [0., 0., 1.]])
    yzi, yzv = project_frame(scan, radar, k, t)
    assert yzi.shape == (768, 1280, 3)
    deq = dequantize(yzi)
    assert (deq != 0).any()                  # some lidar points landed
    deqr = dequantize(yzv)
    # radar pillars are full-height columns
    cols = np.unique(np.nonzero(deqr[:, :, 1])[1])
    for c in cols:
        assert (deqr[:, c, 1] != 0).all()
