"""Tests for box math ops against naive numpy references."""

import numpy as np
import jax.numpy as jnp

from hrfuser_tpu.ops import (bbox2delta, bbox_overlaps, clip_boxes,
                             delta2bbox)


def _rand_boxes(n, w=640, h=384, seed=0):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, w - 10, n)
    y1 = rng.uniform(0, h - 10, n)
    bw = rng.uniform(4, 200, n)
    bh = rng.uniform(4, 200, n)
    return np.stack([x1, y1, np.minimum(x1 + bw, w),
                     np.minimum(y1 + bh, h)], -1).astype(np.float32)


def _np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def test_iou_matches_numpy():
    a = _rand_boxes(37, seed=1)
    b = _rand_boxes(23, seed=2)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-5)


def test_iou_iof_mode():
    a = _rand_boxes(5, seed=3)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(a),
                                   mode='iof'))
    assert np.allclose(np.diag(got), 1.0, atol=1e-5)


def test_delta_roundtrip():
    proposals = _rand_boxes(50, seed=4)
    gts = _rand_boxes(50, seed=5)
    means = (0., 0., 0., 0.)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(proposals), jnp.asarray(gts), means, stds)
    rec = delta2bbox(jnp.asarray(proposals), deltas, means, stds)
    np.testing.assert_allclose(np.asarray(rec), gts, atol=1e-2)


def test_delta2bbox_reference_example():
    # From the reference docstring (`delta_xywh_bbox_coder.py:210-222`).
    rois = jnp.asarray([[0., 0., 1., 1.],
                        [0., 0., 1., 1.],
                        [0., 0., 1., 1.],
                        [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.],
                          [1., 1., 1., 1.],
                          [0., 0., 2., -1.],
                          [0.7, -1.9, -0.5, 0.3]])
    out = np.asarray(delta2bbox(rois, deltas, max_shape=(32, 32)))
    expect = np.array([[0.0000, 0.0000, 1.0000, 1.0000],
                       [0.1409, 0.1409, 2.8591, 2.8591],
                       [0.0000, 0.3161, 4.1945, 0.6839],
                       [5.0000, 5.0000, 5.0000, 5.0000]])
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_clip_boxes():
    boxes = jnp.asarray([[-5., -5., 700., 400.]])
    out = np.asarray(clip_boxes(boxes, (384, 640)))
    np.testing.assert_allclose(out, [[0., 0., 640., 384.]])
