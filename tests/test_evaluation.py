"""Evaluator sanity tests: perfect/partial detections, known AP values."""

import numpy as np

from hrfuser_tpu.evaluation.coco_map import evaluate_coco_map
from hrfuser_tpu.evaluation.kitti_eval import kitti_eval_2d


def _gt(boxes, labels):
    return dict(boxes=np.asarray(boxes, np.float32),
                labels=np.asarray(labels, np.int64))


def _pred(boxes, scores, labels):
    return dict(boxes=np.asarray(boxes, np.float32),
                scores=np.asarray(scores, np.float32),
                labels=np.asarray(labels, np.int64))


def test_coco_perfect_detection():
    gts = [_gt([[10, 10, 100, 100], [200, 50, 300, 150]], [0, 1])]
    preds = [_pred([[10, 10, 100, 100], [200, 50, 300, 150]], [0.9, 0.8],
                   [0, 1])]
    res = evaluate_coco_map(preds, gts, num_classes=2)
    assert abs(res['mAP'] - 1.0) < 1e-6
    assert abs(res['mAP_50'] - 1.0) < 1e-6


def test_coco_miss_and_fp():
    # one gt, one perfect det + one FP with higher score
    gts = [_gt([[10, 10, 110, 110]], [0])]
    preds = [_pred([[400, 400, 500, 500], [10, 10, 110, 110]], [0.95, 0.9],
                   [0, 0])]
    res = evaluate_coco_map(preds, gts, num_classes=1)
    # precision at recall>0 is 1/2 -> AP ~ 0.5 (101-pt)
    assert 0.45 < res['mAP_50'] < 0.55


def test_coco_localization_quality():
    # det IoU ~ 0.6: counts at thr .5/.55/.6 only
    gts = [_gt([[0, 0, 100, 100]], [0])]
    preds = [_pred([[0, 0, 100, 62]], [0.9], [0])]
    res = evaluate_coco_map(preds, gts, num_classes=1)
    assert res['mAP_50'] == 1.0
    assert res['mAP_75'] == 0.0
    assert 0.2 < res['mAP'] < 0.4


def _many(n, cls='Car', h=60.0, score0=0.99):
    """n images, one perfect det each; distinct scores fill the 41 recall
    samples (KITTI AP needs >= 41 TPs to populate every sample point)."""
    gts, dts = [], []
    for i in range(n):
        box = np.array([[0, 0, 100, h]], float)
        gts.append(dict(name=np.array([cls]), bbox=box,
                        occluded=np.zeros(1), truncated=np.zeros(1)))
        dts.append(dict(name=np.array([cls]), bbox=box.copy(),
                        score=np.array([score0 - i * 0.01])))
    return gts, dts


def test_kitti_perfect():
    gts, dts = _many(50)
    res = kitti_eval_2d(gts, dts, ['Pedestrian', 'Cyclist', 'Car'])
    assert res['Car_2d_easy'] > 99.0
    # no cyclist gt -> AP 0 by convention here
    assert res['Cyclist_2d_easy'] == 0.0


def test_kitti_single_gt_matches_reference_quantization():
    """One gt fills one of 41 recall samples -> AP = 100/11 (the reference
    evaluator's exact behavior at tiny scale, `eval.py:9-27,573-577`)."""
    h = 60.0
    gts = [dict(name=np.array(['Car']), bbox=np.array([[0, 0, 100, h]]),
                occluded=np.zeros(1), truncated=np.zeros(1))]
    dts = [dict(name=np.array(['Car']), bbox=np.array([[0, 0, 100, h]]),
                score=np.array([0.9]))]
    res = kitti_eval_2d(gts, dts, ['Car'])
    assert abs(res['Car_2d_easy'] - 100.0 / 11) < 1e-6


def test_kitti_difficulty_gates():
    # 30px-high gts: invalid for easy (<=40), valid for moderate/hard
    gts, dts = _many(50, h=30.0)
    res = kitti_eval_2d(gts, dts, ['Car'])
    assert res['Car_2d_easy'] == 0.0        # no valid gt
    assert res['Car_2d_moderate'] > 99.0


def test_kitti_dontcare_absorbs():
    h = 60.0
    gts, dts = _many(50)
    # add a DontCare region + a det inside it to every image: not an FP
    for g, d in zip(gts, dts):
        g['name'] = np.array(['Car', 'DontCare'])
        g['bbox'] = np.vstack([g['bbox'], [[300, 0, 400, h]]])
        g['occluded'] = np.array([0, -1])
        g['truncated'] = np.zeros(2)
        d['name'] = np.array(['Car', 'Car'])
        d['bbox'] = np.vstack([d['bbox'], [[300, 0, 400, h]]])
        d['score'] = np.append(d['score'], d['score'][0] - 0.001)
    res = kitti_eval_2d(gts, dts, ['Car'])
    assert res['Car_2d_easy'] > 99.0
