"""Proposal recall (AR@N): differential fuzz vs the reference-matching
oracle + the dataset-level `fast_eval_recall` wrapper + class-subset
COCO eval (`evaluation_ids`)."""

import numpy as np
import pytest

from hrfuser_tpu.evaluation.recall import eval_recalls, fast_eval_recall
from tests.oracles.recall_oracle import eval_recalls_oracle


def _rand_boxes(rng, n, w=640, h=384):
    x1 = rng.uniform(0, w - 2, n)
    y1 = rng.uniform(0, h - 2, n)
    bw = rng.uniform(2, 200, n)
    bh = rng.uniform(2, 200, n)
    return np.stack([x1, y1, np.minimum(x1 + bw, w),
                     np.minimum(y1 + bh, h)], -1).astype(np.float32)


@pytest.mark.parametrize('seed', range(20))
def test_eval_recalls_matches_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    gts, props = [], []
    for _ in range(6):
        n_gt = int(rng.integers(0, 10))
        n_p = int(rng.integers(0, 60))
        g = _rand_boxes(rng, n_gt)
        # overlap mass: perturb gts, plus random distractors, plus scores
        n_near = min(n_p, n_gt)
        near = g[:n_near] + rng.normal(0, 10, (n_near, 4)).astype(
            np.float32) if n_near else np.zeros((0, 4), np.float32)
        far = _rand_boxes(rng, n_p - n_near)
        p = np.concatenate([near, far]).clip(0, 640)
        p[:, 2] = np.maximum(p[:, 2], p[:, 0] + 1)
        p[:, 3] = np.maximum(p[:, 3], p[:, 1] + 1)
        scores = rng.uniform(0, 1, n_p).astype(np.float32)
        gts.append(g)
        props.append(np.concatenate([p, scores[:, None]], axis=1))

    nums = (5, 20, 50)
    thrs = [0.3, 0.5, 0.7, 0.9]
    got = eval_recalls(gts, props, nums, thrs)
    want = eval_recalls_oracle(gts, props, nums, thrs)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_eval_recalls_unscored_proposals_keep_order():
    """4-column proposals are used in the given order (no re-rank)."""
    gts = [np.asarray([[0., 0., 10., 10.]], np.float32)]
    good = [0., 0., 10., 10.]
    bad = [100., 100., 110., 110.]
    props = [np.asarray([bad, good], np.float32)]
    # budget 1 sees only the bad proposal -> recall 0; budget 2 -> 1
    r = eval_recalls(gts, props, (1, 2), 0.5)
    assert r[0, 0] == 0.0 and r[1, 0] == 1.0


class _StubDataset:
    def __init__(self, gt_boxes):
        self._g = gt_boxes

    def __len__(self):
        return len(self._g)

    def get_ann_info(self, i):
        return dict(bboxes=self._g[i])


def test_fast_eval_recall_wrapper():
    g = np.asarray([[0., 0., 50., 50.], [100., 100., 200., 180.]],
                   np.float32)
    ds = _StubDataset([g, np.zeros((0, 4), np.float32)])
    dets = np.concatenate([g + 1.0, np.asarray([[0.9], [0.8]],
                                               np.float32)], axis=1)
    out = fast_eval_recall(ds, [dets, np.zeros((0, 5), np.float32)],
                           proposal_nums=(1, 2), iou_thrs=0.5)
    assert out['AR@1'] == 0.5 and out['AR@2'] == 1.0


def test_coco_map_class_subset():
    """`class_ids` restricts the mean to the subset — matching the
    reference's `evaluation_ids` catIds override (`coco.py:485-486`)."""
    from hrfuser_tpu.evaluation.coco_map import evaluate_coco_map
    g0 = np.asarray([[0., 0., 50., 50.]], np.float32)
    g1 = np.asarray([[60., 60., 120., 130.]], np.float32)
    gts = [dict(boxes=np.concatenate([g0, g1]),
                labels=np.asarray([0, 1]))]
    # class 0 predicted perfectly; class 1 not predicted at all
    preds = [dict(boxes=g0, scores=np.asarray([0.9], np.float32),
                  labels=np.asarray([0]))]
    full = evaluate_coco_map(preds, gts, num_classes=2)
    sub = evaluate_coco_map(preds, gts, num_classes=2, class_ids=(0,))
    assert full['mAP'] == pytest.approx(0.5, abs=1e-6)
    assert sub['mAP'] == pytest.approx(1.0, abs=1e-6)
    assert np.isnan(sub['AP_cls1'])
