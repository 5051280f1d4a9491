"""Assigner / sampler / target / loss / schedule unit tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from hrfuser_tpu.configs.presets import OptimCfg, ScheduleCfg
from hrfuser_tpu.core.assigners import max_iou_assign
from hrfuser_tpu.core.losses import sigmoid_bce, smooth_l1, softmax_ce
from hrfuser_tpu.core.samplers import random_sample, select_fixed
from hrfuser_tpu.core.targets import (RCNN_TRAIN_CFGS,
                                      rcnn_stage_targets_single,
                                      rpn_targets_single)
from hrfuser_tpu.apis.train import make_lr_schedule

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `-m "not slow"` fast tier


def test_assigner_basic():
    gt = jnp.asarray([[0., 0., 100., 100.], [200., 200., 300., 300.]])
    gt_labels = jnp.asarray([3, 7])
    gt_valid = jnp.asarray([True, True])
    boxes = jnp.asarray([
        [0., 0., 100., 100.],        # IoU 1.0 with gt0 -> pos
        [0., 0., 50., 100.],         # IoU 0.5 -> between neg(.3) & pos(.7)
        [500., 500., 600., 600.],    # IoU 0  -> neg
        [190., 190., 290., 290.],    # high IoU with gt1 -> pos
    ])
    res = max_iou_assign(gt, gt_labels, gt_valid, boxes,
                         jnp.ones(4, bool), 0.7, 0.3, 0.3, True)
    gi = np.asarray(res.gt_inds)
    assert gi[0] == 1 and gi[2] == 0 and gi[3] == 2
    assert gi[1] == -1                      # ignore zone
    assert np.asarray(res.labels)[0] == 3
    assert np.asarray(res.labels)[3] == 7


def test_assigner_low_quality_match():
    # gt overlapping nothing above pos_thr still claims its best anchor
    gt = jnp.asarray([[0., 0., 60., 60.]])
    boxes = jnp.asarray([[0., 0., 100., 100.],   # IoU 0.36
                         [300., 300., 400., 400.]])
    res = max_iou_assign(gt, jnp.asarray([1]), jnp.asarray([True]), boxes,
                         jnp.ones(2, bool), 0.7, 0.3, 0.3, True)
    assert np.asarray(res.gt_inds)[0] == 1
    res2 = max_iou_assign(gt, jnp.asarray([1]), jnp.asarray([True]), boxes,
                          jnp.ones(2, bool), 0.7, 0.3, 0.3, False)
    assert np.asarray(res2.gt_inds)[0] == -1   # without low-quality match


def test_assigner_invalid_gt_ignored():
    gt = jnp.asarray([[0., 0., 100., 100.], [0., 0., 100., 100.]])
    valid = jnp.asarray([False, True])
    boxes = jnp.asarray([[0., 0., 100., 100.]])
    res = max_iou_assign(gt, jnp.asarray([0, 5]), valid, boxes,
                         jnp.ones(1, bool), 0.7, 0.3, 0.3, True)
    assert np.asarray(res.gt_inds)[0] == 2     # assigned to the VALID gt


def test_sampler_quota():
    rng = jax.random.PRNGKey(0)
    pos = jnp.asarray([True] * 300 + [False] * 700)
    neg = jnp.asarray([False] * 300 + [True] * 700)
    s = random_sample(rng, pos, neg, 256, 0.5)
    assert int(s.num_pos) == 128
    assert int(s.num_neg) == 128
    assert int(s.pos_mask.sum()) == 128
    assert not bool((s.pos_mask & ~pos).any())


def test_sampler_few_positives():
    rng = jax.random.PRNGKey(1)
    pos = jnp.asarray([True] * 10 + [False] * 990)
    neg = jnp.asarray([False] * 10 + [True] * 990)
    s = random_sample(rng, pos, neg, 256, 0.5)
    assert int(s.num_pos) == 10
    assert int(s.num_neg) == 246             # quota backfilled by negatives


def test_select_fixed_orders_pos_first():
    rng = jax.random.PRNGKey(2)
    pos = jnp.asarray([False, True, False, True, False])
    neg = jnp.asarray([True, False, False, False, True])
    s = random_sample(rng, pos, neg, 4, 0.5)
    idx, is_pos, valid = select_fixed(s, 4)
    assert bool(valid.all())
    assert np.asarray(is_pos)[:2].all()      # positives lead


def test_rpn_targets_single():
    rng = jax.random.PRNGKey(0)
    anchors = jnp.asarray(
        np.random.default_rng(0).uniform(0, 90, (500, 2)).repeat(2, 1)
        + np.asarray([0., 0., 30., 30.]), jnp.float32)
    flags = jnp.ones(500, bool)
    gt = jnp.asarray([[10., 10., 45., 45.]])
    t = rpn_targets_single(rng, anchors, flags, gt, jnp.asarray([True]),
                           (128., 128.))
    assert t.cls_targets.shape == (500,)
    assert float(t.num_samples) <= 256
    # every positively-weighted bbox row has a positive cls target
    w = np.asarray(t.bbox_weights[:, 0]) > 0
    assert (np.asarray(t.cls_targets)[w] == 1).all()


def test_rcnn_stage_targets_single():
    rng = jax.random.PRNGKey(0)
    props = jnp.asarray(
        np.random.default_rng(1).uniform(0, 80, (200, 2)).repeat(2, 1)
        + np.asarray([0., 0., 40., 40.]), jnp.float32)
    gt = jnp.asarray([[10., 10., 50., 50.], [60., 60., 100., 100.]])
    gt_labels = jnp.asarray([2, 5])
    t = rcnn_stage_targets_single(
        rng, props, jnp.ones(200, bool), gt, gt_labels,
        jnp.ones(2, bool), num_classes=10, stds=(0.1, 0.1, 0.2, 0.2),
        cfg=RCNN_TRAIN_CFGS[0])
    assert t.rois.shape == (512, 4)
    labels = np.asarray(t.labels)
    pos = labels < 10
    # gts were appended as proposals and are positives of their own class
    assert set(labels[pos]) <= {2, 5}
    assert bool(t.is_gt.sum() >= 2)
    assert float(t.num_pos) >= 2


def test_losses_values():
    logits = jnp.asarray([10.0, -10.0])
    targets = jnp.asarray([1.0, 0.0])
    w = jnp.ones(2)
    assert float(sigmoid_bce(logits, targets, w, 2.0)) < 1e-3
    ce = softmax_ce(jnp.asarray([[10., 0., 0.]]), jnp.asarray([0]),
                    jnp.ones(1), 1.0)
    assert float(ce) < 1e-3
    sl = smooth_l1(jnp.asarray([[1.0]]), jnp.asarray([[0.0]]),
                   jnp.ones((1, 1)), 1.0, beta=1.0)
    assert abs(float(sl) - 0.5) < 1e-6


def test_lr_schedule():
    sched = make_lr_schedule(OptimCfg(lr=3e-4),
                             ScheduleCfg(warmup_iters=500,
                                         warmup_ratio=1e-3,
                                         lr_steps=(8, 11)),
                             steps_per_epoch=100)
    assert abs(float(sched(jnp.asarray(0))) - 3e-4 * 1e-3) < 1e-9
    assert abs(float(sched(jnp.asarray(500))) - 3e-4) < 1e-9
    assert abs(float(sched(jnp.asarray(850))) - 3e-5) < 1e-9
    assert abs(float(sched(jnp.asarray(1150))) - 3e-6) < 1e-9


def test_assigner_all_gts_invalid_marks_boxes_negative():
    """Empty-GT images: the reference's num_gts == 0 branch marks every
    box negative (background), not ignore (`max_iou_assigner.py:128-140`)
    — ignore would silence the classifier loss on those images."""
    import jax.numpy as jnp
    from hrfuser_tpu.core.assigners import max_iou_assign
    gt = jnp.zeros((3, 4))
    gtl = jnp.zeros((3,), jnp.int32)
    gtv = jnp.zeros((3,), bool)
    boxes = jnp.asarray([[0., 0., 10., 10.], [5., 5., 30., 30.]])
    bv = jnp.asarray([True, True])
    res = max_iou_assign(gt, gtl, gtv, boxes, bv,
                         pos_iou_thr=0.7, neg_iou_thr=0.3,
                         min_pos_iou=0.3, match_low_quality=True)
    assert (jnp.asarray(res.gt_inds) == 0).all()
    assert (jnp.asarray(res.max_overlaps) == 0.0).all()
