"""Test-only oracle: transcription of the reference proposal-recall
matching (`mmdet/core/evaluation/recall.py:12-41` `_recalls` +
`eval_recalls` :66-112), used to differentially fuzz
`hrfuser_tpu.evaluation.recall.eval_recalls`."""

import numpy as np


def _iou(a, b):
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-9)


def eval_recalls_oracle(gts, proposals, proposal_nums, iou_thrs):
    proposal_nums = np.asarray(proposal_nums)
    iou_thrs = np.asarray(iou_thrs, np.float64)
    all_ious = []
    for g, p in zip(gts, proposals):
        p = np.asarray(p, np.float32)
        if p.ndim == 2 and p.shape[1] == 5:
            p = p[np.argsort(p[:, 4])[::-1]]
        prop_num = min(p.shape[0], proposal_nums[-1])
        g = np.asarray(g, np.float32).reshape(-1, 4)
        if g.shape[0] == 0:
            ious = np.zeros((0, p.shape[0]), np.float32)
        else:
            ious = _iou(g, p[:prop_num, :4])
        all_ious.append(ious)

    total_gt = sum(i.shape[0] for i in all_ious)
    _ious = np.zeros((proposal_nums.size, max(total_gt, 1)), np.float32)
    for k, pn in enumerate(proposal_nums):
        tmp = np.zeros(0)
        for ious0 in all_ious:
            ious = ious0[:, :pn].copy()
            gt_ious = np.zeros(ious.shape[0])
            if ious.size == 0:
                tmp = np.hstack((tmp, gt_ious))
                continue
            for j in range(ious.shape[0]):
                gt_max = ious.argmax(axis=1)
                max_ious = ious[np.arange(ious.shape[0]), gt_max]
                gi = max_ious.argmax()
                gt_ious[j] = max_ious[gi]
                ious[gi, :] = -1
                ious[:, gt_max[gi]] = -1
            tmp = np.hstack((tmp, gt_ious))
        _ious[k, :len(tmp)] = tmp

    recalls = np.zeros((proposal_nums.size, iou_thrs.size))
    for i, thr in enumerate(iou_thrs):
        recalls[:, i] = (_ious[:, :total_gt] >= thr).sum(axis=1) / float(
            max(total_gt, 1))
    return recalls
