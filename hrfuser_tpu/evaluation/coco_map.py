"""Self-contained COCO-style bbox mAP (numpy; no pycocotools).

Replaces the reference's pycocotools `COCOeval` dependency
(`mmdet/datasets/coco.py:383-560`, C extension) with a pure-numpy
implementation of the COCO protocol: 10 IoU thresholds .5:.05:.95,
101-point interpolated precision, area ranges (all/small/medium/large),
maxDets=100, per-class then mean. Matching follows COCOeval: detections
sorted by score, each matched to the best still-unmatched gt with
IoU >= threshold; crowd/ignored gts absorb detections without penalty.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    'all': (0.0, 1e10),
    'small': (0.0, 32.0 ** 2),
    'medium': (32.0 ** 2, 96.0 ** 2),
    'large': (96.0 ** 2, 1e10),
}


def _iou(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    ad = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    ag = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(ad[:, None] + ag[None, :] - inter, 1e-9)


def _match_image(dets: np.ndarray, det_scores: np.ndarray,
                 gts: np.ndarray, gt_ignore: np.ndarray,
                 area_rng, max_dets: int):
    """COCOeval-style greedy matching for one image/class.

    Returns (det_matched [T, D], det_ignore [T, D], n_gt) where D is the
    number of kept detections (score-sorted, truncated to max_dets).
    """
    order = np.argsort(-det_scores, kind='stable')[:max_dets]
    dets = dets[order]
    n_d, n_g = len(dets), len(gts)

    g_area = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]) \
        if n_g else np.zeros(0)
    g_ig = gt_ignore | (g_area < area_rng[0]) | (g_area > area_rng[1])
    # sort gts: non-ignored first (COCOeval matches them preferentially)
    g_order = np.argsort(g_ig, kind='stable')
    gts_s = gts[g_order]
    g_ig_s = g_ig[g_order]

    ious = _iou(dets, gts_s)
    t = len(IOU_THRS)
    matched = np.zeros((t, n_d), bool)
    ignored = np.zeros((t, n_d), bool)

    d_area = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1]) \
        if n_d else np.zeros(0)
    d_out_of_range = (d_area < area_rng[0]) | (d_area > area_rng[1])

    for ti, thr in enumerate(IOU_THRS):
        g_used = np.zeros(n_g, bool)
        for di in range(n_d):
            best, best_iou = -1, min(thr, 1 - 1e-10)
            for gi in range(n_g):
                if g_used[gi] and not g_ig_s[gi]:
                    continue
                # stop moving to ignored gts once matched to a real one
                if best > -1 and not g_ig_s[best] and g_ig_s[gi]:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                best = gi
            if best >= 0:
                g_used[best] = True
                matched[ti, di] = True
                ignored[ti, di] = g_ig_s[best]
        # unmatched dets outside the area range are ignored, not FP
        ignored[ti] |= (~matched[ti]) & d_out_of_range

    n_real_gt = int((~g_ig).sum())
    return matched, ignored, n_real_gt, det_scores[order]


def evaluate_coco_map(predictions: Sequence[dict], groundtruths: Sequence[dict],
                      num_classes: int, max_dets: int = 100
                      ) -> Dict[str, float]:
    """COCO bbox mAP over paired per-image predictions/gts.

    Args:
        predictions: per image dict(boxes [N,4], scores [N], labels [N]).
        groundtruths: per image dict(boxes [M,4], labels [M],
            ignore [M] bool optional).

    Returns:
        {'mAP', 'mAP_50', 'mAP_75', 'mAP_s', 'mAP_m', 'mAP_l',
         'AP_<cls>' per class}
    """
    t = len(IOU_THRS)
    r = len(RECALL_THRS)
    n_areas = len(AREA_RANGES)
    # precision[t, r, class, area]
    precision = -np.ones((t, r, num_classes, n_areas))

    for ci in range(num_classes):
        for ai, (aname, arng) in enumerate(AREA_RANGES.items()):
            scores_all, matched_all, ignored_all = [], [], []
            n_gt_total = 0
            for pred, gt in zip(predictions, groundtruths):
                p_sel = pred['labels'] == ci
                g_sel = gt['labels'] == ci
                g_ignore = np.asarray(
                    gt.get('ignore', np.zeros(len(gt['labels']), bool))
                )[g_sel]
                m, ig, n_gt, sc = _match_image(
                    np.asarray(pred['boxes'])[p_sel],
                    np.asarray(pred['scores'])[p_sel],
                    np.asarray(gt['boxes'])[g_sel], g_ignore, arng,
                    max_dets)
                matched_all.append(m)
                ignored_all.append(ig)
                scores_all.append(sc)
                n_gt_total += n_gt
            if n_gt_total == 0:
                continue
            scores = np.concatenate(scores_all)
            order = np.argsort(-scores, kind='stable')
            matched = np.concatenate(matched_all, axis=1)[:, order]
            ignored = np.concatenate(ignored_all, axis=1)[:, order]

            for ti in range(t):
                keep = ~ignored[ti]
                tp = np.cumsum(matched[ti][keep])
                fp = np.cumsum(~matched[ti][keep])
                rec = tp / n_gt_total
                prec = tp / np.maximum(tp + fp, 1e-9)
                # monotone precision envelope
                for i in range(len(prec) - 1, 0, -1):
                    prec[i - 1] = max(prec[i - 1], prec[i])
                inds = np.searchsorted(rec, RECALL_THRS, side='left')
                q = np.zeros(r)
                valid = inds < len(prec)
                q[valid] = prec[inds[valid]]
                precision[ti, :, ci, ai] = q

    def _mean(p):
        p = p[p > -1]
        return float(p.mean()) if p.size else float('nan')

    results = {
        'mAP': _mean(precision[:, :, :, 0]),
        'mAP_50': _mean(precision[0, :, :, 0]),
        'mAP_75': _mean(precision[5, :, :, 0]),
        'mAP_s': _mean(precision[:, :, :, 1]),
        'mAP_m': _mean(precision[:, :, :, 2]),
        'mAP_l': _mean(precision[:, :, :, 3]),
    }
    for ci in range(num_classes):
        results[f'AP_cls{ci}'] = _mean(precision[:, :, ci, 0])
    return results
