"""TEST ORACLE: pycocotools COCOeval bbox protocol, transcribed.

pycocotools is not installable in this environment, so this file
re-states `COCOeval.evaluateImg` + `COCOeval.accumulate` (bbox IoU,
useCats=1) faithfully — including the matching quirks (gts sorted
ignore-last, ties to the later gt, the `gtIg[m]==0 and gtIg[gind]==1`
break, single-use non-crowd gts, out-of-area dts ignored when
unmatched, mergesort score ordering) — as a differential-testing oracle
for `hrfuser_tpu/evaluation/coco_map.py`. Test-only.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    'all': (0.0, 1e10),
    'small': (0.0, 32.0 ** 2),
    'medium': (32.0 ** 2, 96.0 ** 2),
    'large': (96.0 ** 2, 1e10),
}


def _iou_xyxy(dets, gts, iscrowd):
    """COCO `maskUtils.iou` for bbox: crowd gt -> inter / area(dt)."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    ad = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    ag = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = np.where(iscrowd[None, :], ad[:, None],
                     ad[:, None] + ag[None, :] - inter)
    return inter / np.maximum(union, 1e-12)


def evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_ignore, gt_iscrowd,
                 area_rng, max_dets):
    """COCOeval.evaluateImg for one (image, category, area range).

    Returns (dtm [T, D], dtIg [T, D], dt_scores_sorted [D], npig).
    """
    t = len(IOU_THRS)
    g_area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * \
        (gt_boxes[:, 3] - gt_boxes[:, 1]) if len(gt_boxes) else np.zeros(0)
    gt_ig = gt_ignore | (g_area < area_rng[0]) | (g_area > area_rng[1])

    # gts sorted ignore-last (stable), dts by score desc (mergesort)
    gtind = np.argsort(gt_ig, kind='mergesort')
    dtind = np.argsort(-dt_scores, kind='mergesort')[:max_dets]
    gt_boxes = gt_boxes[gtind]
    gt_ig = gt_ig[gtind]
    iscrowd = gt_iscrowd[gtind]
    dt_boxes = dt_boxes[dtind]
    scores = dt_scores[dtind]

    ious = _iou_xyxy(dt_boxes, gt_boxes, iscrowd)
    n_d, n_g = len(dt_boxes), len(gt_boxes)
    gtm = -np.ones((t, n_g), np.int64)
    dtm = -np.ones((t, n_d), np.int64)
    dt_ig = np.zeros((t, n_d), bool)
    for tind, thr in enumerate(IOU_THRS):
        for dind in range(n_d):
            iou = min(thr, 1 - 1e-10)
            m = -1
            for gind in range(n_g):
                if gtm[tind, gind] >= 0 and not iscrowd[gind]:
                    continue
                if m > -1 and (not gt_ig[m]) and gt_ig[gind]:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    d_area = (dt_boxes[:, 2] - dt_boxes[:, 0]) * \
        (dt_boxes[:, 3] - dt_boxes[:, 1]) if n_d else np.zeros(0)
    a = (d_area < area_rng[0]) | (d_area > area_rng[1])
    dt_ig = dt_ig | ((dtm == -1) & a[None, :])
    npig = int((~gt_ig).sum())
    return dtm >= 0, dt_ig, scores, npig


def coco_map_oracle(predictions, groundtruths, num_classes,
                    max_dets=100):
    """COCOeval.accumulate over paired per-image dicts; same interface
    as `evaluate_coco_map`."""
    t, r = len(IOU_THRS), len(RECALL_THRS)
    area_names = list(AREA_RANGES)
    precision = -np.ones((t, r, num_classes, len(area_names)))

    for ci in range(num_classes):
        for ai, aname in enumerate(area_names):
            rng = AREA_RANGES[aname]
            ms, igs, scs, npig = [], [], [], 0
            for pred, gt in zip(predictions, groundtruths):
                p_sel = np.asarray(pred['labels']) == ci
                g_sel = np.asarray(gt['labels']) == ci
                g_ignore = np.asarray(
                    gt.get('ignore', np.zeros(len(gt['labels']), bool))
                )[g_sel].astype(bool)
                g_crowd = np.asarray(
                    gt.get('iscrowd', np.zeros(len(gt['labels']), bool))
                )[g_sel].astype(bool)
                m, ig, sc, n = evaluate_img(
                    np.asarray(pred['boxes'], np.float64)[p_sel],
                    np.asarray(pred['scores'], np.float64)[p_sel],
                    np.asarray(gt['boxes'], np.float64)[g_sel],
                    g_ignore, g_crowd, rng, max_dets)
                ms.append(m)
                igs.append(ig)
                scs.append(sc)
                npig += n
            if npig == 0:
                continue
            scores = np.concatenate(scs)
            order = np.argsort(-scores, kind='mergesort')
            m = np.concatenate(ms, axis=1)[:, order]
            ig = np.concatenate(igs, axis=1)[:, order]
            tps = m & ~ig
            fps = ~m & ~ig
            for ti in range(t):
                tp = np.cumsum(tps[ti]).astype(np.float64)
                fp = np.cumsum(fps[ti]).astype(np.float64)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                pr = pr.tolist()
                for i in range(len(tp) - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                q = np.zeros(r)
                inds = np.searchsorted(rc, RECALL_THRS, side='left')
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
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
