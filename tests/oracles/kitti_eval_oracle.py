"""TEST ORACLE: reference KITTI 2D AP algorithm, numba-stripped.

This file deliberately transcribes the *algorithm* of the reference
evaluator (`/root/reference/mmdet/core/evaluation/kitti_utils/eval.py`,
itself derived from the public KITTI devkit / OpenMMLab code) so the
production implementation (`hrfuser_tpu/evaluation/kitti_eval.py`) can be
differentially fuzzed against it. It is test-only, 2D-bbox-metric-only
(metric==0), and keeps the reference's exact control flow — including
its quirks (NO_DETECTION sentinel, score-threshold handling, DontCare
absorption order) — because matching those quirks is the whole point of
an oracle. Do not use outside tests; the production evaluator is the
supported API.
"""

from __future__ import annotations

import numpy as np

CLASS_NAMES = ['car', 'pedestrian', 'cyclist']
N_SAMPLE_PTS = 41


def get_thresholds(scores: np.ndarray, num_gt, num_sample_pts=41):
    # reference `get_thresholds` (eval.py:8-27)
    scores = np.sort(scores)[::-1]
    current_recall = 0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        if i < (len(scores) - 1):
            r_recall = (i + 2) / num_gt
        else:
            r_recall = l_recall
        if (((r_recall - current_recall) < (current_recall - l_recall))
                and (i < (len(scores) - 1))):
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return thresholds


def clean_data(gt_anno, dt_anno, current_class, difficulty):
    # reference `clean_data` (eval.py:29-83)
    MIN_HEIGHT = [40, 25, 25]
    MAX_OCCLUSION = [0, 1, 2]
    MAX_TRUNCATION = [0.15, 0.3, 0.5]
    dc_bboxes, ignored_gt, ignored_dt = [], [], []
    current_cls_name = CLASS_NAMES[current_class].lower()
    num_gt = len(gt_anno['name'])
    num_dt = len(dt_anno['name'])
    num_valid_gt = 0
    for i in range(num_gt):
        bbox = gt_anno['bbox'][i]
        gt_name = gt_anno['name'][i].lower()
        height = bbox[3] - bbox[1]
        if gt_name == current_cls_name:
            valid_class = 1
        elif current_cls_name == 'pedestrian' and gt_name == 'person_sitting':
            valid_class = 0
        elif current_cls_name == 'car' and gt_name == 'van':
            valid_class = 0
        else:
            valid_class = -1
        ignore = bool(
            (gt_anno['occluded'][i] > MAX_OCCLUSION[difficulty])
            or (gt_anno['truncated'][i] > MAX_TRUNCATION[difficulty])
            or (height <= MIN_HEIGHT[difficulty])
            or (gt_anno['occluded'][i] == -1))
        if valid_class == 1 and not ignore:
            ignored_gt.append(0)
            num_valid_gt += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt.append(1)
        else:
            ignored_gt.append(-1)
        if gt_anno['name'][i] == 'DontCare':
            dc_bboxes.append(gt_anno['bbox'][i])
    for i in range(num_dt):
        valid_class = 1 if dt_anno['name'][i].lower() == current_cls_name \
            else -1
        height = abs(dt_anno['bbox'][i, 3] - dt_anno['bbox'][i, 1])
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt.append(1)
        elif valid_class == 1:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return num_valid_gt, ignored_gt, ignored_dt, dc_bboxes


def image_box_overlap(boxes, query_boxes, criterion=-1):
    # reference `image_box_overlap` (eval.py:86-117), loop semantics kept
    N, K = boxes.shape[0], query_boxes.shape[0]
    overlaps = np.zeros((N, K), dtype=boxes.dtype)
    for k in range(K):
        qbox_area = ((query_boxes[k, 2] - query_boxes[k, 0]) *
                     (query_boxes[k, 3] - query_boxes[k, 1]))
        for n in range(N):
            iw = (min(boxes[n, 2], query_boxes[k, 2]) -
                  max(boxes[n, 0], query_boxes[k, 0]))
            if iw > 0:
                ih = (min(boxes[n, 3], query_boxes[k, 3]) -
                      max(boxes[n, 1], query_boxes[k, 1]))
                if ih > 0:
                    if criterion == -1:
                        ua = ((boxes[n, 2] - boxes[n, 0]) *
                              (boxes[n, 3] - boxes[n, 1]) + qbox_area -
                              iw * ih)
                    elif criterion == 0:
                        ua = ((boxes[n, 2] - boxes[n, 0]) *
                              (boxes[n, 3] - boxes[n, 1]))
                    else:
                        ua = 1.0
                    overlaps[n, k] = iw * ih / ua
    return overlaps


def compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt,
                       ignored_det, dc_bboxes, min_overlap, thresh=0,
                       compute_fp=False):
    # reference `compute_statistics_jit` (eval.py:163-282), metric==0,
    # compute_aos stripped
    det_size = dt_datas.shape[0]
    gt_size = gt_datas.shape[0]
    dt_scores = dt_datas[:, -1]
    dt_bboxes = dt_datas[:, :4]

    assigned_detection = [False] * det_size
    ignored_threshold = [False] * det_size
    if compute_fp:
        for i in range(det_size):
            if dt_scores[i] < thresh:
                ignored_threshold[i] = True
    NO_DETECTION = -10000000
    tp, fp, fn = 0, 0, 0
    thresholds = np.zeros((gt_size,))
    thresh_idx = 0
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DETECTION
        max_overlap = 0
        assigned_ignored_det = False
        for j in range(det_size):
            if ignored_det[j] == -1 or assigned_detection[j] \
                    or ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            dt_score = dt_scores[j]
            if (not compute_fp and (overlap > min_overlap)
                    and dt_score > valid_detection):
                det_idx = j
                valid_detection = dt_score
            elif (compute_fp and (overlap > min_overlap)
                  and (overlap > max_overlap or assigned_ignored_det)
                  and ignored_det[j] == 0):
                max_overlap = overlap
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = False
            elif (compute_fp and (overlap > min_overlap)
                  and (valid_detection == NO_DETECTION)
                  and ignored_det[j] == 1):
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = True
        if (valid_detection == NO_DETECTION) and ignored_gt[i] == 0:
            fn += 1
        elif ((valid_detection != NO_DETECTION)
              and (ignored_gt[i] == 1 or ignored_det[det_idx] == 1)):
            assigned_detection[det_idx] = True
        elif valid_detection != NO_DETECTION:
            tp += 1
            thresholds[thresh_idx] = dt_scores[det_idx]
            thresh_idx += 1
            assigned_detection[det_idx] = True
    if compute_fp:
        for i in range(det_size):
            if not (assigned_detection[i] or ignored_det[i] == -1
                    or ignored_det[i] == 1 or ignored_threshold[i]):
                fp += 1
        nstuff = 0
        overlaps_dt_dc = image_box_overlap(dt_bboxes, dc_bboxes, 0)
        for i in range(dc_bboxes.shape[0]):
            for j in range(det_size):
                if assigned_detection[j]:
                    continue
                if ignored_det[j] == -1 or ignored_det[j] == 1:
                    continue
                if ignored_threshold[j]:
                    continue
                if overlaps_dt_dc[j, i] > min_overlap:
                    assigned_detection[j] = True
                    nstuff += 1
        fp -= nstuff
    return tp, fp, fn, thresholds[:thresh_idx]


def eval_class_2d(gt_annos, dt_annos, current_class, difficulty,
                  min_overlap):
    """Reference `eval_class` (eval.py:446-566) restricted to one
    (class, difficulty, min_overlap) triple, metric==0, no parts split.

    Returns the 41-point max-interpolated precision array.
    """
    overlaps = [
        image_box_overlap(
            np.asarray(dt['bbox'], np.float64).reshape(-1, 4),
            np.asarray(gt['bbox'], np.float64).reshape(-1, 4))
        for gt, dt in zip(gt_annos, dt_annos)]

    gt_datas_list, dt_datas_list = [], []
    ignored_gts, ignored_dets, dontcares = [], [], []
    total_num_valid_gt = 0
    for i in range(len(gt_annos)):
        num_valid_gt, ignored_gt, ignored_det, dc_bboxes = clean_data(
            gt_annos[i], dt_annos[i], current_class, difficulty)
        ignored_gts.append(np.array(ignored_gt, dtype=np.int64))
        ignored_dets.append(np.array(ignored_det, dtype=np.int64))
        dc = np.zeros((0, 4)) if len(dc_bboxes) == 0 \
            else np.stack(dc_bboxes, 0).astype(np.float64)
        dontcares.append(dc)
        total_num_valid_gt += num_valid_gt
        gt_datas_list.append(np.asarray(gt_annos[i]['bbox'],
                                        np.float64).reshape(-1, 4))
        dt_datas_list.append(np.concatenate([
            np.asarray(dt_annos[i]['bbox'], np.float64).reshape(-1, 4),
            np.asarray(dt_annos[i]['score'],
                       np.float64).reshape(-1, 1)], 1))

    thresholdss = []
    for i in range(len(gt_annos)):
        _, _, _, th = compute_statistics(
            overlaps[i], gt_datas_list[i], dt_datas_list[i],
            ignored_gts[i], ignored_dets[i], dontcares[i],
            min_overlap=min_overlap, thresh=0.0, compute_fp=False)
        thresholdss += th.tolist()
    thresholds = np.array(get_thresholds(np.array(thresholdss),
                                         total_num_valid_gt))

    pr = np.zeros([len(thresholds), 3])
    for t, thresh in enumerate(thresholds):
        for i in range(len(gt_annos)):
            tp, fp, fn, _ = compute_statistics(
                overlaps[i], gt_datas_list[i], dt_datas_list[i],
                ignored_gts[i], ignored_dets[i], dontcares[i],
                min_overlap=min_overlap, thresh=thresh, compute_fp=True)
            pr[t, 0] += tp
            pr[t, 1] += fp
            pr[t, 2] += fn

    precision = np.zeros(N_SAMPLE_PTS)
    for i in range(len(thresholds)):
        precision[i] = pr[i, 0] / (pr[i, 0] + pr[i, 1])
    for i in range(len(thresholds)):
        precision[i] = np.max(precision[i:], axis=-1)
    return precision, total_num_valid_gt


def get_mAP(prec):
    # reference `get_mAP` (eval.py:573-577)
    sums = 0
    for i in range(0, prec.shape[-1], 4):
        sums = sums + prec[..., i]
    return sums / 11 * 100


def kitti_eval_2d_oracle(gt_annos, dt_annos, classes,
                         min_overlaps=None):
    """AP table in the same format as
    `hrfuser_tpu.evaluation.kitti_eval.kitti_eval_2d`."""
    default = {'car': 0.7, 'pedestrian': 0.5, 'cyclist': 0.5}
    min_overlaps = min_overlaps or default
    results = {}
    mods = []
    for cls in classes:
        ci = CLASS_NAMES.index(cls.lower())
        min_ov = min_overlaps.get(cls.lower(), 0.5)
        for difficulty, dname in enumerate(('easy', 'moderate', 'hard')):
            prec, n_valid = eval_class_2d(gt_annos, dt_annos, ci,
                                          difficulty, min_ov)
            ap = float(get_mAP(prec)) if n_valid > 0 else 0.0
            results[f'{cls}_2d_{dname}'] = ap
            if dname == 'moderate':
                mods.append(ap)
    results['mAP_2d_moderate'] = float(np.mean(mods)) if mods else 0.0
    return results
