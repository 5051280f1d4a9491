"""Max-IoU assigner, statically shaped.

Rebuild of `MaxIoUAssigner` (`mmdet/core/bbox/assigners/
max_iou_assigner.py:11-213`) as pure matrix math over padded gt/box sets.

Assignment encoding matches the reference: -1 = ignore, 0 = negative,
k > 0 = assigned to gt k-1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hrfuser_tpu.ops.boxes import bbox_overlaps

Array = jnp.ndarray


class AssignResult(NamedTuple):
    gt_inds: Array        # [N] int32 (-1 ignore / 0 neg / k>0 -> gt k-1)
    max_overlaps: Array   # [N]
    labels: Array         # [N] int32 assigned gt label, -1 if none


def max_iou_assign(gt_boxes: Array, gt_labels: Array, gt_valid: Array,
                   boxes: Array, box_valid: Array,
                   pos_iou_thr: float, neg_iou_thr: float,
                   min_pos_iou: float,
                   match_low_quality: bool) -> AssignResult:
    """Assign each box to a gt / negative / ignore.

    Args:
        gt_boxes: [G, 4] padded gts; gt_valid [G] bool.
        boxes: [N, 4] padded anchors/proposals; box_valid [N] bool.

    Semantics (`max_iou_assigner.py:128-213`):
      1. box is negative if its best overlap is in [0, neg_iou_thr)
      2. box is positive to its argmax gt if best overlap >= pos_iou_thr
      3. (match_low_quality) each gt claims the boxes achieving its own
         row-max overlap, if that max >= min_pos_iou — applied in gt order
         so later gts override earlier ones.
    """
    ious = bbox_overlaps(gt_boxes, boxes)                # [G, N]
    ious = jnp.where(gt_valid[:, None] & box_valid[None, :], ious, -1.0)

    raw_max = jnp.max(ious, axis=0)                      # [N] (-1: no gt)
    argmax_gt = jnp.argmax(ious, axis=0)                 # [N]
    # A valid box's true best overlap is >= 0 even when every gt slot is
    # padding (the reference's num_gts == 0 branch marks ALL boxes
    # negative, `max_iou_assigner.py:128-140`); the -1 mask above only
    # keeps argmax off padded gts.
    max_ov = jnp.maximum(raw_max, 0.0)

    gt_inds = jnp.full(boxes.shape[0], -1, jnp.int32)
    gt_inds = jnp.where(max_ov < neg_iou_thr, 0, gt_inds)
    gt_inds = jnp.where((raw_max >= pos_iou_thr) & (raw_max >= 0),
                        argmax_gt.astype(jnp.int32) + 1, gt_inds)

    if match_low_quality:
        # gt row maxima; a gt with max >= min_pos_iou claims ALL boxes whose
        # overlap equals that max (gt_max_assign_all=True default). Later
        # gts override earlier ones, matching the sequential reference loop.
        gt_max = jnp.max(ious, axis=1)                   # [G]
        claim = (ious == gt_max[:, None]) & \
            (gt_max[:, None] >= min_pos_iou) & gt_valid[:, None]
        # highest gt index claiming each box (reference loop order)
        g = claim.shape[0]
        gt_ids = jnp.arange(1, g + 1, dtype=jnp.int32)[:, None]
        claimed_by = jnp.max(jnp.where(claim, gt_ids, 0), axis=0)  # [N]
        gt_inds = jnp.where(claimed_by > 0, claimed_by, gt_inds)

    gt_inds = jnp.where(box_valid, gt_inds, -1)
    safe = jnp.clip(gt_inds - 1, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(gt_inds > 0, gt_labels[safe].astype(jnp.int32), -1)
    return AssignResult(gt_inds, max_ov, labels)
