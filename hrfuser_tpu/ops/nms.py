"""Static-shape NMS for TPU.

TPU-native replacement for `mmcv.ops.nms` / `batched_nms` (consumed by the
reference at `mmdet/core/post_processing/bbox_nms.py:3` and
`mmdet/models/dense_heads/rpn_head.py`). The CUDA kernel there is a
data-dependent-shape greedy loop; here we reformulate greedy NMS as a
fixed-shape blocked computation that XLA maps onto the VPU/MXU:

  * candidates are sorted by score once (padded slots carry -inf);
  * blocks of `block_size` boxes are processed sequentially; each block is
    first suppressed by all boxes kept in earlier blocks (one [B, N] IoU
    matrix per block), then resolved internally by iterating the monotone
    suppression map to its fixed point (which equals the greedy result);
  * the block loop STOPS as soon as `max_out` survivors exist: candidates
    are score-sorted, so survivors in any later block rank strictly below
    the `max_out` already kept and cannot enter the top-k output — the
    final-detection NMS (max 100 of 2000) usually resolves in one block;
  * output is a fixed `max_out`-sized set: boxes, scores and a validity mask.

Greedy semantics (including score-tie ordering via stable sort) match the
reference kernel exactly; only the schedule is different.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hrfuser_tpu.ops.boxes import bbox_overlaps

Array = jnp.ndarray

NEG_INF = -1e10


def _pad_to_multiple(x: Array, multiple: int, axis: int, value) -> Array:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _block_self_suppress(iou_tri_mask: Array, keep: Array) -> Array:
    """Fixed point of the greedy suppression map inside one block.

    iou_tri_mask: [B, B] bool, True where row i (earlier) suppresses col j
        (strictly upper-triangular overlap > threshold).
    keep: [B] bool, candidate validity entering the block.

    Iterating `keep' = keep0 & ~any_i(kept[i] & sup[i, j])` from all-kept
    converges to exactly the sequential greedy solution.
    """
    keep0 = keep

    def cond(state):
        prev, cur, it = state
        return jnp.logical_and(jnp.any(prev != cur), it < iou_tri_mask.shape[0])

    def body(state):
        _, cur, it = state
        sup = jnp.any(iou_tri_mask & cur[:, None], axis=0)
        nxt = keep0 & ~sup
        return cur, nxt, it + 1

    sup = jnp.any(iou_tri_mask & keep0[:, None], axis=0)
    first = keep0 & ~sup
    _, fixed, _ = jax.lax.while_loop(cond, body, (keep0, first, jnp.int32(0)))
    return fixed


def _suppress_blocks(sboxes: Array, valid: Array, iou_threshold: float,
                     max_out: int, block_size: int,
                     num_blocks: int) -> Array:
    """Blocked greedy suppression over score-sorted, padded boxes.

    Early-exits once `max_out` boxes are kept: every candidate in an
    unprocessed block scores below every kept one, so it can never be
    selected by the caller's final top-`max_out` — leaving its `keep`
    bit untouched is exact.
    """
    np_ = sboxes.shape[0]
    idx = jnp.arange(np_)

    def cond(state):
        i, _, kept = state
        return jnp.logical_and(i < num_blocks, kept < max_out)

    def body(state):
        i, keep, kept = state
        start = i * block_size
        blk = jax.lax.dynamic_slice_in_dim(sboxes, start, block_size, 0)
        blk_keep = jax.lax.dynamic_slice_in_dim(keep, start, block_size, 0)
        # Suppress by earlier kept boxes (all positions before this block).
        iou_prev = bbox_overlaps(blk, sboxes)               # [B, Np]
        prev_mask = keep & (idx < start)
        sup = jnp.any((iou_prev > iou_threshold) & prev_mask[None, :], axis=1)
        blk_keep = blk_keep & ~sup
        # Resolve the block internally (strict upper triangle: i suppresses j>i).
        iou_blk = bbox_overlaps(blk, blk)
        tri = (jnp.arange(block_size)[:, None] < jnp.arange(block_size)[None, :])
        blk_keep = _block_self_suppress((iou_blk > iou_threshold) & tri, blk_keep)
        keep = jax.lax.dynamic_update_slice_in_dim(keep, blk_keep, start, 0)
        return i + 1, keep, kept + jnp.sum(blk_keep)

    _, keep, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), valid,
                                                 jnp.int32(0)))
    return keep


@functools.partial(jax.jit, static_argnames=('iou_threshold', 'max_out',
                                             'block_size'))
def nms(boxes: Array, scores: Array, iou_threshold: float,
        max_out: int, block_size: int = 256
        ) -> Tuple[Array, Array, Array]:
    """Greedy NMS with static output size.

    Args:
        boxes: [N, 4]; padded rows must have scores of -inf (or below any
            real score).
        scores: [N].
        iou_threshold: suppression IoU.
        max_out: static number of survivors returned (padded with zeros).

    Returns:
        (boxes [max_out, 4], scores [max_out], valid [max_out] bool),
        ordered by descending score.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)          # stable: ties keep original index order
    sboxes = boxes[order]
    sscores = scores[order]
    valid = sscores > NEG_INF / 2

    sboxes = _pad_to_multiple(sboxes, block_size, 0, 0.0)
    valid = _pad_to_multiple(valid, block_size, 0, False)
    np_ = sboxes.shape[0]
    num_blocks = np_ // block_size

    keep = _suppress_blocks(sboxes, valid, iou_threshold, max_out,
                            block_size, num_blocks)[:n]
    kept_scores = jnp.where(keep, sscores[:n], NEG_INF)
    kept_boxes = sboxes[:n]
    if n < max_out:
        kept_scores = jnp.pad(kept_scores, (0, max_out - n),
                              constant_values=NEG_INF)
        kept_boxes = jnp.pad(kept_boxes, ((0, max_out - n), (0, 0)))
    top_scores, top_idx = jax.lax.top_k(kept_scores, max_out)
    out_valid = top_scores > NEG_INF / 2
    out_boxes = kept_boxes[top_idx] * out_valid[:, None]
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    return out_boxes, out_scores, out_valid


@functools.partial(jax.jit, static_argnames=('iou_threshold', 'max_out',
                                             'block_size'))
def batched_nms(boxes: Array, scores: Array, idxs: Array,
                iou_threshold: float, max_out: int, block_size: int = 256
                ) -> Tuple[Array, Array, Array, Array]:
    """Class/level-aware NMS via the coordinate-offset trick.

    Matches `mmcv.ops.batched_nms(class_agnostic=False)`: boxes of different
    `idxs` never suppress each other.

    Returns (boxes, scores, idxs, valid), each [max_out, ...].
    """
    max_coord = jnp.max(jnp.where(scores > NEG_INF / 2, jnp.max(boxes, -1), 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]

    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sshift = shifted[order]
    sboxes = boxes[order]
    sscores = scores[order]
    sidxs = idxs[order]
    valid = sscores > NEG_INF / 2

    sshift = _pad_to_multiple(sshift, block_size, 0, 0.0)
    valid_p = _pad_to_multiple(valid, block_size, 0, False)
    num_blocks = sshift.shape[0] // block_size

    keep = _suppress_blocks(sshift, valid_p, iou_threshold, max_out,
                            block_size, num_blocks)[:n]

    kept_scores = jnp.where(keep, sscores, NEG_INF)
    kept_boxes, kept_idxs = sboxes, sidxs
    if n < max_out:
        kept_scores = jnp.pad(kept_scores, (0, max_out - n),
                              constant_values=NEG_INF)
        kept_boxes = jnp.pad(kept_boxes, ((0, max_out - n), (0, 0)))
        kept_idxs = jnp.pad(kept_idxs, (0, max_out - n))
    top_scores, top_idx = jax.lax.top_k(kept_scores, max_out)
    out_valid = top_scores > NEG_INF / 2
    out_boxes = kept_boxes[top_idx] * out_valid[:, None]
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    out_idxs = jnp.where(out_valid, kept_idxs[top_idx], -1)
    return out_boxes, out_scores, out_idxs, out_valid


def multiclass_nms(boxes: Array, scores: Array, score_thr: float,
                   iou_threshold: float, max_per_img: int,
                   pre_nms_cap: Optional[int] = 2000,
                   block_size: int = 256
                   ) -> Tuple[Array, Array, Array, Array]:
    """Multi-class NMS (`mmdet/core/post_processing/bbox_nms.py:8-96`).

    Args:
        boxes: [N, 4] (class-agnostic) or [N, C, 4] per-class boxes.
        scores: [N, C+1] softmax scores, background last (dropped here).
        pre_nms_cap: static cap on candidates entering NMS (score top-k over
            the N*C flattened candidates). The reference keeps every
            candidate above `score_thr`; with max_per_img=100 a 2000 cap is
            lossless in practice and keeps the IoU matrices small.

    Returns:
        (boxes [max_per_img, 4], scores [max_per_img],
         labels [max_per_img] int32 (-1 for padding), valid [max_per_img]).
    """
    num_classes = scores.shape[-1] - 1
    cls_scores = scores[:, :num_classes]                    # drop background
    if boxes.ndim == 2:
        cand_boxes = jnp.broadcast_to(boxes[:, None, :],
                                      (boxes.shape[0], num_classes, 4))
    else:
        cand_boxes = boxes
    cand_boxes = cand_boxes.reshape(-1, 4)
    cand_scores = cls_scores.reshape(-1)
    cand_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32),
                           (scores.shape[0],))

    cand_scores = jnp.where(cand_scores > score_thr, cand_scores, NEG_INF)

    if pre_nms_cap is not None and pre_nms_cap < cand_scores.shape[0]:
        top_scores, top_idx = jax.lax.top_k(cand_scores, pre_nms_cap)
        cand_boxes = cand_boxes[top_idx]
        cand_labels = cand_labels[top_idx]
        cand_scores = top_scores

    return batched_nms(cand_boxes, cand_scores, cand_labels,
                       iou_threshold, max_per_img, block_size)
