"""Box math: IoU, delta coding, transforms.

Pure-jnp, statically shaped equivalents of the reference detection math
(`mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:118-260`,
`mmdet/core/bbox/iou_calculators/iou2d_calculator.py`,
`mmdet/core/bbox/transforms.py`). Boxes are `[x1, y1, x2, y2]` in pixel
coordinates, float32. "Empty" slots in padded box arrays are represented as
all-zero boxes paired with -inf / masked scores; every function here is
total (no data-dependent shapes) so it can live under `jit`.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def bbox_overlaps(boxes1: Array, boxes2: Array, mode: str = 'iou',
                  eps: float = 1e-6) -> Array:
    """Pairwise IoU / IoF between two sets of boxes.

    Args:
        boxes1: [..., N, 4].
        boxes2: [..., M, 4].
        mode: 'iou' (intersection over union) or 'iof' (over boxes1 area).

    Returns:
        [..., N, M] overlap matrix.
    """
    assert mode in ('iou', 'iof')
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]

    if mode == 'iou':
        union = area1[..., :, None] + area2[..., None, :] - inter
    else:
        union = jnp.broadcast_to(area1[..., :, None], inter.shape)
    union = jnp.maximum(union, eps)
    return inter / union


def bbox2delta(proposals: Array, gt: Array,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.)) -> Array:
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. proposals.

    Matches `bbox2delta` (`delta_xywh_bbox_coder.py:118-163`): centers and
    sizes without the legacy +1.
    """
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    # Guard padded (zero-size) proposals; callers mask invalid rows.
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, 1e-6) / pw)
    dh = jnp.log(jnp.maximum(gh, 1e-6) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois: Array, deltas: Array,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.),
               max_shape: Optional[Tuple[int, int]] = None,
               wh_ratio_clip: float = 16 / 1000) -> Array:
    """Decode (dx, dy, dw, dh) deltas on top of rois.

    Matches `delta2bbox` (`delta_xywh_bbox_coder.py:164-260`): denormalize,
    clamp dw/dh to ±|log(wh_ratio_clip)|, shift centers, exp sizes, convert
    to corners, optionally clip to `max_shape` (H, W).

    Args:
        rois: [..., 4].
        deltas: [..., 4] (class-agnostic; callers reshape per-class first).
        max_shape: (H, W) clip bounds, static python ints, or None.
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    denorm = deltas * stds + means

    dxy = denorm[..., :2]
    dwh = denorm[..., 2:]

    pxy = (rois[..., :2] + rois[..., 2:]) * 0.5
    pwh = rois[..., 2:] - rois[..., :2]

    max_ratio = abs(math.log(wh_ratio_clip))
    dwh = jnp.clip(dwh, -max_ratio, max_ratio)

    gxy = pxy + pwh * dxy
    gwh = pwh * jnp.exp(dwh)
    x1y1 = gxy - gwh * 0.5
    x2y2 = gxy + gwh * 0.5
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    if max_shape is not None:
        boxes = clip_boxes(boxes, (max_shape[0], max_shape[1]))
    return boxes


def bbox_flip(boxes: Array, img_shape: Tuple[int, int],
              direction: str = 'horizontal') -> Array:
    """Flip boxes inside an image (`transforms.py` bbox_flip semantics)."""
    h, w = img_shape
    if direction == 'horizontal':
        flipped = jnp.stack([
            w - boxes[..., 2], boxes[..., 1],
            w - boxes[..., 0], boxes[..., 3]], axis=-1)
    elif direction == 'vertical':
        flipped = jnp.stack([
            boxes[..., 0], h - boxes[..., 3],
            boxes[..., 2], h - boxes[..., 1]], axis=-1)
    else:
        raise ValueError(direction)
    return flipped


def bbox_area(boxes: Array) -> Array:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_center_size(boxes: Array) -> Tuple[Array, Array]:
    ctr = (boxes[..., :2] + boxes[..., 2:]) * 0.5
    size = boxes[..., 2:] - boxes[..., :2]
    return ctr, size


def clip_boxes(boxes: Array, img_shape: Tuple[int, int]) -> Array:
    h, w = img_shape
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w),
        jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w),
        jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)


def scale_boxes(boxes: Array, scale_factor) -> Array:
    """Multiply box coordinates by [sx, sy, sx, sy] (rescale to orig image)."""
    sf = jnp.asarray(scale_factor, boxes.dtype)
    return boxes * sf
