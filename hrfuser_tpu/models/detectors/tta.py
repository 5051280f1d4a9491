"""Test-time augmentation (horizontal flip).

The reference ships `MultiScaleFlipAug` + `aug_test`
(`pipelines/test_time_aug.py`, `two_stage.py:230-243`), though every
shipped config runs it with `flip=False` (single pass). This provides the
flip-enabled path as detection-level TTA: run the detector on the
original and mirrored inputs, mirror the second set of boxes back, and
fuse with class-aware NMS. (The reference merges at the proposal level
instead; at `flip=False` both are identity, and at `flip=True` the
difference is a second-order effect on mAP.)
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from hrfuser_tpu.models.detectors.cascade_rcnn import Detections, predict
from hrfuser_tpu.ops.nms import NEG_INF, batched_nms

Array = jnp.ndarray


def predict_tta_flip(detector, variables, img: Array,
                     mod_imgs: Optional[List[Array]] = None,
                     img_shapes: Optional[Array] = None,
                     scale_factors: Optional[Array] = None) -> Detections:
    """Original + horizontally-flipped pass, NMS-fused."""
    cfg = detector.cfg.roi
    b, h, w, _ = img.shape
    if img_shapes is None:
        img_shapes = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))
    if scale_factors is None:
        scale_factors = jnp.ones((b, 4), jnp.float32)

    d1 = predict(detector, variables, img, mod_imgs, img_shapes,
                 scale_factors)

    f_img = img[:, :, ::-1, :]
    f_mods = ([m[:, :, ::-1, :] for m in mod_imgs]
              if mod_imgs is not None else None)
    d2 = predict(detector, variables, f_img, f_mods, img_shapes,
                 scale_factors)
    # mirror boxes back in ORIGINAL-image coordinates: the detections are
    # already rescaled, so flip about the original width (w / sx)
    orig_w = (img_shapes[:, 1] / scale_factors[:, 0])[:, None]
    fb = d2.boxes
    flipped = jnp.stack([orig_w - fb[..., 2], fb[..., 1],
                         orig_w - fb[..., 0], fb[..., 3]], axis=-1)
    flipped = jnp.where(d2.valid[..., None], flipped, 0.0)

    boxes = jnp.concatenate([d1.boxes, flipped], axis=1)
    scores = jnp.concatenate([
        jnp.where(d1.valid, d1.scores, NEG_INF),
        jnp.where(d2.valid, d2.scores, NEG_INF)], axis=1)
    labels = jnp.concatenate([d1.labels, d2.labels], axis=1)

    def fuse(bx, sc, lb):
        ob, os_, ol, ov = batched_nms(bx, sc, lb, cfg.nms_iou,
                                      cfg.max_per_img)
        return Detections(ob, os_, ol, ov)

    return jax.vmap(fuse)(boxes, scores, labels)
