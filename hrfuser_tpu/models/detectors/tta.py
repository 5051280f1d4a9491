"""Test-time augmentation (horizontal flip).

The reference ships `MultiScaleFlipAug` + `aug_test`
(`pipelines/test_time_aug.py`, `two_stage.py:230-243`), though every
shipped config runs it with `flip=False` (single pass). Two flip-TTA
fusers are provided:

  * `predict_tta_flip` — detection-level: run the detector on the
    original and mirrored inputs, mirror the second set of boxes back,
    fuse with class-aware NMS. Simple and robust.
  * `predict_aug_test_flip` — reference-parity proposal-level merging
    (`merge_aug_proposals` in `mmdet/core/post_processing/merge_augs.py`
    + `CascadeRoIHead.aug_test`/`merge_aug_bboxes`): per-aug RPN
    proposals are mapped back to the original frame, concatenated and
    NMS-merged; the SAME merged proposal set is then cascade-decoded in
    each aug's frame, the decoded boxes/scores are mapped back and
    AVERAGED over augs, and a final multiclass NMS runs once.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from hrfuser_tpu.models.detectors.cascade_rcnn import Detections, predict
from hrfuser_tpu.ops.nms import NEG_INF, batched_nms, multiclass_nms, nms

Array = jnp.ndarray


def _flip_boxes(boxes: Array, width: Array) -> Array:
    """Mirror [..., 4] boxes about an image of `width` px (bbox_flip)."""
    return jnp.stack([width - boxes[..., 2], boxes[..., 1],
                      width - boxes[..., 0], boxes[..., 3]], axis=-1)


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


def predict_aug_test_flip(detector, variables, img: Array,
                          mod_imgs: Optional[List[Array]] = None,
                          img_shapes: Optional[Array] = None,
                          scale_factors: Optional[Array] = None
                          ) -> Detections:
    """Reference-parity flip TTA: proposal-level merge + averaged decode.

    Mirrors `TwoStageDetector.aug_test` (`two_stage.py:230-243`) with the
    cascade head's `aug_test` semantics: merged RPN proposals (concat +
    NMS at the RPN iou), per-aug cascade decode on the SAME proposals,
    aug-mean of mapped-back boxes/scores, one final multiclass NMS.

    Note: the flip happens on the padded tensor, so box mapping is exact
    when the content width equals the padded width — true for every
    shipped config (640 and 1248 are multiples of 32).
    """
    cfg = detector.cfg
    rcfg = cfg.rpn_test
    b, h, w, _ = img.shape
    if img_shapes is None:
        img_shapes = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))
    if scale_factors is None:
        scale_factors = jnp.ones((b, 4), jnp.float32)

    f_img = img[:, :, ::-1, :]
    f_mods = ([m[:, :, ::-1, :] for m in mod_imgs]
              if mod_imgs is not None else None)

    feats1, cls1, preds1 = detector.apply(
        variables, img, mod_imgs, False, method='forward_features')
    feats2, cls2, preds2 = detector.apply(
        variables, f_img, f_mods, False, method='forward_features')

    gen = cfg.anchor_generator()
    featmap_sizes = [tuple(f.shape[1:3]) for f in feats1]
    anchors = [jnp.asarray(a) for a in gen.grid_anchors(featmap_sizes)]

    from hrfuser_tpu.models.dense_heads.rpn_head import get_proposals_single

    def per_image(f1_i, c1_i, p1_i, f2_i, c2_i, p2_i, shape_i, sf_i):
        shape = (shape_i[0], shape_i[1])
        width = shape_i[1]

        def props(c_i, p_i):
            return get_proposals_single(
                c_i, p_i, anchors, shape, nms_pre=rcfg.nms_pre,
                max_per_img=rcfg.max_per_img, nms_iou=rcfg.nms_iou,
                min_bbox_size=rcfg.min_bbox_size)

        pr1 = props(c1_i, p1_i)
        pr2 = props(c2_i, p2_i)
        # merge_aug_proposals: map aug proposals back, concat, NMS, top-k
        back2 = _flip_boxes(pr2.boxes, width)
        all_boxes = jnp.concatenate([pr1.boxes, back2], axis=0)
        all_scores = jnp.concatenate([
            jnp.where(pr1.valid, pr1.scores, NEG_INF),
            jnp.where(pr2.valid, pr2.scores, NEG_INF)], axis=0)
        mboxes, mscores, mvalid = nms(all_boxes, all_scores, rcfg.nms_iou,
                                      rcfg.max_per_img)

        # per-aug cascade decode on the SAME merged proposals
        boxes1, scores1 = detector.apply(
            variables, f1_i[:4], mboxes, mvalid, shape,
            method='roi_decode')
        aug2_props = jnp.where(mvalid[:, None],
                               _flip_boxes(mboxes, width), 0.0)
        boxes2, scores2 = detector.apply(
            variables, f2_i[:4], aug2_props, mvalid, shape,
            method='roi_decode')
        boxes2 = _flip_boxes(boxes2, width)

        # merge_aug_bboxes: aug-mean, rescale, final multiclass NMS
        boxes = (boxes1 + boxes2) * 0.5
        scores = (scores1 + scores2) * 0.5
        boxes = boxes / jnp.asarray(sf_i, boxes.dtype)
        ob, os_, ol, ov = multiclass_nms(boxes, scores, cfg.roi.score_thr,
                                         cfg.roi.nms_iou,
                                         cfg.roi.max_per_img)
        return Detections(ob, os_, ol, ov)

    return jax.vmap(per_image)([f for f in feats1], cls1, preds1,
                               [f for f in feats2], cls2, preds2,
                               img_shapes, scale_factors)
