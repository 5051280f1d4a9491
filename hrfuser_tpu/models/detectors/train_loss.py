"""Training forward: RPN + 3-stage cascade losses, fully in-jit.

Rebuild of `TwoStageDetector.forward_train`
(`mmdet/models/detectors/two_stage.py:107-186`) +
`CascadeRoIHead.forward_train` (`cascade_roi_head.py:191-286`) +
`AnchorHead.loss` (`anchor_head.py:453-542`): per-iteration target
assignment, sampling and losses, expressed over fixed-size arrays so the
whole step compiles once.

Stage refinement uses stopped-gradient decoded rois, gt-sourced rois are
dropped before the next stage (`refine_bboxes` / `pos_is_gts`), and the
loss dict mirrors the reference component names (`loss_rpn_cls`,
`s0.loss_cls`, ...).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from hrfuser_tpu.core.losses import accuracy, sigmoid_bce, smooth_l1, softmax_ce
from hrfuser_tpu.core.targets import (RCNN_TRAIN_CFGS, RPN_TRAIN_CFG,
                                      rcnn_stage_targets_single,
                                      rpn_targets_single)
from hrfuser_tpu.models.dense_heads.rpn_head import get_proposals_single
from hrfuser_tpu.ops.boxes import delta2bbox

Array = jnp.ndarray

# RPN proposal cfg during training (`train_cfg.rpn_proposal`).
RPN_PROPOSAL_TRAIN = dict(nms_pre=2000, max_per_img=2000, nms_iou=0.7,
                          min_bbox_size=0.0)


def forward_train(detector, variables, batch: Dict[str, Array],
                  rng: Array, rpn_proposal_cfg: Optional[dict] = None,
                  rcnn_train_cfgs: Optional[Tuple] = None
                  ) -> Tuple[Array, Dict[str, Array], dict]:
    """Compute the total loss for one batch.

    Args:
        detector: `CascadeRCNN` module.
        variables: {'params', 'batch_stats'}.
        batch: img [B,H,W,3]; mod_imgs list; gt_boxes [B,G,4];
            gt_labels [B,G]; gt_valid [B,G]; img_shapes [B,2].
        rng: PRNG key for dropout/droppath/sampling.

    Returns:
        (total_loss, metrics dict, updated batch_stats collection)
    """
    cfg = detector.cfg
    prop_cfg = rpn_proposal_cfg or RPN_PROPOSAL_TRAIN
    rng_drop, rng_rpn, *rng_stages = jax.random.split(rng, 2 + 3)

    img = batch['img']
    mod_imgs = batch.get('mod_imgs')
    b = img.shape[0]
    img_shapes = batch.get('img_shapes')
    if img_shapes is None:
        img_shapes = jnp.tile(
            jnp.asarray([[img.shape[1], img.shape[2]]], jnp.float32), (b, 1))

    (feats, rpn_cls, rpn_reg), updated = detector.apply(
        variables, img, mod_imgs, True, method='forward_features',
        mutable=['batch_stats'], rngs={'dropout': rng_drop})

    # ---- RPN targets & losses over concatenated levels ----
    gen = cfg.anchor_generator()
    featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
    pad_shape = (img.shape[1], img.shape[2])
    anchors_np = gen.grid_anchors(featmap_sizes)
    flags_np = gen.valid_flags(featmap_sizes, pad_shape)
    anchors = jnp.concatenate([jnp.asarray(a) for a in anchors_np])
    flags = jnp.concatenate([jnp.asarray(f) for f in flags_np])

    cls_flat = jnp.concatenate(
        [c.reshape(b, -1) for c in rpn_cls], axis=1).astype(jnp.float32)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in rpn_reg], axis=1).astype(jnp.float32)

    rpn_rngs = jax.random.split(rng_rpn, b)
    rpn_t = jax.vmap(
        lambda r, gtb, gtv, shp: rpn_targets_single(
            r, anchors, flags, gtb, gtv, (shp[0], shp[1])))(
        rpn_rngs, batch['gt_boxes'], batch['gt_valid'], img_shapes)

    rpn_avg = jnp.sum(rpn_t.num_samples)
    losses = {
        'loss_rpn_cls': sigmoid_bce(cls_flat, rpn_t.cls_targets,
                                    rpn_t.cls_weights, rpn_avg),
        'loss_rpn_bbox': smooth_l1(reg_flat, rpn_t.bbox_targets,
                                   rpn_t.bbox_weights, rpn_avg,
                                   beta=1.0 / 9.0),
    }

    # ---- RPN train proposals (no gradient into the cascade) ----
    anchors_lvls = [jnp.asarray(a) for a in anchors_np]

    def per_image_props(scores_i, preds_i, shape_i):
        return get_proposals_single(
            [jax.lax.stop_gradient(s) for s in scores_i],
            [jax.lax.stop_gradient(p) for p in preds_i],
            anchors_lvls, (shape_i[0], shape_i[1]), **prop_cfg)

    props = jax.vmap(per_image_props)(rpn_cls, rpn_reg, img_shapes)
    proposals, prop_valid = props.boxes, props.valid

    # ---- cascade stages ----
    stage_weights = cfg.roi.stage_loss_weights
    stage_cfgs = rcnn_train_cfgs or RCNN_TRAIN_CFGS
    for i, s_cfg in enumerate(stage_cfgs[:cfg.roi.num_stages]):
        stage_rngs = jax.random.split(rng_stages[i], b)
        tgt = jax.vmap(
            lambda r, p, pv, gtb, gtl, gtv: rcnn_stage_targets_single(
                r, p, pv, gtb, gtl, gtv, cfg.roi.num_classes,
                cfg.roi.stage_stds[i], s_cfg))(
            stage_rngs, proposals, prop_valid, batch['gt_boxes'],
            batch['gt_labels'], batch['gt_valid'])

        def roi_fwd(feats_i, rois_i):
            return detector.apply(variables, i, feats_i[:4], rois_i,
                                  method='roi_forward')

        logits, deltas = jax.vmap(roi_fwd)(feats, tgt.rois)

        n = b * s_cfg.num
        flat_logits = logits.reshape(n, -1)
        flat_labels = tgt.labels.reshape(n)
        flat_lw = tgt.label_weights.reshape(n)
        cls_avg = jnp.maximum(jnp.sum(flat_lw > 0), 1.0)
        bbox_avg = jnp.sum(tgt.valid)
        w = stage_weights[i]
        losses[f's{i}.loss_cls'] = w * softmax_ce(
            flat_logits, flat_labels, flat_lw, cls_avg)
        losses[f's{i}.loss_bbox'] = w * smooth_l1(
            deltas.reshape(n, 4), tgt.bbox_targets.reshape(n, 4),
            tgt.bbox_weights.reshape(n, 4), bbox_avg, beta=1.0)
        losses[f's{i}.acc'] = accuracy(flat_logits, flat_labels, flat_lw)

        if i < cfg.roi.num_stages - 1:
            ref_deltas = jax.lax.stop_gradient(deltas)

            def refine(rois_i, deltas_i, shape_i):
                return delta2bbox(rois_i, deltas_i,
                                  stds=cfg.roi.stage_stds[i],
                                  max_shape=(shape_i[0], shape_i[1]))

            proposals = jax.vmap(refine)(tgt.rois, ref_deltas, img_shapes)
            prop_valid = tgt.valid & ~tgt.is_gt

    total = sum(v for k, v in losses.items() if not k.endswith('acc'))
    losses['loss'] = total
    return total, losses, updated
