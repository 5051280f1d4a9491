"""Cascade RoI head: 3-stage refinement with static shapes.

Rebuild of `CascadeRoIHead.simple_test`
(`mmdet/models/roi_heads/cascade_roi_head.py:288-411`): per stage,
RoIAlign + Shared2FC head; between stages, RoIs are refined by decoding
the class-agnostic deltas (`regress_by_class`, reg-agnostic path); stage
logits are averaged and softmaxed once, then multiclass NMS produces the
final fixed-size detection set.

Everything here operates on a single image (batch via `vmap`); RoIs are a
fixed-size set with a validity mask (invalid rows are zero boxes whose
pooled features and scores are discarded through the -inf score path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.models.roi_heads.bbox_head import Shared2FCBBoxHead
from hrfuser_tpu.ops.boxes import delta2bbox
from hrfuser_tpu.ops.nms import NEG_INF, multiclass_nms
from hrfuser_tpu.ops.roi_align import (multilevel_roi_align,
                                        multilevel_roi_align_onehot)

Array = jnp.ndarray

# Per-stage delta std schedule (`cascade_rcnn_hrfuser_fpn_nus_clr_fusion.py`).
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))


@dataclasses.dataclass(frozen=True)
class RoIHeadCfg:
    num_classes: int
    num_stages: int = 3
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    stage_stds: Tuple[Tuple[float, ...], ...] = STAGE_STDS
    fc_out_channels: int = 1024
    roi_size: int = 7
    # per-bin sampling grid: >0 = static fast path; 0 = exact adaptive
    # `sampling_ratio=0` semantics (ceil(bin) points, capped at max_grid)
    sample_num: int = 2
    max_grid: int = 4
    # RoIAlign formulation: 'onehot' = separable one-hot matmuls (MXU,
    # scatter-free backward — the fast path for training); 'gather' =
    # 4-tap row gathers (less HBM traffic; backward is a scatter-add).
    # Training pools 512 RoIs/img (onehot's [B,N,7,W,C] intermediate is
    # affordable and the scatter-free backward dominates); inference
    # pools 1000 RoIs/img with no backward, where the intermediate is
    # pure overhead — hence separate train/eval methods.
    pool_method: str = 'onehot'
    # eval default: the Pallas kernel (ops/pallas_roi_align.py) x-pools
    # rows as they stream through VMEM — measured 26.8 ms vs 74 ms
    # (gather bf16) / 104 ms (gather f32) per 1000-RoI pool at batch 8
    # on v5e. 'gather' remains the f32-exact parity path.
    pool_method_eval: str = 'pallas'
    # Pallas kernel variant (ops/pallas_roi_align.py): 'v7' = full-
    # coverage window with branchless extent-proportional chunk trips —
    # matches v4's speed on narrow RoIs (13.0 vs 13.6 ms/call at 8x1000
    # realistic RoIs) and handles ANY clipped RoI in-kernel, so the
    # oversize-gather fallback (60-70 ms/step on honest random-input
    # benches, perf/r4_03) runs zero iterations. 'v1'..'v6' kept as
    # documented steps (ROUND4.md §3). v2+ emit flat rows in (q, p)
    # order, absorbed by the head's `flat_row_order='wh'`.
    pallas_variant: str = 'v7'
    # gathers (and their backward scatters) are the dominant HBM traffic
    # of the 'gather' train step; bf16 halves it. False = exact f32.
    # For 'onehot' this selects the einsum input dtype (f32 accumulate).
    gather_bf16: bool = True
    finest_scale: int = 56
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    # test cfg (`:289-292`)
    score_thr: float = 0.05
    nms_iou: float = 0.5
    max_per_img: int = 100


class Detections(NamedTuple):
    boxes: Array        # [max_per_img, 4]
    scores: Array       # [max_per_img]
    labels: Array       # [max_per_img] int32, -1 padding
    valid: Array        # [max_per_img] bool


class CascadeRoIHead(nn.Module):
    cfg: RoIHeadCfg
    dtype: Optional[Any] = None

    def setup(self):
        # flat [N, 49, C] inputs only come from the Pallas pool; its
        # v2/v3/v4 kernels emit (q, p) rows -> 'wh' kernel permutation.
        # The set is owned by pallas_roi_align so a new variant can't
        # drift out of sync with the head (ADVICE r3).
        from hrfuser_tpu.ops.pallas_roi_align import QP_VARIANTS
        order = 'wh' if self.cfg.pallas_variant in QP_VARIANTS else 'hw'
        self.bbox_heads = [
            Shared2FCBBoxHead(self.cfg.num_classes,
                              self.cfg.fc_out_channels, dtype=self.dtype,
                              flat_row_order=order,
                              name=f'bbox_head{i}')
            for i in range(self.cfg.num_stages)
        ]

    def _pool(self, feats: Sequence[Array], rois: Array,
              method: Optional[str] = None) -> Array:
        dt = jnp.bfloat16 if self.cfg.gather_bf16 else jnp.float32
        method = method or self.cfg.pool_method
        if method == 'pallas' and jax.default_backend() != 'tpu':
            # interpret-mode Pallas is orders of magnitude too slow for
            # CPU runs; the gather formulation is numerically equivalent
            method = 'gather'
        if method == 'pallas' and self.cfg.sample_num == 0:
            # adaptive sampling_ratio=0 (exact parity mode) has a
            # data-dependent tap grid; only the gather path supports it
            method = 'gather'
        if method == 'onehot':
            return multilevel_roi_align_onehot(
                list(feats), rois, list(self.cfg.featmap_strides),
                out_size=self.cfg.roi_size, sample_num=self.cfg.sample_num,
                finest_scale=self.cfg.finest_scale,
                max_grid=self.cfg.max_grid, compute_dtype=dt)
        if method == 'pallas':
            from hrfuser_tpu.ops.pallas_roi_align import (
                multilevel_roi_align_pallas)
            # flat_out: the 2FC head flattens anyway; taking the
            # kernel's native [N, 49, C] row order avoids the [7, 7]
            # re-tiling relayout copies between pool and head
            return multilevel_roi_align_pallas(
                list(feats), rois, tuple(self.cfg.featmap_strides),
                out_size=self.cfg.roi_size,
                sample_num=self.cfg.sample_num,
                finest_scale=self.cfg.finest_scale, flat_out=True,
                variant=self.cfg.pallas_variant)
        return multilevel_roi_align(
            list(feats), rois, list(self.cfg.featmap_strides),
            out_size=self.cfg.roi_size, sample_num=self.cfg.sample_num,
            finest_scale=self.cfg.finest_scale, max_grid=self.cfg.max_grid,
            gather_dtype=jnp.bfloat16 if self.cfg.gather_bf16 else None)

    def forward_stage(self, stage: int, feats: Sequence[Array],
                      rois: Array, pool_method: Optional[str] = None
                      ) -> Tuple[Array, Array]:
        pooled = self._pool(feats, rois, pool_method)
        # keep the pool's dtype (the Pallas path emits bf16 — forcing
        # f32 here cost ~3 ms/step of pure convert copies at batch 8;
        # the head's f32 params promote the matmul result back to f32)
        if self.dtype is not None:
            pooled = pooled.astype(self.dtype)
        return self.bbox_heads[stage](pooled)

    def __call__(self, feats: Sequence[Array], rois: Array):
        """Train-mode single-stage forward (used for init); see
        `simple_test` for the full cascade."""
        return self.forward_stage(0, feats, rois)

    def simple_test(self, feats: Sequence[Array], proposals: Array,
                    proposal_valid: Array, img_shape, scale_factor,
                    rescale: bool = True) -> Detections:
        """Single-image cascade inference.

        Args:
            feats: 4 pyramid levels [H_l, W_l, C] (strides 4..32; the
                stride-64 level is RPN-only, as in the reference extractor).
            proposals: [R, 4] RPN boxes (padded with zeros).
            proposal_valid: [R] bool.
            img_shape: (h, w) traced scalars for clipping.
            scale_factor: [4] (sx, sy, sx, sy) for rescale to orig image.
        """
        cfg = self.cfg
        boxes, scores = self.decode_cascade(feats, proposals,
                                            proposal_valid, img_shape)
        if rescale:
            boxes = boxes / jnp.asarray(scale_factor, boxes.dtype)

        out_boxes, out_scores, out_labels, out_valid = multiclass_nms(
            boxes, scores, cfg.score_thr, cfg.nms_iou, cfg.max_per_img)
        return Detections(out_boxes, out_scores, out_labels, out_valid)

    def decode_cascade(self, feats: Sequence[Array], proposals: Array,
                       proposal_valid: Array, img_shape
                       ) -> Tuple[Array, Array]:
        """Cascade refine + decode without NMS/rescale.

        Returns ([R, 4] boxes in the input frame, [R, C+1] softmax scores
        averaged over stages, zeroed on invalid proposals) — the per-aug
        quantity that `aug_test`/`merge_aug_bboxes` average in the
        reference (`cascade_roi_head.py:342-378`).
        """
        cfg = self.cfg
        rois = proposals
        ms_logits = []
        deltas = None
        for i in range(cfg.num_stages):
            logits, deltas = self.forward_stage(
                i, feats, rois, pool_method=cfg.pool_method_eval)
            ms_logits.append(logits)
            if i < cfg.num_stages - 1:
                # refine: decode class-agnostic deltas on current rois
                cls_label = jnp.argmax(logits[:, :-1], axis=-1)
                del cls_label  # reg_class_agnostic: label unused
                rois = delta2bbox(rois, deltas, stds=cfg.stage_stds[i],
                                  max_shape=img_shape)

        avg_logits = sum(ms_logits) / float(len(ms_logits))
        scores = jax.nn.softmax(avg_logits, axis=-1)
        boxes = delta2bbox(rois, deltas, stds=cfg.stage_stds[-1],
                           max_shape=img_shape)
        # invalid proposals must not produce detections
        scores = jnp.where(proposal_valid[:, None], scores, 0.0)
        return boxes, scores
