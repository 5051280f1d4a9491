"""RPN head with static-shape proposal generation.

Rebuild of `RPNHead` (`mmdet/models/dense_heads/rpn_head.py:33-68,103-235`):
a shared 3x3 conv + ReLU, then 1x1 sigmoid-cls and 1x1 delta-reg per
level. Proposal decode follows `_get_bboxes_single`/`_bbox_post_process`:
per-level top-`nms_pre` by sigmoid score, delta decode clipped to the
image shape, `min_bbox_size` filter (strict >), level-batched NMS, top
`max_per_img` — all with fixed shapes (padded slots use -inf scores).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.layers.common import torch_pad
from hrfuser_tpu.ops.boxes import delta2bbox
from hrfuser_tpu.ops.nms import NEG_INF, batched_nms

Array = jnp.ndarray


class RPNHead(nn.Module):
    """Per-level conv tower; weights shared across levels."""
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feats: List[Array]) -> Tuple[List[Array], List[Array]]:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=torch_pad(3),
                       dtype=self.dtype, name='rpn_conv')
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name='rpn_cls')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name='rpn_reg')
        cls_scores, bbox_preds = [], []
        for f in feats:
            h = nn.relu(conv(f))
            cls_scores.append(cls(h))
            bbox_preds.append(reg(h))
        return cls_scores, bbox_preds


class Proposals(NamedTuple):
    boxes: Array        # [max_per_img, 4]
    scores: Array       # [max_per_img]
    valid: Array        # [max_per_img] bool


def get_proposals_single(cls_scores: Sequence[Array],
                         bbox_preds: Sequence[Array],
                         anchors: Sequence[Array],
                         img_shape: Tuple[Array, Array],
                         nms_pre: int = 1000,
                         max_per_img: int = 1000,
                         nms_iou: float = 0.7,
                         min_bbox_size: float = 0.0) -> Proposals:
    """Single-image proposal decode (statically shaped).

    Args:
        cls_scores: per level [H, W, A] logits.
        bbox_preds: per level [H, W, A*4].
        anchors: per level [H*W*A, 4].
        img_shape: (h, w) as traced scalars (the unpadded input shape used
            for clipping, matching the reference's per-image `img_shape`).
    """
    lvl_scores, lvl_deltas, lvl_anchors, lvl_ids = [], [], [], []
    for lvl, (score, delta, anc) in enumerate(
            zip(cls_scores, bbox_preds, anchors)):
        s = jax.nn.sigmoid(score.reshape(-1).astype(jnp.float32))
        d = delta.reshape(-1, 4).astype(jnp.float32)
        k = min(nms_pre, s.shape[0])
        top_s, top_i = jax.lax.top_k(s, k)
        lvl_scores.append(top_s)
        lvl_deltas.append(d[top_i])
        lvl_anchors.append(anc[top_i])
        lvl_ids.append(jnp.full((k,), lvl, jnp.int32))

    scores = jnp.concatenate(lvl_scores)
    deltas = jnp.concatenate(lvl_deltas)
    ancs = jnp.concatenate(lvl_anchors)
    ids = jnp.concatenate(lvl_ids)

    proposals = delta2bbox(ancs, deltas, max_shape=img_shape)
    w = proposals[:, 2] - proposals[:, 0]
    h = proposals[:, 3] - proposals[:, 1]
    ok = (w > min_bbox_size) & (h > min_bbox_size)
    scores = jnp.where(ok, scores, NEG_INF)

    boxes, out_scores, _, valid = batched_nms(proposals, scores, ids,
                                              nms_iou, max_per_img)
    return Proposals(boxes, out_scores, valid)
