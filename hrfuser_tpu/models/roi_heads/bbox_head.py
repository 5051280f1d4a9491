"""Shared2FC bbox head (`mmdet/models/roi_heads/bbox_heads/convfc_bbox_head.py:201-215`).

Flatten the 7x7x256 RoI feature, two shared 1024-d FC+ReLU, then a
(num_classes+1)-way softmax classifier and a class-agnostic 4-d regressor.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class Shared2FCBBoxHead(nn.Module):
    num_classes: int
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, roi_feats: Array) -> Tuple[Array, Array]:
        """roi_feats: [N, 7, 7, C] -> (cls_logits [N, C+1], deltas [N, 4])."""
        n = roi_feats.shape[0]
        # Torch flattens CHW; transpose so converted FC weights line up.
        x = roi_feats.transpose(0, 3, 1, 2).reshape(n, -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name='shared_fc0')(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name='shared_fc1')(x))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                              name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        deltas = nn.Dense(reg_dim, dtype=self.dtype, name='fc_reg')(x)
        return cls_logits.astype(jnp.float32), deltas.astype(jnp.float32)
