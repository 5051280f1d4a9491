"""Shared2FC bbox head (`mmdet/models/roi_heads/bbox_heads/convfc_bbox_head.py:201-215`).

Flatten the 7x7x256 RoI feature, two shared 1024-d FC+ReLU, then a
(num_classes+1)-way softmax classifier and a class-agnostic 4-d regressor.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class _ChwOrderDense(nn.Module):
    """Dense over an HWC-flattened RoI feature with a CHW-ordered kernel.

    The param tree/shape is identical to `nn.Dense` with the kernel rows
    in torch's CHW flatten order (so `.pth`-converted weights load
    unchanged, `convfc_bbox_head.py` flattens [N, C, 7, 7]). The input is
    flattened straight from the pool's [N, H, W, C] layout — permuting
    the 12544-row kernel once per step (~50 MB) replaced a [N, 7, 7, 256]
    -> [N, 256, 7, 7] activation transpose that cost ~4 ms/step of pure
    copies at batch 8 x 3 cascade stages.
    """
    features: int
    spatial: Tuple[int, int]
    channels: int
    dtype: Optional[Any] = None
    # row order of a flat [N, h*w, c] input: 'hw' (row-major, Pallas v1)
    # or 'wh' (column-major, Pallas v2/v3) — absorbed into the same
    # kernel permutation, so either order costs identically
    flat_row_order: str = 'hw'

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.spatial
        c = self.channels
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (c * h * w, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
            x = x.astype(self.dtype)
        k_hwc = kernel.reshape(c, h, w, self.features) \
            .transpose(1, 2, 0, 3)                       # [h, w, c, F]
        if x.ndim == 3:
            # [N, h*w, c] straight from the Pallas pool: flatten the two
            # trailing dims (a bitcast on the pool's row-major layout)
            # and contract with one plain 2-D dot — the earlier
            # einsum('nqc,qcf->nf') form made XLA relayout the pool
            # output ({3,2,1,0} -> {3,1,2,0}, 0.64 ms/stage of copies)
            if self.flat_row_order == 'wh':
                k_hwc = k_hwc.transpose(1, 0, 2, 3)      # [w, h, c, F]
            return x.reshape(*x.shape[:-2], h * w * c) @ \
                k_hwc.reshape(h * w * c, self.features) + bias
        return x @ k_hwc.reshape(c * h * w, self.features) + bias


class Shared2FCBBoxHead(nn.Module):
    num_classes: int
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = True
    dtype: Optional[Any] = None
    # row order of flat [N, 49, C] inputs (Pallas flat_out); only the
    # 3-dim input branch consults it — see `_ChwOrderDense`
    flat_row_order: str = 'hw'

    @nn.compact
    def __call__(self, roi_feats: Array) -> Tuple[Array, Array]:
        """roi_feats: [N, 7, 7, C] (or [N, 49, C] from the Pallas pool)
        -> (cls_logits [N, C+1], deltas [N, 4])."""
        if roi_feats.ndim == 3:
            n, q, c = roi_feats.shape
            h = w = int(round(q ** 0.5))
            x = roi_feats
        else:
            n, h, w, c = roi_feats.shape
            x = roi_feats.reshape(n, -1)
        x = nn.relu(_ChwOrderDense(self.fc_out_channels, (h, w), c,
                                   dtype=self.dtype,
                                   flat_row_order=self.flat_row_order,
                                   name='shared_fc0')(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name='shared_fc1')(x))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                              name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        deltas = nn.Dense(reg_dim, dtype=self.dtype, name='fc_reg')(x)
        return cls_logits.astype(jnp.float32), deltas.astype(jnp.float32)
