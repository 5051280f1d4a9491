"""HRFPN neck (`mmdet/models/necks/hrfpn.py:12-100`).

Bilinear-upsample every branch to stride 4, concat, 1x1 reduce, then
average-pool a 5-level pyramid and apply one 3x3 conv per level.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.layers.common import bilinear_resize, torch_pad

Array = jnp.ndarray
Dtype = Any


class HRFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    pooling: str = 'AVG'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: List[Array], train: bool = False
                 ) -> List[Array]:
        target_hw = inputs[0].shape[1:3]
        ups = [inputs[0]]
        for i in range(1, len(inputs)):
            ups.append(bilinear_resize(inputs[i], target_hw))
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name='reduction_conv')(x)

        outs = [x]
        for i in range(1, self.num_outs):
            k = 2 ** i
            if self.pooling == 'MAX':
                p = nn.max_pool(x, (k, k), strides=(k, k))
            else:
                p = nn.avg_pool(x, (k, k), strides=(k, k))
            outs.append(p)

        return [nn.Conv(self.out_channels, (3, 3), padding=torch_pad(3),
                        dtype=self.dtype, name=f'fpn_conv{i}')(outs[i])
                for i in range(self.num_outs)]
