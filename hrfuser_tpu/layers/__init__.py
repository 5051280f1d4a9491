from hrfuser_tpu.layers.attention import (CrossFFN, HRFormerBlock,
                                          HRFuserFusionBlock,
                                          LocalWindowSelfAttention,
                                          MultiWindowCrossAttention,
                                          RelativePositionBias)
from hrfuser_tpu.layers.common import (BasicBlock, BatchNorm, Bottleneck,
                                       ConvNorm, DropPath, ResLayer,
                                       bilinear_resize, nearest_up)

__all__ = ['CrossFFN', 'HRFormerBlock', 'HRFuserFusionBlock',
           'LocalWindowSelfAttention', 'MultiWindowCrossAttention',
           'RelativePositionBias', 'BasicBlock', 'BatchNorm', 'Bottleneck',
           'ConvNorm', 'DropPath', 'ResLayer', 'bilinear_resize',
           'nearest_up']
