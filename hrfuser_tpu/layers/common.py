"""Basic NN building blocks (flax.linen, NHWC).

Conventions:
  * Layout is NHWC; conv kernels HWIO. Padding is always explicit
    torch-style (e.g. 3x3 stride-2 pad-1) so shapes match the reference
    (`mmdet/models/backbones/hrnet.py` stem et al.) exactly.
  * BatchNorm follows torch semantics (eps 1e-5, running-stat momentum
    0.1 => flax momentum 0.9). Under `jit` with a batch-sharded mesh the
    batch-stat reduction is global, which *is* SyncBN — no NCCL analogue
    needed (SURVEY §2.7).
  * Every module takes `train: bool`; BN uses running stats when not
    training, DropPath/Dropout become identity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray
Dtype = Any


def torch_pad(k: int) -> Sequence[Tuple[int, int]]:
    """Explicit symmetric padding equal to torch's `padding=k//2` for odd k."""
    p = k // 2
    return ((p, p), (p, p))


class BatchNorm(nn.Module):
    """Torch-compatible BatchNorm2d.

    `axis` selects the feature axis (-1 for NHWC, 1 for the channels-first
    fast path); parameter/batch-stat shapes are `(C,)` either way, so the
    two layouts share checkpoints.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis: int = -1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis=self.axis,
            dtype=self.dtype,
            name='bn')(x)


class ConvNorm(nn.Module):
    """Conv -> BN (-> ReLU). The workhorse of the HRNet trunk."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    act: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        if (self.kernel == 3 and self.groups == self.features
                and self.groups == x.shape[-1]):
            # depthwise: shifted-FMA formulation (same params; see
            # DepthwiseConv3x3 for why)
            x = DepthwiseConv3x3(self.features, stride=self.stride,
                                 use_bias=self.use_bias, dtype=self.dtype,
                                 name='conv')(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=self.stride, padding=torch_pad(self.kernel),
                        feature_group_count=self.groups,
                        use_bias=self.use_bias,
                        dtype=self.dtype, name='conv')(x)
        x = BatchNorm(dtype=self.dtype, name='norm')(x, train)
        if self.act:
            x = nn.relu(x)
        return x


class DepthwiseConv3x3(nn.Module):
    """Depthwise 3x3 conv as 9 shifted multiply-adds.

    Numerically the torch depthwise conv (zero pad 1, stride 1), but
    avoids XLA:TPU's grouped-convolution lowering, which profiles ~5x
    slower than this formulation at HRFuser widths (the reference's
    CrossFFN dw convs, `hrformer.py:239-295`, were ~23 ms of a 95 ms
    backbone step). Parameter names/shapes match `nn.Conv(features,
    (3,3), feature_group_count=features)` — kernel [3, 3, 1, C], bias
    [C] — so `.pth` conversion is unchanged.
    """
    features: int
    stride: int = 1
    use_bias: bool = True
    layout: str = 'nhwc'                 # 'nhwc' | 'cf' ([B, C, H, W])
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.features
        s = self.stride
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, 1, c), jnp.float32)
        dt = self.dtype or x.dtype
        k = kernel.astype(dt)
        bias = (self.param('bias', nn.initializers.zeros, (c,),
                           jnp.float32).astype(dt) if self.use_bias else None)
        if self.layout == 'cf':
            xp = jnp.pad(x.astype(dt), ((0, 0), (0, 0), (1, 1), (1, 1)))
            h, w = x.shape[2], x.shape[3]
            oh, ow = (h - 1) // s + 1, (w - 1) // s + 1
            y = None
            for dy in range(3):
                for dx in range(3):
                    t = xp[:, :, dy:dy + s * (oh - 1) + 1:s,
                           dx:dx + s * (ow - 1) + 1:s] \
                        * k[dy, dx, 0][None, :, None, None]
                    y = t if y is None else y + t
            return y if bias is None else y + bias[None, :, None, None]
        xp = jnp.pad(x.astype(dt), ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w = x.shape[1], x.shape[2]
        oh, ow = (h - 1) // s + 1, (w - 1) // s + 1
        y = None
        for dy in range(3):
            for dx in range(3):
                t = xp[:, dy:dy + s * (oh - 1) + 1:s,
                       dx:dx + s * (ow - 1) + 1:s, :] * k[dy, dx, 0]
                y = t if y is None else y + t
        return y if bias is None else y + bias


class DenseCF(nn.Module):
    """`nn.Dense` over axis 1 of a channels-first array.

    Parameter names/shapes (`kernel` [in, out], `bias` [out]) are identical
    to `nn.Dense`, so a module tree may freely mix the NHWC and CF
    formulations per call site and share one checkpoint. Accepts
    [B, C, N] or [B, C, H, W]; output keeps features at axis 1 — the TPU
    point of the layout: lane tiles stay on the (large) spatial minor axis
    instead of a small C.
    """
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (c, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        eq = 'bcn,cd->bdn' if x.ndim == 3 else 'bchw,cd->bdhw'
        y = jnp.einsum(eq, x.astype(dt), kernel.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32).astype(dt)
            y = y + bias.reshape((1, -1) + (1,) * (x.ndim - 2))
        return y


class ConvCF1x1(nn.Module):
    """1x1 `nn.Conv` on a channels-first [B, C, H, W] array.

    Parameter names/shapes (`kernel` [1, 1, in, out], `bias` [out]) match
    `nn.Conv(features, (1, 1))` so checkpoints are layout-agnostic.
    """
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, c, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        y = jnp.einsum('bchw,cd->bdhw', x.astype(dt),
                       kernel[0, 0].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32).astype(dt)
            y = y + bias[None, :, None, None]
        return y


class LayerNorm(nn.Module):
    """LayerNorm with a zero-variance gradient guard.

    Forward-identical to `nn.LayerNorm` (torch `nn.LayerNorm`): when the
    per-row variance is exactly zero the centred input is zero, so the
    output is `bias` either way. The difference is the *backward* pass:
    plain LN multiplies cotangents by `rsqrt(eps)` (~1e3 at eps 1e-6) on
    zero-variance rows. `RandomDrop` (modality dropout,
    `mmdet/datasets/pipelines/transforms.py:486-514`) feeds exactly-zero
    modality streams through stacks of LNs, and those amplifications
    compound into overflow -> NaN weight gradients — a hazard present in
    the reference's math too (see ROUND1.md). Here zero-variance rows get
    an exactly-zero gradient instead.
    """
    epsilon: float = 1e-6
    axis: int = -1                       # feature axis (1 for CF layout)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ax = self.axis % x.ndim
        c = x.shape[ax]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        bshape = [1] * x.ndim
        bshape[ax] = c
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=ax, keepdims=True)
        centered = xf - mean
        var = (centered * centered).mean(axis=ax, keepdims=True)
        inv = jnp.where(var > 0.0, jax.lax.rsqrt(var + self.epsilon), 0.0)
        y = centered * inv * scale.reshape(bshape) + bias.reshape(bshape)
        return y.astype(self.dtype or x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference: mmcv DropPath)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng('dropout')
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask.astype(x.dtype) / keep


class BasicBlock(nn.Module):
    """ResNet BasicBlock (`mmdet/models/backbones/resnet.py`), expansion 1.

    3x3(s) -> BN -> ReLU -> 3x3 -> BN, residual (+ optional 1x1 downsample),
    ReLU.
    """
    planes: int
    stride: int = 1
    with_downsample: bool = False
    dtype: Optional[Dtype] = None

    expansion = 1

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        identity = x
        out = ConvNorm(self.planes, 3, self.stride, act=True,
                       dtype=self.dtype, name='conv1')(x, train)
        out = ConvNorm(self.planes, 3, 1, act=False,
                       dtype=self.dtype, name='conv2')(out, train)
        if self.with_downsample:
            identity = ConvNorm(self.planes * self.expansion, 1, self.stride,
                                act=False, dtype=self.dtype,
                                name='downsample')(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """ResNet Bottleneck (pytorch style: stride on the 3x3), expansion 4."""
    planes: int
    stride: int = 1
    with_downsample: bool = False
    dtype: Optional[Dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        identity = x
        out = ConvNorm(self.planes, 1, 1, act=True,
                       dtype=self.dtype, name='conv1')(x, train)
        out = ConvNorm(self.planes, 3, self.stride, act=True,
                       dtype=self.dtype, name='conv2')(out, train)
        out = ConvNorm(self.planes * self.expansion, 1, 1, act=False,
                       dtype=self.dtype, name='conv3')(out, train)
        if self.with_downsample:
            identity = ConvNorm(self.planes * self.expansion, 1, self.stride,
                                act=False, dtype=self.dtype,
                                name='downsample')(x, train)
        return nn.relu(out + identity)


BLOCK_CLASSES = {'BASIC': BasicBlock, 'BOTTLENECK': Bottleneck}


class ResLayer(nn.Module):
    """A run of BasicBlocks/Bottlenecks with automatic downsample on entry.

    Mirrors `HRNet._make_layer` / `HRModule._make_one_branch`.
    """
    block: str
    planes: int
    num_blocks: int
    in_channels: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        cls = BLOCK_CLASSES[self.block]
        out_ch = self.planes * cls.expansion
        need_ds = self.stride != 1 or self.in_channels != out_ch
        x = cls(self.planes, self.stride, with_downsample=need_ds,
                dtype=self.dtype, name='block0')(x, train)
        for i in range(1, self.num_blocks):
            x = cls(self.planes, 1, with_downsample=False, dtype=self.dtype,
                    name=f'block{i}')(x, train)
        return x


def nearest_up(x: Array, factor: int) -> Array:
    """Integer nearest-neighbour upsampling (torch Upsample(mode=nearest))."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def bilinear_resize(x: Array, out_hw: Tuple[int, int]) -> Array:
    """Bilinear resize, half-pixel centers (= torch align_corners=False)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method='bilinear')
