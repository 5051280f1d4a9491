"""Window attention blocks: LSA, MWCA, CrossFFN, HRFormer/fusion blocks.

TPU-native rebuild of the reference transformer layers:
  * `WindowMSA` / `LocalWindowSelfAttention` (`mmdet/models/backbones/hrformer.py:18-236`)
  * `WindowMCA` / `MultiWindowCrossAttention` / `HRFuserFusionBlock`
    (`mmdet/models/backbones/hrfuser_hrformer_based.py:21-326`)
  * `CrossFFN` (`hrformer.py:239-295`)

Features stay NHWC end-to-end; the window partition (with the reference's
center-pad semantics) happens inside the attention wrappers. The window
axis (B * num_windows) is embarrassingly parallel — XLA batches the
49-token attention matmuls over it on the MXU.

Weight layout notes for the .pth converter: WindowMSA uses a fused qkv
projection (`hrformer.py:84`), WindowMCA split q/k/v projections
(`hrfuser_hrformer_based.py:92-94`); both are mirrored here.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from hrfuser_tpu.layers.common import (BatchNorm, ConvCF1x1, DenseCF,
                                       DepthwiseConv3x3, DropPath, LayerNorm,
                                       torch_pad)
from hrfuser_tpu.ops.window import (relative_position_index,
                                    window_partition, window_partition_cf,
                                    window_reverse, window_reverse_cf)

Array = jnp.ndarray
Dtype = Any


def _lane_util(n: int) -> float:
    """Fraction of 128-wide lane tiles a minor dim of size n fills."""
    return n / (-(-n // 128) * 128)


def prefer_cf(h: int, w: int, c: int) -> bool:
    """Decide NHWC vs channels-first for an [B, h, w, c] block chain.

    TPU vector tiles are (8 sublanes, 128 lanes) over the two minor dims.
    NHWC puts C in lanes — at HRFuser branch-0 widths (C=18) elementwise
    chains run at 18/128 = 14% lane utilization (measured: ~1/3 of the
    r640 inference step). Channels-first puts W in lanes and H in
    sublanes. Pick whichever fills the vector tile better, with a 1.5x
    margin so the two boundary transposes per block chain are paid only
    when the win is real.
    """
    util_nhwc = _lane_util(c) * min(w / (-(-w // 8) * 8), 1.0)
    util_cf = _lane_util(w) * min(h / (-(-h // 8) * 8), 1.0)
    return util_cf > 1.5 * util_nhwc


def resolve_layout(mode: str, h: int, w: int, c: int) -> str:
    """Map a config knob ('off' | 'auto' | 'on') to a concrete layout."""
    if mode == 'on':
        return 'cf'
    if mode == 'auto' and prefer_cf(h, w, c):
        return 'cf'
    return 'nhwc'


class RelativePositionBias(nn.Module):
    """Swin-style relative position bias for one window shape."""
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self) -> Array:
        ws = self.window_size
        table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        idx = relative_position_index(ws, ws)            # [N, N] numpy
        bias = table[idx.reshape(-1)].reshape(ws * ws, ws * ws,
                                              self.num_heads)
        return bias.transpose(2, 0, 1)                   # [nH, N, N]


def _window_attention(q: Array, k: Array, v: Array, num_heads: int,
                      bias: Optional[Array], scale: float) -> Array:
    """Core windowed attention. q/k/v: [B_, N, C] -> [B_, N, C]."""
    b, n, c = q.shape
    hd = c // num_heads
    q = q.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k,
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None]
    attn = nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


def _window_attention_cf(q: Array, k: Array, v: Array, num_heads: int,
                         bias: Optional[Array], scale: float) -> Array:
    """Channels-first windowed attention. q/k/v: [B_, C, N] -> [B_, C, N].

    Same math as `_window_attention` with the token axis minor; the
    [N, N] logits/softmax keep 49 tokens in lanes instead of a small C.
    """
    b, c, n = q.shape
    hd = c // num_heads
    q = q.reshape(b, num_heads, hd, n)
    k = k.reshape(b, num_heads, hd, n)
    v = v.reshape(b, num_heads, hd, n)
    attn = jnp.einsum('bhdn,bhdm->bhnm', q * scale, k,
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None]
    attn = nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum('bhnm,bhdm->bhdn', attn, v)
    return out.reshape(b, c, n)


class LocalWindowSelfAttention(nn.Module):
    """LSA: center-pad window partition + fused-qkv window MHSA + RPE.

    Input/output: [B, H, W, C] feature map (already layer-normed by the
    caller, as in `HRFormerBlock`).
    """
    num_heads: int
    window_size: int = 7
    qkv_bias: bool = True
    with_rpe: bool = True
    proj_drop: float = 0.0
    layout: str = 'nhwc'                 # 'nhwc' | 'cf' ([B, C, H, W] io)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        ws = self.window_size
        bias = (RelativePositionBias(ws, self.num_heads, name='rpe')()
                if self.with_rpe else None)
        if self.layout == 'cf':
            b, c, h, w = x.shape
            wins = window_partition_cf(x, ws, ws)        # [B*nW, C, ws*ws]
            qkv = DenseCF(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                          name='qkv')(wins)
            q, k, v = jnp.split(qkv, 3, axis=1)
            scale = (c // self.num_heads) ** -0.5
            out = _window_attention_cf(q, k, v, self.num_heads, bias, scale)
            out = DenseCF(c, dtype=self.dtype, name='out_proj')(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return window_reverse_cf(out, b, h, w, ws, ws)
        b, h, w, c = x.shape
        wins = window_partition(x, ws, ws)               # [B*nW, ws*ws, C]
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name='qkv')(wins)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = (c // self.num_heads) ** -0.5
        out = _window_attention(q, k, v, self.num_heads, bias, scale)
        out = nn.Dense(c, dtype=self.dtype, name='out_proj')(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return window_reverse(out, b, h, w, ws, ws)


class MultiWindowCrossAttention(nn.Module):
    """MWCA: q from the camera stream, k/v from one modality stream.

    Split q/k/v projections (matching `WindowMCA`,
    `hrfuser_hrformer_based.py:92-94`). Input/output [B, H, W, C].
    """
    num_heads: int
    window_size: int = 7
    qkv_bias: bool = True
    with_rpe: bool = True
    proj_drop: float = 0.0
    layout: str = 'nhwc'                 # 'nhwc' | 'cf' ([B, C, H, W] io)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, y: Array,
                 deterministic: bool = True) -> Array:
        ws = self.window_size
        bias = (RelativePositionBias(ws, self.num_heads, name='rpe')()
                if self.with_rpe else None)
        if self.layout == 'cf':
            b, c, h, w = x.shape
            xw = window_partition_cf(x, ws, ws)
            yw = window_partition_cf(y, ws, ws)
            q = DenseCF(c, use_bias=self.qkv_bias, dtype=self.dtype,
                        name='q_proj')(xw)
            k = DenseCF(c, use_bias=self.qkv_bias, dtype=self.dtype,
                        name='k_proj')(yw)
            v = DenseCF(c, use_bias=self.qkv_bias, dtype=self.dtype,
                        name='v_proj')(yw)
            scale = (c // self.num_heads) ** -0.5
            out = _window_attention_cf(q, k, v, self.num_heads, bias, scale)
            out = DenseCF(c, dtype=self.dtype, name='out_proj')(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return window_reverse_cf(out, b, h, w, ws, ws)
        b, h, w, c = x.shape
        xw = window_partition(x, ws, ws)
        yw = window_partition(y, ws, ws)
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     name='q_proj')(xw)
        k = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     name='k_proj')(yw)
        v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     name='v_proj')(yw)
        scale = (c // self.num_heads) ** -0.5
        out = _window_attention(q, k, v, self.num_heads, bias, scale)
        out = nn.Dense(c, dtype=self.dtype, name='out_proj')(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return window_reverse(out, b, h, w, ws, ws)


class CrossFFN(nn.Module):
    """1x1 conv -> BN -> GELU -> depthwise 3x3 -> BN -> GELU -> 1x1 -> BN
    -> GELU (`hrformer.py:239-295`). The depthwise conv mixes space, which
    is why HRFormer needs no positional encoding beyond the window RPE."""
    hidden: int
    out: int
    layout: str = 'nhwc'                 # 'nhwc' | 'cf' ([B, C, H, W] io)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        cf = self.layout == 'cf'
        ax = 1 if cf else -1
        if cf:
            x = ConvCF1x1(self.hidden, dtype=self.dtype, name='fc1')(x)
        else:
            x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name='fc1')(x)
        x = BatchNorm(axis=ax, dtype=self.dtype, name='norm1')(x, train)
        x = nn.gelu(x, approximate=False)
        x = DepthwiseConv3x3(self.hidden, layout=self.layout,
                             dtype=self.dtype, name='dw')(x)
        x = BatchNorm(axis=ax, dtype=self.dtype, name='norm2')(x, train)
        x = nn.gelu(x, approximate=False)
        if cf:
            x = ConvCF1x1(self.out, dtype=self.dtype, name='fc2')(x)
        else:
            x = nn.Conv(self.out, (1, 1), dtype=self.dtype, name='fc2')(x)
        x = BatchNorm(axis=ax, dtype=self.dtype, name='norm3')(x, train)
        return nn.gelu(x, approximate=False)


class HRFormerBlock(nn.Module):
    """LN -> LSA -> +residual; LN -> CrossFFN -> +residual; with DropPath.

    (`hrformer.py:298-386`). Input/output NHWC.
    """
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    proj_drop: float = 0.0
    layout: str = 'nhwc'                 # 'nhwc' | 'cf' ([B, C, H, W] io)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        ax = 1 if self.layout == 'cf' else -1
        c = x.shape[ax]
        det = not train
        h = LayerNorm(epsilon=1e-6, axis=ax, name='norm1')(x)
        h = LocalWindowSelfAttention(self.num_heads, self.window_size,
                                     proj_drop=self.proj_drop,
                                     layout=self.layout,
                                     dtype=self.dtype, name='attn')(h, det)
        x = x + DropPath(self.drop_path, name='drop_path1')(h, det)
        h = LayerNorm(epsilon=1e-6, axis=ax, name='norm2')(x)
        h = CrossFFN(int(c * self.mlp_ratio), c, layout=self.layout,
                     dtype=self.dtype, name='ffn')(h, train)
        x = x + DropPath(self.drop_path, name='drop_path2')(h, det)
        return x


class HRFuserFusionBlock(nn.Module):
    """MWCA fusion of N modality streams into the camera stream.

    Exact residual semantics of the reference
    (`hrfuser_hrformer_based.py:305-317`): every modality attends against
    the same frozen copy of the camera feature, the raw modality feature is
    added too, and a shared CrossFFN closes the block:

        x_tmp = x
        for k: x = x + z_k + DropPath(MWCA_k(LN1_k(x_tmp), LN2_k(z_k)))
        x = x + DropPath(CrossFFN(LN3(x)))
    """
    num_heads: int
    num_modalities: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    proj_drop: float = 0.0
    layout: str = 'nhwc'                 # 'nhwc' | 'cf' ([B, C, H, W] io)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, mods: List[Array], train: bool) -> Array:
        assert len(mods) == self.num_modalities
        ax = 1 if self.layout == 'cf' else -1
        c = x.shape[ax]
        det = not train
        x_tmp = x
        for k in range(self.num_modalities):
            z = mods[k]
            q = LayerNorm(epsilon=1e-6, axis=ax, name=f'norm1_{k}')(x_tmp)
            kv = LayerNorm(epsilon=1e-6, axis=ax, name=f'norm2_{k}')(z)
            a = MultiWindowCrossAttention(
                self.num_heads, self.window_size, proj_drop=self.proj_drop,
                layout=self.layout,
                dtype=self.dtype, name=f'attn_{k}')(q, kv, det)
            x = x + z + DropPath(self.drop_path, name=f'drop_path_{k}')(a, det)
        h = LayerNorm(epsilon=1e-6, axis=ax, name='norm3')(x)
        h = CrossFFN(int(c * self.mlp_ratio), c, layout=self.layout,
                     dtype=self.dtype, name='ffn')(h, train)
        x = x + DropPath(self.drop_path, name='drop_path_ffn')(h, det)
        return x
