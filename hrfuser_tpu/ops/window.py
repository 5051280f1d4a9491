"""Window partition helpers for local window attention.

Implements the center-pad window partition/reverse used by the reference's
LocalWindowSelfAttention (`mmdet/models/backbones/hrformer.py:200-236`) and
MultiWindowCrossAttention (`hrfuser_hrformer_based.py:207-248`): features
are padded symmetrically (extra pixel goes to the bottom/right) up to a
multiple of the window, partitioned into non-overlapping [Wh*Ww] token
windows, and un-padded on the way back. All shapes static.

Layout: NHWC throughout ([B, H, W, C])."""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def center_pad_shape(h: int, w: int, wh: int, ww: int
                     ) -> Tuple[int, int, int, int]:
    """(pad_top, pad_bottom, pad_left, pad_right) for center padding."""
    pad_h = math.ceil(h / wh) * wh - h
    pad_w = math.ceil(w / ww) * ww - w
    return pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2


def window_partition(x: Array, wh: int, ww: int) -> Array:
    """[B, H, W, C] -> [B * nWh * nWw, Wh * Ww, C] with center padding."""
    b, h, w, c = x.shape
    pt, pb, pl, pr = center_pad_shape(h, w, wh, ww)
    x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    hp, wp = h + pt + pb, w + pl + pr
    x = x.reshape(b, hp // wh, wh, wp // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, c)


def window_reverse(windows: Array, b: int, h: int, w: int,
                   wh: int, ww: int) -> Array:
    """Inverse of `window_partition`, returning [B, H, W, C]."""
    pt, pb, pl, pr = center_pad_shape(h, w, wh, ww)
    hp, wp = h + pt + pb, w + pl + pr
    c = windows.shape[-1]
    x = windows.reshape(b, hp // wh, wp // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, c)
    return x[:, pt:pt + h, pl:pl + w, :]


def window_partition_cf(x: Array, wh: int, ww: int) -> Array:
    """[B, C, H, W] -> [B * nWh * nWw, C, Wh * Ww] with center padding.

    Channels-first twin of `window_partition`: the token axis stays minor
    so lane tiles hold spatial positions rather than a (often tiny) C.
    """
    b, c, h, w = x.shape
    pt, pb, pl, pr = center_pad_shape(h, w, wh, ww)
    x = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    hp, wp = h + pt + pb, w + pl + pr
    x = x.reshape(b, c, hp // wh, wh, wp // ww, ww)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, c, wh * ww)


def window_reverse_cf(windows: Array, b: int, h: int, w: int,
                      wh: int, ww: int) -> Array:
    """Inverse of `window_partition_cf`, returning [B, C, H, W]."""
    pt, pb, pl, pr = center_pad_shape(h, w, wh, ww)
    hp, wp = h + pt + pb, w + pl + pr
    c = windows.shape[1]
    x = windows.reshape(b, hp // wh, wp // ww, c, wh, ww)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    x = x.reshape(b, c, hp, wp)
    return x[:, :, pt:pt + h, pl:pl + w]








def window_pad_mask(h: int, w: int, wh: int, ww: int) -> Array:
    """Additive (-inf on padded tokens) attention mask, [nW, Wh*Ww].

    Mirrors the `with_pad_mask` branch of the reference
    (`hrformer.py:216-232`); broadcast over query positions by callers.
    """
    pt, pb, pl, pr = center_pad_shape(h, w, wh, ww)
    mask = jnp.zeros((1, h, w, 1))
    mask = jnp.pad(mask, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                   constant_values=-jnp.inf)
    return window_partition(mask, wh, ww)[..., 0]       # [nW, Wh*Ww]


def relative_position_index(wh: int, ww: int):
    """Token-pair -> bias-table row index, [Wh*Ww, Wh*Ww] (numpy, static).

    Matches the Swin-style table layout used by WindowMSA/WindowMCA
    (`hrformer.py:59-82`): table has (2Wh-1)(2Ww-1) rows; the index for the
    pair (p, q) encodes their 2-D offset.
    """
    import numpy as np
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij'))       # [2, Wh, Ww]
    flat = coords.reshape(2, -1)                        # [2, Wh*Ww]
    rel = flat[:, :, None] - flat[:, None, :]           # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)                                  # [N, N]
