"""Pallas TPU kernel: fused window attention (LSA / MWCA core).

Fuses the qkv projection, biased softmax attention over 49-token windows,
and the output projection into one kernel, keeping q/k/v and the
attention probabilities in VMEM instead of round-tripping HBM between
five XLA ops. The window axis (B * num_windows) is the grid dimension;
each program processes a block of windows with all heads.

Layout notes:
  * x arrives as [W, N, C] (windows already partitioned/layer-normed by
    the caller); inside the kernel rows are [G*N, C] so the projection
    matmuls are well-shaped for the MXU.
  * The relative-position bias is precomputed per head ([H, N, N]) by the
    caller (it is input-independent).
  * Works for both self-attention (x == y) and cross-attention (q from x,
    k/v from y) with separate projection weights.

STATUS (measured on v5e, f32, W=2576 windows, N=49):
  * C=78  H=2:  XLA 2.17 ms vs this kernel 3.89 ms (max |diff| 1.2e-3)
  * C=624 H=16: head-unrolled kernel blows up the Mosaic compile
XLA's own fusion of the 5-op attention chain is already better at
HRFuser's small widths (the MXU is underfed at d<=39 either way, and
Mosaic cannot split the lane axis for heads without the unroll). The
kernel is therefore NOT wired into the model; it is kept as a tested,
correct baseline for future tuning (e.g. d-padded layouts or fusing the
window partition itself).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_FORCE_INTERPRET = False        # set True in tests on CPU


def _attention_kernel(x_ref, y_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                      bq_ref, bk_ref, bv_ref, bo_ref, bias_ref, out_ref,
                      *, num_heads: int, scale: float):
    """Head loop is statically unrolled: Mosaic cannot reshape/split the
    lane (channel) axis, so per-head projections use [H, C, D]-shaped
    weights and each head's channels never leave the lane dimension."""
    g, n, c = x_ref.shape
    d = c // num_heads

    xb = x_ref[:].reshape(g * n, c)
    yb = y_ref[:].reshape(g * n, c)

    acc = jnp.zeros((g * n, c), jnp.float32)
    for h in range(num_heads):
        q = jnp.dot(xb, wq_ref[h], preferred_element_type=jnp.float32) \
            + bq_ref[h]
        k = jnp.dot(yb, wk_ref[h], preferred_element_type=jnp.float32) \
            + bk_ref[h]
        v = jnp.dot(yb, wv_ref[h], preferred_element_type=jnp.float32) \
            + bv_ref[h]
        q = q.reshape(g, n, d)
        k = k.reshape(g, n, d)
        v = v.reshape(g, n, d)
        attn = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, n, n]
        attn = attn + bias_ref[h][None]
        attn = jax.nn.softmax(attn, axis=-1)
        o = jax.lax.dot_general(
            attn, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, n, d]
        acc = acc + jnp.dot(o.reshape(g * n, d), wo_ref[h],
                            preferred_element_type=jnp.float32)
    acc = acc + bo_ref[:]
    out_ref[:] = acc.reshape(g, n, c).astype(out_ref.dtype)


def fused_window_attention(x: Array, y: Array, wq: Array, wk: Array,
                           wv: Array, wo: Array, bq: Array, bk: Array,
                           bv: Array, bo: Array, bias: Array,
                           num_heads: int,
                           block_windows: int = 16,
                           interpret: Optional[bool] = None) -> Array:
    """Fused attention over partitioned windows.

    Args:
        x: [W, N, C] query windows (layer-normed).
        y: [W, N, C] key/value windows (x itself for self-attention).
        wq/wk/wv/wo: [C, C] projections; bq/bk/bv/bo: [C].
        bias: [H, N, N] relative-position bias.

    Returns:
        [W, N, C] attention output (pre-residual).
    """
    w, n, c = x.shape
    assert c % num_heads == 0
    h = num_heads
    d = c // h
    scale = d ** -0.5
    interpret = _FORCE_INTERPRET if interpret is None else interpret

    g = min(block_windows, w)
    pad = (-w) % g
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        y = jnp.pad(y, ((0, pad), (0, 0), (0, 0)))
    wp = x.shape[0]

    # per-head weight layout [H, C, D] / [H, D, C] / biases [H, D]
    wq_h = wq.reshape(c, h, d).transpose(1, 0, 2)
    wk_h = wk.reshape(c, h, d).transpose(1, 0, 2)
    wv_h = wv.reshape(c, h, d).transpose(1, 0, 2)
    wo_h = wo.reshape(h, d, c)
    bq_h = bq.reshape(h, d)
    bk_h = bk.reshape(h, d)
    bv_h = bv.reshape(h, d)

    kernel = functools.partial(_attention_kernel, num_heads=num_heads,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(wp // g,),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c, d), lambda i: (0, 0, 0)),
            pl.BlockSpec((h, c, d), lambda i: (0, 0, 0)),
            pl.BlockSpec((h, c, d), lambda i: (0, 0, 0)),
            pl.BlockSpec((h, d, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((h, d), lambda i: (0, 0)),
            pl.BlockSpec((h, d), lambda i: (0, 0)),
            pl.BlockSpec((h, d), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((h, n, n), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((wp, n, c), x.dtype),
        interpret=interpret,
    )(x, y, wq_h, wk_h, wv_h, wo_h, bq_h, bk_h, bv_h, bo, bias)
    return out[:w]
