"""Pallas TPU kernels: fully-fused HRFormer / HRFuser transformer blocks.

The round-2 lesson (`ops/pallas_attention.py`) was that fusing only the
5-op attention chain loses to XLA — the win has to come from removing
*whole-block* HBM round-trips: the LN reads, the 6-D window-partition /
reverse transposes, the per-op materialisation of [B, 96, 160, C]
intermediates at 14% lane utilisation (C=18 in a 128-lane tile).  These
kernels fuse

  * kernel A (`_attn_kernel`): LN -> center-pad window partition ->
    q/k/v projection -> biased window attention -> output projection ->
    residual add, and
  * kernel B (`_ffn_kernel`): LN -> 1x1 conv (BN folded) -> GELU ->
    depthwise 3x3 (BN folded) -> GELU -> 1x1 conv (BN folded) -> GELU ->
    residual add

so one HRFormer block touches HBM exactly four times (read + write per
kernel) instead of dozens.

Window handling without any transpose: kernel A's grid is
(batch, window-rows); one program owns a full window-row slab
[ws, Wp, C] flattened to T = ws*Wp tokens in natural (row, col) order.
Window membership is then *pure masking*: a precomputed [heads, T, T]
matrix carries the relative-position bias for in-window pairs and -1e9
for cross-window pairs, so the [T, C] @ [C, T] logits dot covers all
windows of the slab at once (the v3 RoIAlign lesson: at tiny widths the
MXU is issue-bound, so burn idle FLOPs on one big dot instead of
issuing per-window ones).

Padding semantics match `ops/window.py` / the reference
(`mmdet/models/backbones/hrformer.py:200-236`): features are
center-padded (extra pixel bottom/right) with zeros *after* the LN, so
the kernels apply LN per token and then zero the pad ring via an iota
mask.  The FFN's depthwise conv reproduces torch zero padding by
masking the hidden activation ring before the 9 shifted FMAs.

GELU is exact (erf-based, `approximate=False` parity): Mosaic has no
erf primitive, so `_erf` uses the Abramowitz-Stegun 7.1.26 rational
approximation (max abs err 2.7e-6, gelu err < 1e-6 — verified against
`jax.lax.erf`).

Reference parity surface: `HRFormerBlock` (`hrformer.py:298-386`),
`HRFuserFusionBlock` (`hrfuser_hrformer_based.py:305-317`), `CrossFFN`
(`hrformer.py:239-295`).  Eval-mode only (BatchNorms folded with
running stats; DropPath/Dropout identity).

MEASURED RESULT (documented negative, like RoIAlign v2): at the
branch-0 money shape ([8, 96, 160, 18], bf16, real chip, 10-block
chain inside one jit so the axon per-call input-relayout overhead is
amortized out — see `tools/probe_fused_block.py`) the fused path ties
XLA: flax 1.92 ms/block vs fused 2.06 ms/block.  XLA's own fusion of
the block chain is already near the compute bound set by C=18 lane
utilisation; the kernels buy back the HBM round-trips but pay the same
VPU/MXU costs (erf GELU, K=18 dots, t^2 masked logits).  Default is
therefore `fused_block='off'` (`hr_config.py`); the kernels stay as a
parity-tested experimental path (`tests/test_pallas_block.py`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hrfuser_tpu.ops.window import center_pad_shape, relative_position_index

Array = jnp.ndarray

_LN_EPS = 1e-6
_BN_EPS = 1e-5
_NEG = -1e9


# ---------------------------------------------------------------------------
# in-kernel math helpers
# ---------------------------------------------------------------------------

def _erf(x: Array) -> Array:
    """Abramowitz-Stegun 7.1.26 erf (f32), max abs err 2.7e-6."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x: Array) -> Array:
    """Exact (erf) GELU in f32 — `nn.gelu(approximate=False)` parity."""
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _ln(flat: Array, p_ref) -> Array:
    """Per-token LayerNorm over lanes; p_ref is [2, C] f32 (scale; bias).

    Matches `layers.common.LayerNorm` incl. the zero-variance guard."""
    vf = flat.astype(jnp.float32)
    mu = jnp.mean(vf, axis=-1, keepdims=True)
    ce = vf - mu
    var = jnp.mean(ce * ce, axis=-1, keepdims=True)
    inv = jnp.where(var > 0.0, jax.lax.rsqrt(var + _LN_EPS), 0.0)
    return ce * inv * p_ref[0] + p_ref[1]


# ---------------------------------------------------------------------------
# kernel A: LN + window attention + projection + residual
# ---------------------------------------------------------------------------

def _attn_kernel(xq_ref, xkv_ref, res_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 bq_ref, bk_ref, bv_ref, bo_ref, lnq_ref, lnkv_ref,
                 bias_ref, out_ref, *, num_heads: int, scale: float,
                 pads, hw, wp: int, add_kv: bool):
    pt, pl_ = pads
    h_real, w_real = hw
    _, _, t, c = xq_ref.shape                # [1, 1, T, C] slab, T = ws*wp
    ws = t // wp
    dt = out_ref.dtype

    xq = xq_ref[0, 0]
    xkv = xkv_ref[0, 0]

    # pad-ring mask in token order (row-major over the slab)
    pos = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    col = pos % wp
    grow = pl.program_id(1) * ws + pos // wp
    valid = ((col >= pl_) & (col < pl_ + w_real)
             & (grow >= pt) & (grow < pt + h_real))
    maskf = valid.astype(jnp.float32)

    qn = _ln(xq, lnq_ref).astype(dt)
    # reference pads the *LN output* with zeros -> zero the k/v ring
    kn = (_ln(xkv, lnkv_ref) * maskf).astype(dt)

    acc = jnp.zeros((t, c), jnp.float32)
    for h in range(num_heads):
        q = jnp.dot(qn, wq_ref[h],
                    preferred_element_type=jnp.float32).astype(dt) + bq_ref[h]
        k = jnp.dot(kn, wk_ref[h],
                    preferred_element_type=jnp.float32).astype(dt) + bk_ref[h]
        v = jnp.dot(kn, wv_ref[h],
                    preferred_element_type=jnp.float32).astype(dt) + bv_ref[h]
        logits = jax.lax.dot_general(
            q * scale, k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [t, t]
        logits = logits + bias_ref[h].astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(dt)
        acc = acc + jnp.dot(o, wo_ref[h],
                            preferred_element_type=jnp.float32)
    attn = (acc.astype(dt) + bo_ref[0]) * maskf.astype(dt)
    out = res_ref[0, 0] + attn
    if add_kv:
        out = out + xkv
    out_ref[0, 0] = out


def build_attn_bias(table: Array, num_heads: int, window: int, wp: int,
                    dtype) -> Array:
    """Combined RPE bias + cross-window mask, [heads, T, T], T = window*wp.

    Token order is the slab's natural row-major (row, col); window
    membership is col // window, within-window position is
    (row * window + col % window) — identical indexing to the Swin-style
    table lookup in `RelativePositionBias` (`hrformer.py:59-82`)."""
    n = window * window
    idx = relative_position_index(window, window)            # numpy [n, n]
    bias = table[idx.reshape(-1)].reshape(n, n, num_heads)
    bias = bias.transpose(2, 0, 1)                           # [h, n, n]
    t = jnp.arange(window * wp)
    pos = (t // wp) * window + (t % wp) % window
    win = (t % wp) // window
    full = bias[:, pos, :][:, :, pos]                        # [h, T, T]
    same = win[:, None] == win[None, :]
    return jnp.where(same[None], full, _NEG).astype(dtype)


def _stack_heads(kernel: Array, bias: Array, num_heads: int):
    """[C, C] projection -> per-head [h, C, d] weights / [h, 1, d] biases."""
    c = kernel.shape[0]
    d = c // num_heads
    w = kernel.reshape(c, num_heads, d).transpose(1, 0, 2)
    b = bias.reshape(num_heads, 1, d)
    return w, b


def fused_window_attention(xq: Array, xkv: Array, res: Array,
                           wq, bq, wk, bk, wv, bv, wo, bo,
                           lnq, lnkv, bias_full: Array, *,
                           num_heads: int, window: int,
                           pads, hw, add_kv: bool,
                           interpret: bool = False) -> Array:
    """res + proj(window_attention(LN(xq), LN(xkv))) on padded slabs.

    All array args pre-padded to [B, Hp, Wp, C]; weights per-head
    ([h, C, d] / [h, 1, d] / [h, d, C]); lnq/lnkv [2, C] f32;
    bias_full [h, T, T] from `build_attn_bias`.
    """
    b, hp, wp, c = xq.shape
    ws = window
    t = ws * wp
    d = c // num_heads
    dt = xq.dtype
    ns = hp // ws
    grid = (b, ns)
    # flatten each window-row slab to [T, C] tokens XLA-side (a pure
    # row-major view; the same reshape in-kernel is an unsupported /
    # relayout-heavy shape cast whenever wp is not tile-aligned)
    xq = xq.reshape(b, ns, t, c)
    xkv = xkv.reshape(b, ns, t, c)
    res = res.reshape(b, ns, t, c)

    slab = pl.BlockSpec((1, 1, t, c), lambda i, j: (i, j, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))

    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, scale=d ** -0.5,
        pads=pads, hw=hw, wp=wp, add_kv=add_kv)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[slab, slab, slab,
                  const((num_heads, c, d)), const((num_heads, c, d)),
                  const((num_heads, c, d)), const((num_heads, d, c)),
                  const((num_heads, 1, d)), const((num_heads, 1, d)),
                  const((num_heads, 1, d)), const((1, c)),
                  const((2, c)), const((2, c)),
                  const((num_heads, t, t))],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((b, ns, t, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xq, xkv, res,
      wq.astype(dt), wk.astype(dt), wv.astype(dt), wo.astype(dt),
      bq.astype(dt), bk.astype(dt), bv.astype(dt),
      bo.reshape(1, c).astype(dt), lnq, lnkv, bias_full)
    return out.reshape(b, hp, wp, c)


# ---------------------------------------------------------------------------
# kernel B: LN + CrossFFN (BN folded) + residual
# ---------------------------------------------------------------------------

def _ffn_kernel(x1_ref, x2_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                w2_ref, b2_ref, ln_ref, out_ref, *, h_real: int,
                wpad: int):
    """Flat-token formulation: every array is 2-D [tokens, channels].

    Tokens are the row-major flattening of the conv-padded frame
    [rows, wpad]; the ring columns are part of the token stream, which
    makes the depthwise 3x3 conv exact under *flat sublane shifts*: a
    tap that crosses a row boundary reads a ring token whose hidden
    activation is masked to zero — precisely the conv's zero padding.
    (In-kernel [rows, wpad, C] reshapes would relayout whenever wpad is
    not a sublane-tile multiple; flat 2-D avoids them entirely.)
    """
    _, rt, c = x1_ref.shape                  # rt = r * wpad flat tokens
    r = rt // wpad
    ch = w1_ref.shape[1]
    dt = out_ref.dtype

    xa = jnp.concatenate([x1_ref[0], x2_ref[0][:2 * wpad]], axis=0)
    tt = rt + 2 * wpad

    # conv-ring mask: zero-pad positions of the torch 3x3 conv
    pos = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    colp = pos % wpad
    growp = pl.program_id(1) * r + pos // wpad
    interior = ((colp > 0) & (colp < wpad - 1)
                & (growp > 0) & (growp < h_real + 1))
    maskf = interior.astype(jnp.float32)

    h1 = jnp.dot(_ln(xa, ln_ref).astype(dt), w1_ref[:],
                 preferred_element_type=jnp.float32) + b1_ref[0]
    hm = (_gelu(h1) * maskf).astype(dt)      # [tt, ch]
    # output token p sits at conv-padded coords (1 + p//wpad, p%wpad);
    # tap (dy, dx) reads token p + dy*wpad + (dx-1).  Shift the stream
    # one token right (zero prepend) so the slice offset dy*wpad + dx is
    # never negative; the dy=2/dx=2 taps of the last ring-column outputs
    # (discarded by the wrapper) index past the halo — zero-extend.
    hm = jnp.concatenate([jnp.zeros((1, ch), dt), hm,
                          jnp.zeros((2, ch), dt)], axis=0)

    # taps: out[p] = sum_{dy,dx} hm_shifted[p + dy*wpad + dx] * w[dy,dx]
    acc = jnp.zeros((rt, ch), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            ofs = dy * wpad + dx
            acc = acc + (hm[ofs:ofs + rt, :].astype(jnp.float32)
                         * wdw_ref[3 * dy + dx])
    acc = acc + bdw_ref[0]
    o = jnp.dot(_gelu(acc).astype(dt), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[0]
    o = _gelu(o).astype(dt)

    # residual: conv-padded rows 1..r+1 = xa tokens [wpad, wpad+rt);
    # ring-column outputs are garbage and sliced off by the wrapper
    out_ref[0] = xa[wpad:wpad + rt, :] + o


def _fold_bn(p: Dict[str, Array], s: Dict[str, Array]):
    scale = p['scale'] * jax.lax.rsqrt(s['var'] + _BN_EPS)
    shift = p['bias'] - s['mean'] * scale
    return scale, shift


def _pick_chunk(h: int) -> int:
    """Rows per FFN grid step. Multiples of 8 only: the halo BlockSpec
    block is r//8 * (8 rows), and Mosaic requires the flat-token block's
    sublane dim (rows * wpad) to be 8-divisible for any wpad parity."""
    if h >= 32:
        return 32
    if h >= 16:
        return 16
    return 8


def fused_cross_ffn(x: Array, ffn_p: Dict[str, Any], ffn_s: Dict[str, Any],
                    ln_p: Dict[str, Array], *,
                    interpret: bool = False) -> Array:
    """x + CrossFFN(LN(x)) — BNs folded with running stats (eval mode).

    x: [B, H, W, C] unpadded. Param/stat trees use the flax submodule
    names of `layers.attention.CrossFFN` (fc1/norm1/dw/norm2/fc2/norm3).
    """
    b, h, w, c = x.shape
    dt = x.dtype
    ch = ffn_p['fc1']['kernel'].shape[-1]

    s1, t1 = _fold_bn(ffn_p['norm1']['bn'], ffn_s['norm1']['bn'])
    s2, t2 = _fold_bn(ffn_p['norm2']['bn'], ffn_s['norm2']['bn'])
    s3, t3 = _fold_bn(ffn_p['norm3']['bn'], ffn_s['norm3']['bn'])
    w1 = (ffn_p['fc1']['kernel'][0, 0] * s1[None, :]).astype(dt)
    b1 = (ffn_p['fc1']['bias'] * s1 + t1).reshape(1, ch).astype(jnp.float32)
    wdw = (ffn_p['dw']['kernel'][:, :, 0, :] * s2[None, None, :]
           ).reshape(9, ch).astype(jnp.float32)
    bdw = (ffn_p['dw']['bias'] * s2 + t2).reshape(1, ch).astype(jnp.float32)
    w2 = (ffn_p['fc2']['kernel'][0, 0] * s3[None, :]).astype(dt)
    b2 = (ffn_p['fc2']['bias'] * s3 + t3).reshape(1, c).astype(jnp.float32)
    ln = jnp.stack([ln_p['scale'], ln_p['bias']]).astype(jnp.float32)

    # round rows up to a chunk multiple; the excess rows are masked by
    # the conv-ring test (growp <= h_real) and sliced off at the end
    r = _pick_chunk(h)
    h_eff = -(-h // r) * r
    wpad = w + 2
    rt = r * wpad
    # conv-padded frame flattened to tokens, bottom-extended so the
    # 8-row halo block below block j exists for the last chunk (only its
    # first 2*wpad tokens — padded rows (j+1)*r, (j+1)*r+1 — are read)
    xc = jnp.pad(x, ((0, 0), (1, h_eff - h + r - 1), (1, 1), (0, 0)))
    xc = xc.reshape(b, (h_eff + r) * wpad, c)
    grid = (b, h_eff // r)
    blk = pl.BlockSpec((1, rt, c), lambda i, j: (i, j, 0))
    halo = pl.BlockSpec((1, 8 * wpad, c), lambda i, j: (i, (j + 1) * (r // 8), 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))

    kernel = functools.partial(_ffn_kernel, h_real=h, wpad=wpad)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, halo,
                  const((c, ch)), const((1, ch)),
                  const((9, ch)), const((1, ch)),
                  const((ch, c)), const((1, c)),
                  const((2, c))],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, h_eff * wpad, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xc, xc, w1, b1, wdw, bdw, w2, b2, ln)
    return out.reshape(b, h_eff, wpad, c)[:, :h, 1:w + 1, :]


# ---------------------------------------------------------------------------
# block-level wrappers (consume flax variable subtrees)
# ---------------------------------------------------------------------------

def _attn_weights(attn_p: Dict[str, Any], num_heads: int, fused_qkv: bool):
    if fused_qkv:
        k = attn_p['qkv']['kernel']
        bias = attn_p['qkv']['bias']
        c = k.shape[0]
        wq, bq = _stack_heads(k[:, :c], bias[:c], num_heads)
        wk, bk = _stack_heads(k[:, c:2 * c], bias[c:2 * c], num_heads)
        wv, bv = _stack_heads(k[:, 2 * c:], bias[2 * c:], num_heads)
    else:
        wq, bq = _stack_heads(attn_p['q_proj']['kernel'],
                              attn_p['q_proj']['bias'], num_heads)
        wk, bk = _stack_heads(attn_p['k_proj']['kernel'],
                              attn_p['k_proj']['bias'], num_heads)
        wv, bv = _stack_heads(attn_p['v_proj']['kernel'],
                              attn_p['v_proj']['bias'], num_heads)
    c = wq.shape[1]
    d = c // num_heads
    wo = attn_p['out_proj']['kernel'].reshape(num_heads, d, c)
    bo = attn_p['out_proj']['bias']
    return wq, bq, wk, bk, wv, bv, wo, bo


def _ln_pair(p: Dict[str, Array]) -> Array:
    return jnp.stack([p['scale'], p['bias']]).astype(jnp.float32)


def fused_hrformer_block(x: Array, variables: Dict[str, Any], *,
                         num_heads: int, window: int = 7,
                         interpret: bool = False) -> Array:
    """Eval-mode `HRFormerBlock` forward via the two fused kernels.

    `variables` is the block's own variable dict (params + batch_stats),
    i.e. `self.variables` of a bound `HRFormerBlock`.
    """
    p = variables['params']
    bs = variables['batch_stats']
    b, h, w, c = x.shape
    pt, pb, pl_, pr = center_pad_shape(h, w, window, window)
    wp = w + pl_ + pr

    wq, bq, wk, bk, wv, bv, wo, bo = _attn_weights(p['attn'], num_heads,
                                                   fused_qkv=True)
    bias_full = build_attn_bias(
        p['attn']['rpe']['relative_position_bias_table'],
        num_heads, window, wp, x.dtype)
    lnq = _ln_pair(p['norm1'])

    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    x1p = fused_window_attention(
        xp, xp, xp, wq, bq, wk, bk, wv, bv, wo, bo, lnq, lnq, bias_full,
        num_heads=num_heads, window=window, pads=(pt, pl_), hw=(h, w),
        add_kv=False, interpret=interpret)
    x1 = x1p[:, pt:pt + h, pl_:pl_ + w, :]

    return fused_cross_ffn(x1, p['ffn'], bs['ffn'], p['norm2'],
                           interpret=interpret)


def fused_fusion_block(x: Array, mods: List[Array],
                       variables: Dict[str, Any], *,
                       num_heads: int, window: int = 7,
                       interpret: bool = False) -> Array:
    """Eval-mode `HRFuserFusionBlock` forward via the fused kernels.

    Residual semantics of `hrfuser_hrformer_based.py:305-317`: every
    modality's MWCA queries the same frozen LN of the block input; the
    raw modality feature is added too (`add_kv=True` folds that into
    kernel A); a shared CrossFFN closes the block.
    """
    p = variables['params']
    bs = variables['batch_stats']
    b, h, w, c = x.shape
    pt, pb, pl_, pr = center_pad_shape(h, w, window, window)
    wp = w + pl_ + pr

    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    res = xp
    for k in range(len(mods)):
        attn_p = p[f'attn_{k}']
        wq, bq, wk, bk, wv, bv, wo, bo = _attn_weights(attn_p, num_heads,
                                                       fused_qkv=False)
        bias_full = build_attn_bias(
            attn_p['rpe']['relative_position_bias_table'],
            num_heads, window, wp, x.dtype)
        zp = jnp.pad(mods[k], ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
        res = fused_window_attention(
            xp, zp, res, wq, bq, wk, bk, wv, bv, wo, bo,
            _ln_pair(p[f'norm1_{k}']), _ln_pair(p[f'norm2_{k}']),
            bias_full, num_heads=num_heads, window=window,
            pads=(pt, pl_), hw=(h, w), add_kv=True, interpret=interpret)
    x1 = res[:, pt:pt + h, pl_:pl_ + w, :]

    return fused_cross_ffn(x1, p['ffn'], bs['ffn'], p['norm3'],
                           interpret=interpret)
