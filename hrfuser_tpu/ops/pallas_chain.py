"""Pallas TPU chain kernel: N HRFormer blocks in one dense-packed pass.

WHY (perf/r4_08 floor analysis): branch-0 of the r640 step moves 27.8 GB
of VMEM-resident intermediates at an effective 458 GB/s — 60.75 ms that
is ~3.5x PADDING on thin-channel tensors (C=18 windows [2576, 18, 49]
tile to (32, 128); CF maps pad 1.8x). XLA cannot escape this: any
[.., 49]-minor window layout wastes 2.6x in lanes, any [.., 18]-minor
layout 7x. The r4 per-block fused kernels (`ops/pallas_block.py`) kept
the same thin internal layout and only tied XLA (-9% end-to-end,
perf/r4_05).

This kernel changes the DECOMPOSITION, not the tuning:

  * One kernel call runs a WHOLE chain of L blocks (a module's block
    pair, or a 2-6 block single-branch modality stage) with the
    residual stream resident in VMEM — zero HBM round-trips at block
    seams (the r4 fused-block loss mechanism).
  * Internal layout is column-major window-grouped channels-first
    `[C, nWh * ng * Tg]`: tokens ordered (window-row, column, row)
    so every 7x7 window is a CONTIGUOUS 49-lane run, groups of
    `group_windows` windows pad to a 128-multiple Tg. Elementwise
    chains, LayerNorms (sublane reductions) and the 1x1 projections
    (single [C, C] @ [C, N] MXU dots over ALL tokens) run ~100%
    lane-dense — the whole point.
  * Window attention runs per group as ONE [Tg, Tg] masked-logits dot
    behind a `fori_loop` with 128-aligned dynamic lane slices; the
    block-diagonal (in-window) RPE bias + cross-window/dead-lane -1e9
    mask is a single precomputed [Tg, Tg] constant per (block, head).
    Waste is bounded by `group_windows` (default 8: ~8x logits FLOPs
    on an MXU that is idle here anyway) instead of the full-slab
    T^2 = 1127^2 that made slab attention a 4.8x loser (perf/r4_07).
  * The CrossFFN depthwise 3x3 is 16 masked f32 lane-rolls (factored:
    3 row-shifted streams x per-stream column rolls — each spatial
    neighbour offset is a fixed lane delta in this layout, with 2
    crossing variants per axis, and the two axes commute); torch
    zero-padding falls out of masking the hidden ring to zero, as in
    `ops/pallas_block.py`.
  * Entry/exit relayout (row-major CF slabs <-> the packed token
    order) is a 0/1 permutation matmul per window-row slab on the MXU
    — paid once per CHAIN, not per block (the 6-D partition/reverse
    transposes the flax path pays ~11 ms/step for, perf/r4_03).
  * Independent same-geometry streams (the per-modality stage_b/c
    chains) stack on the grid's leading axis with per-(stream, block)
    weights, halving kernel-call count.

Eval-mode only (BNs folded with running stats, DropPath/Dropout
identity); training keeps the flax path. Numerics: LN/softmax/dot
accumulation in f32, residual stream bf16 (or f32 when the input is
f32) — same staging as the flax bf16 path, parity-tested in
`tests/test_pallas_chain.py`.

Reference parity surface: `HRFormerBlock` (`mmdet/models/backbones/
hrformer.py:298-386`), `CrossFFN` (`hrformer.py:239-295`),
`LocalWindowSelfAttention` center-pad semantics (`hrformer.py:200-236`);
fusion-block variant (`HRFuserFusionBlock`,
`hrfuser_hrformer_based.py:305-317`) in `fusion_chain` below.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hrfuser_tpu.ops.pallas_block import _erf, _fold_bn
from hrfuser_tpu.ops.window import center_pad_shape, relative_position_index

Array = jnp.ndarray

_LN_EPS = 1e-6
_NEG = -1e9


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_chain(mode: str, train: bool) -> bool:
    """Map the `chain_kernel` knob ('off' | 'auto' | 'on') per call.

    The kernel is eval-only (no custom VJP) and, under 'auto',
    TPU-only (interpret mode is orders of magnitude too slow on CPU —
    the same routing rule as the RoIAlign kernel)."""
    if train or mode == 'off':
        return False
    if mode == 'on':
        return True
    return jax.default_backend() == 'tpu'


# VMEM the chain kernel may claim for its resident scratches. Above
# this the router falls back to flax: HRFuser-B's branch-0 chain
# (C=78, hidden 312) measured a 239 MB-of-128 MB VMEM compile OOM
# when routed through the kernel unconditionally (r5).
_SCRATCH_BUDGET = 40 * 1024 * 1024


def chain_fits(h: int, w: int, c: int, ch: int, ws: int = 7,
               group_windows: int = 13, num_heads: int = 1) -> bool:
    """True when the kernel can safely run this geometry.

    Three gates:
      * validated channel family: c <= 144 (every HRFuser-T /
        HRFormer-T branch). HRFuser-B's geometries (c = 78..624)
        crash the TPU worker at runtime with an opaque kernel fault —
        first suspected to be its odd head dim (d=39: odd bf16
        sublane offsets for the per-head slices), but the crash
        SURVIVES the stackers' even-d padding (d 39->40), so the
        trigger lies elsewhere in the untested large-C territory.
        Until it is root-caused on hardware, B routes to flax.
      * even head dim (cheap and principled; the padding machinery
        that lifts this is in the stackers and parity-tested).
      * VMEM: scratches x/qln [C, N] + fused qkv [3*c_att, N] + attn
        [c_att, N] bf16 + hidden [Ch, N] bf16 + f32 dw accumulator
        [Ch, N] within _SCRATCH_BUDGET (B's branch-0 chain
        compile-OOMed at 239M/128M without this).
    """
    if c > 144:
        return False
    d = c // max(num_heads, 1)
    c_att = max(num_heads, 1) * (d + (d % 2))
    geo = _geometry(h, w, ws, group_windows)
    pad16 = lambda x: -(-x // 16) * 16
    bytes_ = (pad16(c) * 2 + pad16(3 * c_att) + pad16(c_att)
              + pad16(ch)) * 2 * geo.n + pad16(ch) * 4 * geo.n
    return bytes_ <= _SCRATCH_BUDGET


class ChainGeometry:
    """Static token-layout bookkeeping for one (H, W, ws, g) shape.

    Token order: t = ((wr * ng + gi) * Tg) + kg * ws + r, where
    wr = window row, gi = window-column group, kg = column within the
    group's ws*g payload columns, r = row within the window. Windows
    are contiguous 49-lane runs; lanes [g*ws*ws, Tg) of each group are
    dead padding.
    """

    def __init__(self, h: int, w: int, ws: int = 7, group_windows: int = 13):
        pt, pb, plft, pr = center_pad_shape(h, w, ws, ws)
        self.pt, self.pl = pt, plft
        self.hp = h + pt + pb                      # padded rows
        self.wp = w + plft + pr                    # padded cols (real ring)
        self.nwh = self.hp // ws
        self.nww = self.wp // ws
        # never use groups wider than the window grid (small branches
        # would pay pure dead lanes); g=13 beats 8 at branch-0 (49*13
        # = 637 -> Tg 640: 0.5% lane pad vs 28% at g=8, N -17%)
        group_windows = min(group_windows, self.nww)
        self.h, self.w, self.ws, self.g = h, w, ws, group_windows
        self.ng = _rup(self.nww, group_windows) // group_windows
        self.tg = _rup(group_windows * ws * ws, 128)
        self.cols_g = group_windows * ws           # payload cols per group
        self.n = self.nwh * self.ng * self.tg      # resident lane count
        self.ngroups = self.nwh * self.ng
        # slab sizes for the entry/exit permutation (one window-row)
        self.ts_in = ws * self.wp                  # row-major slab tokens
        self.ts_out = self.ng * self.tg            # packed slab lanes

    def token_coords(self) -> np.ndarray:
        """[N, 2] padded-grid (row, col) per token; (-1, -1) for dead."""
        out = np.full((self.n, 2), -1, np.int64)
        ws, g = self.ws, self.g
        for wr in range(self.nwh):
            for gi in range(self.ng):
                base = (wr * self.ng + gi) * self.tg
                for kg in range(self.cols_g):
                    col = gi * self.cols_g + kg
                    if col >= self.wp:
                        continue
                    for r in range(ws):
                        out[base + kg * ws + r] = (wr * ws + r, col)
        return out

    def valid_mask(self) -> np.ndarray:
        """[1, N] 1.0 where the token is a REAL (unpadded) pixel."""
        rc = self.token_coords()
        ok = ((rc[:, 0] >= self.pt) & (rc[:, 0] < self.pt + self.h)
              & (rc[:, 1] >= self.pl) & (rc[:, 1] < self.pl + self.w))
        return ok.astype(np.float32)[None]

    def entry_perm(self) -> np.ndarray:
        """[ts_in, ts_out] 0/1: row-major CF slab -> packed token order.

        Input slab token u = r * wp + col (the natural flattening of
        [ws, wp]); output lane = packed index within the slab.
        """
        p = np.zeros((self.ts_in, self.ts_out), np.float32)
        ws = self.ws
        for gi in range(self.ng):
            for kg in range(self.cols_g):
                col = gi * self.cols_g + kg
                if col >= self.wp:
                    continue
                for r in range(ws):
                    p[r * self.wp + col, gi * self.tg + kg * ws + r] = 1.0
        return p

    def exit_perm(self) -> np.ndarray:
        return self.entry_perm().T.copy()

    def dw_variants(self):
        """(deltas [V], masks [V, N]) for the 3x3 depthwise taps.

        Each spatial tap (dy, dx) decomposes into up to 4 fixed lane
        deltas (in/cross window-row x in/cross group), with disjoint
        output masks; `tap_of` maps each variant to its 3x3 tap index
        3*(dy+1) + (dx+1). out[t] += w[tap] * hidden[t + delta].
        """
        rc = self.token_coords()
        pos = {tuple(p): i for i, p in enumerate(rc) if p[0] >= 0}
        deltas: List[int] = []
        taps: List[int] = []
        masks: List[np.ndarray] = []
        acc: Dict[tuple, int] = {}
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                by_delta: Dict[int, np.ndarray] = {}
                for t in range(self.n):
                    r0, c0 = rc[t]
                    if r0 < 0:
                        continue
                    src = pos.get((r0 + dy, c0 + dx))
                    if src is None:
                        continue           # zero pad beyond the ring
                    d = src - t
                    m = by_delta.setdefault(d, np.zeros(self.n, np.float32))
                    m[t] = 1.0
                for d, m in sorted(by_delta.items()):
                    key = (3 * (dy + 1) + (dx + 1), d)
                    acc[key] = len(deltas)
                    deltas.append(d)
                    taps.append(key[0])
                    masks.append(m)
        return (np.asarray(deltas, np.int64), np.asarray(taps, np.int64),
                np.stack(masks))

    def dw_factored(self):
        """Factored 3x3 taps: 16 rolls instead of 25.

        Row (dy) and column (dx) lane-shifts commute in this layout
        (dx deltas preserve (row, r), dy deltas preserve (col, group)),
        and the real region is a rectangle, so the depthwise conv
        factors into 3 row-shifted STREAMS (dy = -1/0/+1; the +-1
        streams are 2 masked rolls each) followed by per-stream dx
        rolls whose masks are the shared (0, dx) variant masks — the
        dy-masks ride along inside the streams.

        Returns (dy_vars, dx_vars): dy_vars[j] for dy = -1/+1 is a list
        of (delta, mask [N]); dx_vars is a list of (delta, mask [N],
        dx) for dx in (-1, +1).
        """
        deltas, taps, masks = self.dw_variants()
        dy_vars = {-1: [], 1: []}
        dx_vars = []
        for d, tap, m in zip(deltas, taps, masks):
            dy, dx = divmod(int(tap), 3)
            dy, dx = dy - 1, dx - 1
            if dx == 0 and dy != 0:
                dy_vars[dy].append((int(d), m))
            elif dy == 0 and dx != 0:
                dx_vars.append((int(d), m, dx))
        return dy_vars, dx_vars


@functools.lru_cache(maxsize=None)
def _geometry(h, w, ws, g):
    return ChainGeometry(h, w, ws, g)


def build_group_bias(table: Array, num_heads: int, ws: int, g: int,
                     tg: int, dtype=jnp.float32) -> Array:
    """[nh, Tg, Tg] in-window RPE bias + cross-window/dead -1e9 mask.

    Identical indexing to `RelativePositionBias` (`hrformer.py:59-82`);
    group structure is the same for every group, so one constant per
    (block, head) serves all of them.  Token order within the group is
    (window, col, row) — position (cc, r) maps to in-window index
    r * ws + cc of the Swin-style table.
    """
    n = ws * ws
    idx = relative_position_index(ws, ws)                # numpy [n, n]
    bias = table[idx.reshape(-1)].reshape(n, n, num_heads)
    bias = bias.transpose(2, 0, 1)                       # [nh, n, n]
    t = np.arange(tg)
    win = t // n
    cc = (t % n) // ws
    r = t % ws
    swin = r * ws + cc                                   # in-window index
    alive = t < g * n
    full = bias[:, swin, :][:, :, swin]                  # [nh, Tg, Tg]
    same = (win[:, None] == win[None, :]) & alive[:, None] & alive[None, :]
    return jnp.where(jnp.asarray(same)[None], full, _NEG).astype(dtype)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _ln_cf(x_ref_val, g_ref, b_ref):
    """LayerNorm over the sublane (channel) axis of [C, N] -> f32."""
    xf = x_ref_val.astype(jnp.float32)
    mu = jnp.mean(xf, axis=0, keepdims=True)
    ce = xf - mu
    var = jnp.mean(ce * ce, axis=0, keepdims=True)
    inv = jnp.where(var > 0.0, jax.lax.rsqrt(var + _LN_EPS), 0.0)
    return ce * inv * g_ref[:] + b_ref[:]


def _cdot(w, x, out_f32=True):
    """[Cin, Cout] x [Cin, N] -> [Cout, N] (contract sublanes)."""
    r = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return r if out_f32 else r


def _attn_groups(qkvb, attnb, bias2d, *, num_heads, dh, c_att, tg,
                 ngroups, dt):
    """Grouped masked-logits window attention.

    `qkvb` holds q at rows [0, c_att), k at [c_att, 2*c_att), v at
    [2*c_att, 3*c_att), where c_att = num_heads * dh and dh is the
    head dim padded to EVEN (odd head dims — HRFuser-B's d=39 — put
    per-head sublane slices at odd bf16 offsets, which crashed the
    TPU worker; the stackers pad with zero columns/rows, which are
    mathematically inert through logits, softmax and pv). The d^-0.5
    scale is pre-folded into Wq/bq by the param stackers."""

    def group_body(i, carry):
        sl = pl.ds(i * tg, tg)
        for h in range(num_heads):
            rows = slice(h * dh, (h + 1) * dh)
            q = qkvb[slice(h * dh, (h + 1) * dh), sl]
            k = qkvb[slice(c_att + h * dh, c_att + (h + 1) * dh), sl]
            v = qkvb[slice(2 * c_att + h * dh,
                           2 * c_att + (h + 1) * dh), sl]
            logits = jax.lax.dot_general(
                q, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [Tg, Tg]
            logits = logits + bias2d[h].astype(jnp.float32)
            m = jnp.max(logits, axis=1, keepdims=True)
            # f32 softmax: the bf16-exp variant (halve [Tg, Tg]
            # traffic) measured 66.95 -> 65.79 fps full-model — the
            # extra casts cost more than the saved bytes (r5 negative)
            e = jnp.exp(logits - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(dt)
            o = jax.lax.dot_general(
                v, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [d, Tg]
            attnb[rows, sl] = o.astype(dt)
        return carry

    jax.lax.fori_loop(0, ngroups, group_body, 0)


def _ffn_segment(xval, valid, roll, ln2_ref, w1_ref, b1_ref, wdw_ref,
                 bdw_ref, w2_ref, b2_ref, dwmask_ref, hid, accf, *,
                 ch, n, dt, dw_deltas, dw_taps, skip=''):
    """LN -> CrossFFN (BNs folded, factored dw) on packed [C, N].

    Returns the FFN output (pre-residual), f32."""
    h2 = _ln_cf(xval, ln2_ref[0, 0], ln2_ref[0, 1])
    hraw = _cdot(w1_ref[0], h2.astype(dt)) + b1_ref[0]
    g1 = 0.5 * hraw * (1.0 + _erf(hraw * np.float32(1 / np.sqrt(2.0))))
    hid[:] = (g1 * valid).astype(dt)                       # torch zero pad

    # factored dw conv: 3 row-shifted streams then per-stream column
    # rolls (16 f32 rolls instead of 25 — ChainGeometry.dw_factored);
    # dwmask rows: dy-variant masks first, then dx-variant masks
    hval = hid[:]
    acc = jnp.broadcast_to(bdw_ref[0], (ch, n))
    if 'dw' not in skip:
        n_dym = len(dw_deltas[0]) + len(dw_deltas[1])
        streams = []
        mi = 0
        for j, dy in enumerate((-1, 1)):
            sacc = jnp.zeros((ch, n), jnp.float32)
            for d in dw_deltas[j]:
                sacc = sacc + (roll(hval, -d).astype(jnp.float32)
                               * dwmask_ref[mi:mi + 1, :])
                mi += 1
            streams.append((sacc, dy))
        streams.insert(1, (hval.astype(jnp.float32), 0))
        for sval, dy in streams:
            acc = acc + sval * wdw_ref[0, :, 3 * (dy + 1) + 1:
                                       3 * (dy + 1) + 2]
        for j, (d, dx) in enumerate(dw_taps):
            m = dwmask_ref[n_dym + j:n_dym + j + 1, :]
            for sval, dy in streams:
                tap = 3 * (dy + 1) + (dx + 1)
                acc = acc + (roll(sval, -d) * m
                             * wdw_ref[0, :, tap:tap + 1])
    accf[:] = acc
    g2 = 0.5 * accf[:] * (1.0 + _erf(accf[:] * np.float32(1 / np.sqrt(2.0))))
    o2 = _cdot(w2_ref[0], g2.astype(dt)) + b2_ref[0]
    return 0.5 * o2 * (1.0 + _erf(o2 * np.float32(1 / np.sqrt(2.0))))


def _chain_kernel(x_ref, pin_ref, pout_ref, valid_ref, dwmask_ref,
                  ln1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  ln2_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                  w2_ref, b2_ref, bias_ref, out_ref,
                  xres, qln, qkvb, attnb, hid, accf,
                  *, num_blocks: int, num_heads: int, c: int, ch: int,
                  c_att: int, geo_key, dw_deltas, dw_taps,
                  interpret: bool, skip: str = '',
                  xla_permute: bool = False):
    geo = _geometry(*geo_key)
    n = geo.n
    tg = geo.tg
    l = pl.program_id(1)
    dt = out_ref.dtype

    # ---- entry ----
    # xla_permute: the wrapper already delivers packed [C, N] tokens
    # (one XLA 6-D transpose per chain); otherwise permute row-major CF
    # slabs via the 0/1 matmuls (input [1, nwh*C, ts_in]: slab wr =
    # sublane rows [wr*C, (wr+1)*C), lanes always from 0).
    @pl.when(l == 0)
    def _entry():
        if xla_permute:
            xres[:] = x_ref[0]
        else:
            for wr in range(geo.nwh):
                slab = x_ref[0, wr * c:(wr + 1) * c, :]
                xres[:, wr * geo.ts_out:(wr + 1) * geo.ts_out] = jnp.dot(
                    slab, pin_ref[:],
                    preferred_element_type=jnp.float32).astype(xres.dtype)

    valid = valid_ref[:]                                   # [1, N] f32

    # pltpu.roll wants a non-negative shift (rolls are circular, so
    # shift by (sh mod N) — wrapped lanes are killed by the tap masks)
    # and only rotates 32-bit data: cast the bf16 hidden to f32 first
    # (the accumulation is f32 anyway).
    roll = ((lambda a, sh: jnp.roll(a, sh, axis=1)) if interpret
            else (lambda a, sh: pltpu.roll(a.astype(jnp.float32), sh % n, 1)))

    # ---- LN1 + masked window attention + residual ----
    h1 = _ln_cf(xres[:], ln1_ref[0, 0], ln1_ref[0, 1])
    qln[:] = (h1 * valid).astype(dt)
    # one [C, 3C] @ [C, N] dot for q, k and v (M=3C fills the MXU 3x
    # better than three M=C dots and saves two issues)
    qkvb[:] = (_cdot(wqkv_ref[0], qln[:]) + bqkv_ref[0]).astype(dt)

    if 'attn' not in skip:               # lab attribution knob
        _attn_groups(qkvb, attnb, bias_ref[0], num_heads=num_heads,
                     dh=c_att // num_heads, c_att=c_att, tg=tg,
                     ngroups=geo.ngroups, dt=dt)
    proj = _cdot(wo_ref[0], attnb[:]) + bo_ref[0]
    xres[:] = (xres[:].astype(jnp.float32) + proj * valid).astype(xres.dtype)

    # ---- LN2 + CrossFFN (BNs folded) + residual ----
    g3 = _ffn_segment(xres[:], valid, roll, ln2_ref, w1_ref, b1_ref,
                      wdw_ref, bdw_ref, w2_ref, b2_ref, dwmask_ref,
                      hid, accf, ch=ch, n=n, dt=dt, dw_deltas=dw_deltas,
                      dw_taps=dw_taps, skip=skip)
    xres[:] = ((xres[:].astype(jnp.float32) + g3) * valid).astype(xres.dtype)

    # ---- exit: permute back to row-major CF ----
    @pl.when(l == num_blocks - 1)
    def _exit():
        if xla_permute:
            out_ref[0] = xres[:]
        else:
            for wr in range(geo.nwh):
                packed = xres[:, wr * geo.ts_out:(wr + 1) * geo.ts_out]
                out_ref[0, wr * c:(wr + 1) * c, :] = jnp.dot(
                    packed, pout_ref[:],
                    preferred_element_type=jnp.float32).astype(dt)


def _pack_tokens(x, geo, dt):
    """[SB, C, H, W] row-major CF -> packed [SB, C, N] tokens (one 6-D
    XLA transpose; ring and group padding zero-filled)."""
    sb, c = x.shape[:2]
    ws = geo.ws
    xp = jnp.pad(x.astype(dt),
                 ((0, 0), (0, 0), (geo.pt, geo.hp - x.shape[2] - geo.pt),
                  (geo.pl, geo.wp - x.shape[3] - geo.pl)))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0),
                      (0, geo.ng * geo.cols_g - geo.wp)))
    xp = xp.reshape(sb, c, geo.nwh, ws, geo.ng, geo.cols_g)
    xp = xp.transpose(0, 1, 2, 4, 5, 3)            # [..., ng, kg, r]
    xp = xp.reshape(sb, c, geo.nwh, geo.ng, geo.cols_g * ws)
    xp = jnp.pad(xp, ((0, 0),) * 4 + ((0, geo.tg - geo.cols_g * ws),))
    return xp.reshape(sb, c, geo.n)


def _unpack_tokens(out, geo, h, w):
    """Inverse of `_pack_tokens`: [SB, C, N] -> [SB, C, h, w]."""
    sb, c = out.shape[:2]
    ws = geo.ws
    out = out.reshape(sb, c, geo.nwh, geo.ng, geo.tg)
    out = out[..., :geo.cols_g * ws]
    out = out.reshape(sb, c, geo.nwh, geo.ng, geo.cols_g, ws)
    out = out.transpose(0, 1, 2, 5, 3, 4)          # [..., r, ng, kg]
    out = out.reshape(sb, c, geo.hp, geo.ng * geo.cols_g)
    out = out[:, :, :, :geo.wp]
    return out[:, :, geo.pt:geo.pt + h, geo.pl:geo.pl + w]


# ---------------------------------------------------------------------------
# fusion-block kernel (HRFuserFusionBlock)
# ---------------------------------------------------------------------------

def _fusion_kernel(x_ref, z_ref, valid_ref, dwmask_ref,
                   lnq_ref, lnkv_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                   wv_ref, bv_ref, wo_ref, bo_ref, bias_ref,
                   ln3_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                   w2_ref, b2_ref, out_ref,
                   xres, qln, qkvb, attnb, hid, accf,
                   *, num_modalities: int, num_heads: int, c: int, ch: int,
                   c_att: int, geo_key, dw_deltas, dw_taps,
                   interpret: bool):
    """One HRFuserFusionBlock on packed tokens (eval).

    Residual semantics of ref `hrfuser_hrformer_based.py:305-317`:
    every modality's MWCA queries the same frozen LN of the block
    input, the raw modality feature is added too, then one shared
    CrossFFN closes the block.
    """
    geo = _geometry(*geo_key)
    n = geo.n
    tg = geo.tg
    dt = out_ref.dtype
    roll = ((lambda a, sh: jnp.roll(a, sh, axis=1)) if interpret
            else (lambda a, sh: pltpu.roll(a.astype(jnp.float32),
                                           sh % n, 1)))
    valid = valid_ref[:]

    xres[:] = x_ref[0]
    acc = xres[:].astype(jnp.float32)
    for k in range(num_modalities):
        # frozen-copy query: LN over the ORIGINAL x for every modality
        qn = _ln_cf(xres[:], lnq_ref[0, k, 0], lnq_ref[0, k, 1])
        qln[:] = (qn * valid).astype(dt)
        z = z_ref[0, k * c:(k + 1) * c, :]
        kn = (_ln_cf(z, lnkv_ref[0, k, 0], lnkv_ref[0, k, 1])
              * valid).astype(dt)
        qkvb[0:c_att, :] = (_cdot(wq_ref[0, k], qln[:])
                            + bq_ref[0, k]).astype(dt)
        qkvb[c_att:2 * c_att, :] = (_cdot(wk_ref[0, k], kn)
                                    + bk_ref[0, k]).astype(dt)
        qkvb[2 * c_att:3 * c_att, :] = (_cdot(wv_ref[0, k], kn)
                                        + bv_ref[0, k]).astype(dt)
        _attn_groups(qkvb, attnb, bias_ref[0, k],
                     num_heads=num_heads, dh=c_att // num_heads,
                     c_att=c_att, tg=tg, ngroups=geo.ngroups, dt=dt)
        proj = _cdot(wo_ref[0, k], attnb[:]) + bo_ref[0, k]
        acc = acc + z.astype(jnp.float32) + proj * valid
    xres[:] = acc.astype(xres.dtype)

    g3 = _ffn_segment(xres[:], valid, roll,
                      ln3_ref, w1_ref, b1_ref, wdw_ref, bdw_ref,
                      w2_ref, b2_ref, dwmask_ref, hid, accf,
                      ch=ch, n=n, dt=dt, dw_deltas=dw_deltas,
                      dw_taps=dw_taps)
    out_ref[0] = ((xres[:].astype(jnp.float32) + g3)
                  * valid).astype(dt)


def stack_fusion_params(block: Dict[str, Any], num_modalities: int,
                        num_heads: int, ws: int, g: int, tg: int,
                        dtype) -> Dict[str, Array]:
    """Stack one HRFuserFusionBlock's variables for `fusion_chain`."""
    f32 = jnp.float32
    p = block['params']
    bs = block['batch_stats']
    out: Dict[str, list] = {k: [] for k in
                            ('lnq', 'lnkv', 'wq', 'bq', 'wk', 'bk',
                             'wv', 'bv', 'wo', 'bo', 'bias')}
    for k in range(num_modalities):
        a = p[f'attn_{k}']
        out['lnq'].append(jnp.stack(
            [p[f'norm1_{k}']['scale'],
             p[f'norm1_{k}']['bias']]).astype(f32)[..., None])
        out['lnkv'].append(jnp.stack(
            [p[f'norm2_{k}']['scale'],
             p[f'norm2_{k}']['bias']]).astype(f32)[..., None])
        c_ = p[f'attn_{k}']['q_proj']['kernel'].shape[0]
        d = c_ // num_heads
        dh = d + (d % 2)
        scale = d ** -0.5
        for nm, wkey, bkey, sc in (('q_proj', 'wq', 'bq', scale),
                                   ('k_proj', 'wk', 'bk', 1.0),
                                   ('v_proj', 'wv', 'bv', 1.0)):
            wj, bj = _pad_heads_cols(a[nm]['kernel'] * sc,
                                     a[nm]['bias'] * sc,
                                     num_heads, dh, d)
            out[wkey].append(wj.astype(dtype))
            out[bkey].append(bj.astype(f32)[:, None])
        out['wo'].append(_pad_heads_rows(
            a['out_proj']['kernel'], num_heads, dh, d).astype(dtype))
        out['bo'].append(a['out_proj']['bias'].astype(f32)[:, None])
        out['bias'].append(build_group_bias(
            a['rpe']['relative_position_bias_table'], num_heads, ws,
            g, tg, dtype))
    res = {k: jnp.stack(v)[None] for k, v in out.items()}   # [1, M, ...]
    res['ln3'] = jnp.stack(
        [p['norm3']['scale'], p['norm3']['bias']]).astype(f32)[None, ...,
                                                               None]
    ffn, fbs = p['ffn'], bs['ffn']
    s1, t1 = _fold_bn(ffn['norm1']['bn'], fbs['norm1']['bn'])
    s2, t2 = _fold_bn(ffn['norm2']['bn'], fbs['norm2']['bn'])
    s3, t3 = _fold_bn(ffn['norm3']['bn'], fbs['norm3']['bn'])
    res['w1'] = (ffn['fc1']['kernel'][0, 0] * s1[None, :]).astype(dtype)[None]
    res['b1'] = (ffn['fc1']['bias'] * s1 + t1).astype(f32)[None, :, None]
    res['wdw'] = (ffn['dw']['kernel'][:, :, 0, :] * s2[None, None, :]
                  ).reshape(9, -1).T.astype(f32)[None]
    res['bdw'] = (ffn['dw']['bias'] * s2 + t2).astype(f32)[None, :, None]
    res['w2'] = (ffn['fc2']['kernel'][0, 0] * s3[None, :]).astype(dtype)[None]
    res['b2'] = (ffn['fc2']['bias'] * s3 + t3).astype(f32)[None, :, None]
    return res


def fusion_chain(x: Array, mods: Sequence[Array], block: Dict[str, Any], *,
                 num_heads: int, window: int = 7, group_windows: int = 13,
                 interpret=None) -> Array:
    """Run one HRFuserFusionBlock (eval) as a packed Pallas kernel.

    x: [B, C, H, W]; mods: list of M [B, C, H, W] modality features.
    `block` is the bound HRFuserFusionBlock's variable dict.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, c, h, w = x.shape
    m = len(mods)
    geo = _geometry(h, w, window, group_windows)
    dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.bfloat16
    ch = block['params']['ffn']['fc1']['kernel'].shape[-1]
    d = c // num_heads
    c_att = num_heads * (d + (d % 2))

    params = stack_fusion_params(block, m, num_heads, window,
                                 geo.g, geo.tg, dt)
    dy_vars, dx_vars = geo.dw_factored()
    dw_deltas = (tuple(d for d, _ in dy_vars[-1]),
                 tuple(d for d, _ in dy_vars[1]))
    dw_taps = tuple((d, dx) for d, _, dx in dx_vars)
    masks = np.stack([mk for _, mk in dy_vars[-1]]
                     + [mk for _, mk in dy_vars[1]]
                     + [mk for _, mk, _ in dx_vars])

    xp = _pack_tokens(x, geo, dt)
    zp = _pack_tokens(jnp.concatenate([z.astype(dt) for z in mods], 1),
                      geo, dt)
    valid = jnp.asarray(geo.valid_mask(), jnp.float32)
    dwmask = jnp.asarray(masks, jnp.float32)

    bspec = lambda nc: pl.BlockSpec((1, nc, geo.n), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    cspec = lambda a: pl.BlockSpec(a.shape,
                                   (lambda nd: lambda i: (0,) * nd)(a.ndim),
                                   memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _fusion_kernel, num_modalities=m, num_heads=num_heads, c=c, ch=ch,
        c_att=c_att, geo_key=(h, w, window, group_windows),
        dw_deltas=dw_deltas, dw_taps=dw_taps, interpret=interpret)

    order = ('lnq', 'lnkv', 'wq', 'bq', 'wk', 'bk', 'wv', 'bv', 'wo',
             'bo', 'bias', 'ln3', 'w1', 'b1', 'wdw', 'bdw', 'w2', 'b2')
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[bspec(c), bspec(m * c), cspec(valid), cspec(dwmask)]
        + [cspec(params[k]) for k in order],
        out_specs=bspec(c),
        out_shape=jax.ShapeDtypeStruct((b, c, geo.n), dt),
        scratch_shapes=[
            pltpu.VMEM((c, geo.n), dt),            # xres
            pltpu.VMEM((c, geo.n), dt),            # qln
            pltpu.VMEM((3 * c_att, geo.n), dt),    # fused q/k/v
            pltpu.VMEM((c_att, geo.n), dt),        # attn
            pltpu.VMEM((ch, geo.n), dt),           # hidden
            pltpu.VMEM((ch, geo.n), jnp.float32),  # dw accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, zp, valid, dwmask, *[params[k] for k in order])

    return _unpack_tokens(out, geo, h, w).astype(x.dtype)


# ---------------------------------------------------------------------------
# weight stacking from flax block variable dicts
# ---------------------------------------------------------------------------

def _pad_heads_cols(w, b, num_heads, dh, d):
    """[C, nh*d] weight / [nh*d] bias -> [C, nh*dh] / [nh*dh] with
    zero columns appended per head (inert through the attention)."""
    if dh == d:
        return w, b
    c_in = w.shape[0]
    w = w.reshape(c_in, num_heads, d)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, dh - d))).reshape(c_in, -1)
    b = jnp.pad(b.reshape(num_heads, d),
                ((0, 0), (0, dh - d))).reshape(-1)
    return w, b


def _pad_heads_rows(w, num_heads, dh, d):
    """[nh*d, C] out-proj -> [nh*dh, C] with zero rows per head."""
    if dh == d:
        return w
    c_out = w.shape[1]
    w = w.reshape(num_heads, d, c_out)
    return jnp.pad(w, ((0, 0), (0, dh - d), (0, 0))).reshape(-1, c_out)


def stack_chain_params(blocks: Sequence[Dict[str, Any]], num_heads: int,
                       ws: int, g: int, tg: int, dtype) -> Dict[str, Array]:
    """Stack per-block HRFormerBlock variables into [S*L, ...] arrays.

    `blocks` is the flat (stream-major) list of per-block variable
    dicts (`{'params': ..., 'batch_stats': ...}` of a bound
    HRFormerBlock). BNs are folded with running stats (eval mode).
    """
    f32 = jnp.float32
    out = {k: [] for k in ('ln1', 'wqkv', 'bqkv', 'wo', 'bo', 'ln2',
                           'w1', 'b1', 'wdw', 'bdw', 'w2', 'b2', 'bias')}
    for blk in blocks:
        p = blk['params']
        bs = blk['batch_stats']
        a = p['attn']
        out['ln1'].append(jnp.stack(
            [p['norm1']['scale'], p['norm1']['bias']]).astype(f32)[..., None])
        # fold the attention scale d^-0.5 into Wq/bq so the kernel's
        # logits dot consumes q directly (saves two value passes);
        # pad each head to an EVEN dim (see _attn_groups)
        wqkv = a['qkv']['kernel']
        bqkv = a['qkv']['bias']
        c_ = wqkv.shape[0]
        d = c_ // num_heads
        dh = d + (d % 2)
        scale = d ** -0.5
        parts_w, parts_b = [], []
        for j, sc in ((0, scale), (1, 1.0), (2, 1.0)):
            wj, bj = _pad_heads_cols(wqkv[:, j * c_:(j + 1) * c_] * sc,
                                     bqkv[j * c_:(j + 1) * c_] * sc,
                                     num_heads, dh, d)
            parts_w.append(wj)
            parts_b.append(bj)
        out['wqkv'].append(jnp.concatenate(parts_w, 1).astype(dtype))
        out['bqkv'].append(jnp.concatenate(parts_b).astype(f32)[:, None])
        out['wo'].append(_pad_heads_rows(
            a['out_proj']['kernel'], num_heads, dh, d).astype(dtype))
        out['bo'].append(a['out_proj']['bias'].astype(f32)[:, None])
        out['ln2'].append(jnp.stack(
            [p['norm2']['scale'], p['norm2']['bias']]).astype(f32)[..., None])
        ffn, fbs = p['ffn'], bs['ffn']
        s1, t1 = _fold_bn(ffn['norm1']['bn'], fbs['norm1']['bn'])
        s2, t2 = _fold_bn(ffn['norm2']['bn'], fbs['norm2']['bn'])
        s3, t3 = _fold_bn(ffn['norm3']['bn'], fbs['norm3']['bn'])
        out['w1'].append((ffn['fc1']['kernel'][0, 0]
                          * s1[None, :]).astype(dtype))
        out['b1'].append((ffn['fc1']['bias'] * s1 + t1).astype(f32)[:, None])
        out['wdw'].append((ffn['dw']['kernel'][:, :, 0, :]
                           * s2[None, None, :]).reshape(9, -1).T.astype(f32))
        out['bdw'].append((ffn['dw']['bias'] * s2 + t2).astype(f32)[:, None])
        out['w2'].append((ffn['fc2']['kernel'][0, 0]
                          * s3[None, :]).astype(dtype))
        out['b2'].append((ffn['fc2']['bias'] * s3 + t3).astype(f32)[:, None])
        out['bias'].append(build_group_bias(
            a['rpe']['relative_position_bias_table'], num_heads, ws,
            g, tg, dtype))
    return {k: jnp.stack(v) for k, v in out.items()}


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def hrformer_chain(x: Array, blocks: Sequence[Dict[str, Any]], *,
                   num_heads: int, window: int = 7, n_streams: int = 1,
                   group_windows: int = 13, interpret=None,
                   xla_permute: bool = True) -> Array:
    """Run a chain of HRFormerBlocks (eval) in one Pallas kernel.

    Args:
        x: [S*B, C, H, W] channels-first input — `n_streams`
            independent streams stacked on the leading axis (stream-
            major: stream s occupies rows [s*B, (s+1)*B)).
        blocks: flat stream-major list of S*L per-block variable dicts;
            every stream runs the same L = len(blocks)//n_streams
            block structure with its own weights.
        num_heads: heads per block (C % num_heads == 0).

    Returns: [S*B, C, H, W], same dtype as x.
    """
    if interpret is None:      # CPU has no Mosaic: interpret the kernel
        interpret = jax.default_backend() != 'tpu'
    XLA_PERMUTE = bool(xla_permute)
    sb, c, h, w = x.shape
    assert sb % n_streams == 0
    b = sb // n_streams
    num_blocks = len(blocks) // n_streams
    assert num_blocks * n_streams == len(blocks)
    geo = _geometry(h, w, window, group_windows)
    dt = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.bfloat16
    ch = blocks[0]['params']['ffn']['fc1']['kernel'].shape[-1]
    d = c // num_heads
    c_att = num_heads * (d + (d % 2))

    params = stack_chain_params(blocks, num_heads, window, geo.g,
                                geo.tg, dt)
    dy_vars, dx_vars = geo.dw_factored()
    dw_deltas = (tuple(d for d, _ in dy_vars[-1]),
                 tuple(d for d, _ in dy_vars[1]))
    dw_taps = tuple((d, dx) for d, _, dx in dx_vars)
    masks = np.stack([m for _, m in dy_vars[-1]]
                     + [m for _, m in dy_vars[1]]
                     + [m for _, m, _ in dx_vars])

    # row-major CF input, padded to the window ring
    xp = jnp.pad(x.astype(dt),
                 ((0, 0), (0, 0), (geo.pt, geo.hp - h - geo.pt),
                  (geo.pl, geo.wp - w - geo.pl)))
    ws = geo.ws
    if XLA_PERMUTE:
        # pack tokens XLA-side: ONE 6-D transpose per chain (the kernel
        # permute dots are M=18-starved on the MXU: measured 1.74 ms
        # fixed per call at the money shape vs ~0.2 ms for this)
        xp = _pack_tokens(x, geo, dt)
        in_shape = (1, c, geo.n)
        out_shape = (sb, c, geo.n)
    else:
        # window-row slabs fold into SUBLANES ([sb, nwh*C, ts_in]) so
        # the kernel's per-slab permute dots slice sublanes, never
        # misaligned lanes
        xp = xp.reshape(sb, c, geo.nwh, geo.ts_in).transpose(0, 2, 1, 3)
        xp = xp.reshape(sb, geo.nwh * c, geo.ts_in)
        in_shape = (1, geo.nwh * c, geo.ts_in)
        out_shape = (sb, geo.nwh * c, geo.ts_in)

    if XLA_PERMUTE:                    # unused by the kernel: tiny dummies
        pin = jnp.zeros((1, 1), dt)
        pout = jnp.zeros((1, 1), dt)
    else:
        pin = jnp.asarray(geo.entry_perm(), dt)
        pout = jnp.asarray(geo.exit_perm(), dt)
    valid = jnp.asarray(geo.valid_mask(), jnp.float32)
    dwmask = jnp.asarray(masks, jnp.float32)

    def im_x(sb_i, l):
        return (sb_i, 0, 0)

    def im_w(ndim):
        def f(sb_i, l):
            return ((sb_i // b) * num_blocks + l,) + (0,) * (ndim - 1)
        return f

    def im_const(ndim):
        return lambda sb_i, l: (0,) * ndim

    wspec = lambda a: pl.BlockSpec((1,) + a.shape[1:], im_w(a.ndim),
                                   memory_space=pltpu.VMEM)
    cspec = lambda a: pl.BlockSpec(a.shape, im_const(a.ndim),
                                   memory_space=pltpu.VMEM)

    skip = os.environ.get('HRFUSER_CHAIN_SKIP', '')
    kernel = functools.partial(
        _chain_kernel, num_blocks=num_blocks, num_heads=num_heads,
        c=c, ch=ch, c_att=c_att,
        geo_key=(h, w, window, group_windows),
        dw_deltas=dw_deltas, dw_taps=dw_taps, interpret=interpret,
        skip=skip, xla_permute=XLA_PERMUTE)

    out = pl.pallas_call(
        kernel,
        grid=(sb, num_blocks),
        in_specs=[
            pl.BlockSpec(in_shape, im_x, memory_space=pltpu.VMEM),
            cspec(pin), cspec(pout), cspec(valid), cspec(dwmask),
            wspec(params['ln1']), wspec(params['wqkv']),
            wspec(params['bqkv']), wspec(params['wo']),
            wspec(params['bo']), wspec(params['ln2']),
            wspec(params['w1']), wspec(params['b1']),
            wspec(params['wdw']), wspec(params['bdw']),
            wspec(params['w2']), wspec(params['b2']),
            wspec(params['bias']),
        ],
        out_specs=pl.BlockSpec(in_shape, im_x, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, dt),
        scratch_shapes=[
            pltpu.VMEM((c, geo.n), dt),            # xres
            pltpu.VMEM((c, geo.n), dt),            # qln
            pltpu.VMEM((3 * c_att, geo.n), dt),        # fused q/k/v
            pltpu.VMEM((c_att, geo.n), dt),            # attn
            pltpu.VMEM((ch, geo.n), dt),           # hidden
            pltpu.VMEM((ch, geo.n), jnp.float32),  # dw accumulator
        ],
        # donate the packed input buffer to the output: the chain
        # reads x only at l==0 (into scratch) and writes out only at
        # l==num_blocks-1, so aliasing is safe and saves one HBM
        # buffer + copy per call
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, pin, pout, valid, dwmask,
      params['ln1'], params['wqkv'], params['bqkv'], params['wo'],
      params['bo'], params['ln2'], params['w1'], params['b1'],
      params['wdw'], params['bdw'], params['w2'], params['b2'],
      params['bias'])

    if XLA_PERMUTE:
        return _unpack_tokens(out, geo, h, w).astype(x.dtype)
    else:
        out = out.reshape(sb, geo.nwh, c, ws, geo.wp).transpose(0, 2, 1, 3, 4)
        out = out.reshape(sb, c, geo.hp, geo.wp)
    return out[:, :, geo.pt:geo.pt + h, geo.pl:geo.pl + w].astype(x.dtype)
