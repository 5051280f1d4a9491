"""Fused multilevel RoIAlign as a Pallas TPU kernel (inference path).

Why: honest device spans showed RoIAlign at ~63% of the whole HRFuser
inference step (229 of 364 ms at r640 batch 8). The XLA gather
formulation materializes 12 x [B*N*196, 256] tap tensors (~9.6 GB of
HBM writes + relayout reads per step); the one-hot einsum formulation
materializes [B, N, 7, W, C] intermediates that are just as large.
Neither can keep the work on-chip because XLA ops communicate through
HBM.

This kernel never leaves VMEM between sampling and pooling:

  * The FPN pyramid is flattened to one [R, C] row buffer (R =
    sum_l H_l*W_l, ~20k rows at r640) — 10.4 MB bf16 per image, which
    fits in VMEM and stays resident across RoI chunks.
  * Level routing is an offset: each RoI's window start row and the
    per-axis one-hot weight strips Wy/Wx [7, S] RELATIVE to the window
    origin are precomputed with plain jnp (S = 64 covers every RoI
    span the level router can produce — see `_plan`).
  * Per RoI the kernel stages G=8 window rows at a time side-by-side
    in lanes ([32, G*C]) and x-pools them with ONE shared-weight MXU
    dot per 32-column chunk, where the chunk count is the RoI's true
    extent ceil(nx/32) as a fori_loop TRIP COUNT (v7, branchless); the
    y-pool likewise runs ceil(ny/32) chunk trips per output column.
    Off-window / off-level taps carry zero weight, so garbage rows
    (level wrap-around, padding, stale rows) contribute nothing, and
    the full-coverage window (`_v5_span`) means NO clipped RoI can
    escape the kernel — the oversize-gather fallback is unreachable.
  * Output rows are emitted in (q, p) flat order and in bf16; the
    consumer keys off QP_VARIANTS for the order.
  * The kernel grid is (batch, RoI-chunk): batching is native, via a
    `custom_vmap` rule, NOT jax's fallback vmap-as-loop (which unrolled
    into 8 sequential single-image calls inside a `while`).

Numerics match `multilevel_roi_align` to bf16 tolerance (same
coordinates/weights/masks; each pooling dot accumulates in f32, with
one intermediate bf16 round between the x- and y-pools — the staged
sx scratch is bf16 to halve y-pool VMEM traffic — plus the final bf16
round; tests compare at atol/rtol 0.05).
Forward-only: the eval path needs no VJP (training keeps the one-hot
matmul formulation, whose backward is transposed matmuls).

Two variants ship: 'v7' (default: full-coverage branchless chunk
trips) and 'v4' (64-wide window + exact oversize-gather fallback, the
A/B comparator). The v1/v2/v3/v5/v6 iteration history lives in git
history and perf/r3_05, r3_08, r4_04 — each was a measured step toward
v7 (per-row staging -> grouped block-diag dots -> shared-weight wide-N
-> full-coverage gating -> branchless trip counts).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hrfuser_tpu.ops.roi_align import map_roi_levels

Array = jnp.ndarray

# Window rows/cols. The level router bounds a RoI's feature-space span
# by 28 * sqrt(aspect_ratio), so 64 covers aspect ratios up to ~3.9;
# wider boxes (rare) take the exact gather fallback (see FALLBACK).
SPAN = 64
# RoIs per grid step. The kernel is VMEM-load-bound (traced on v5e,
# 8x1000 RoIs, r640 pyramid: 12.95 ms at CHUNK 8 vs 11.60 ms at 4 for
# the dense-row variant), so the chunk mainly sizes the sx scratch and
# the weight-block prefetch. Env override for tuning.
CHUNK = int(__import__('os').environ.get('HRFUSER_ROI_CHUNK', '4'))
# v3: window rows x-pooled per MXU issue (block-diagonal weights).
# Swept on v5e at 8x1000 realistic RoIs (perf/r3_08_v3_sweep.log):
# G=2: 23.2 ms, G=4: 17.9, G=8: 16.1-16.3 (vs v1 33.9) -> default 8.
V3_GROUP = int(__import__('os').environ.get('HRFUSER_ROI_GROUP', '8'))
# Widest RoIs routed through the exact gather path per fallback-loop
# iteration when any RoI's span exceeds the window. The gather
# formulation costs ~0.3 ms per RoI-row across the 3 cascade stages at
# batch 8 (measured: 36 ms/step at 128), so the steady-state budget is
# small — and exactness does NOT depend on it: batches with zero
# oversize RoIs run zero loop iterations, and batches with more than
# FALLBACK oversize RoIs in an image just take more iterations (see
# the while_loop in `_pool_batched`).
FALLBACK = 16

# Variants whose kernels emit flat pooled rows in (q, p) order (x-bin
# major) rather than v1's (p, q). Consumers (cascade_roi_head, the
# fallback merge below) key off this ONE set so a new variant can't
# silently feed transposed 7x7 features downstream.
QP_VARIANTS = ('v4', 'v7', 'v8')
# Variants whose window covers EVERY clipped RoI (`_v5_span`): the
# oversize-gather fallback runs zero iterations by construction.
FULLCOV_VARIANTS = ('v7', 'v8')
# Variants whose Wx/Wy strips are laid out chunk-major
# ([N, nchunks*8, 32] instead of [N, out, span]) so the kernel can
# slice one chunk's weight block with a dynamic sublane offset.
CHUNK_MAJOR_VARIANTS = ('v7', 'v8')


def _v5_span(sizes) -> int:
    """Window size that covers EVERY possible RoI of this pyramid.

    Boxes are clipped to the image, so the worst feature-space extent
    on any routed level is that level's own height or (padded) width —
    at r640 that is the stride-4 level's 160 columns. Rounding
    (max extent + 9 margin: +1 hi-tap, +7 x-origin alignment, +1
    conservative) up to a 32-column staging chunk gives a window no RoI
    can escape: the oversize-gather fallback below then runs ZERO
    iterations for this pyramid, killing what the r4 honest-input trace
    measured as ~60-70 ms/step of fallback work at b8 (extreme-aspect
    RPN slivers — 31.7% of stage-0 proposals, 24 while_loop iterations;
    see tools/probe_roi_spans.py and perf/r4_02_roi_spans.log).
    """
    ext = max(max(h, _pad8(w)) for h, w in sizes)
    return max(SPAN, -(-(ext + 9) // 32) * 32)


def _axis_strip(start, bin_size, size, origin, out_size, sample_num,
                dtype, span=SPAN, chunk_major=False):
    """One-hot weights [N, out_size, span] relative to `origin`.

    Same sampling math as `roi_align._axis_onehot` (static grid), but
    the one-hot columns index into the RoI's span-wide window instead
    of the full axis. Also returns the per-RoI count of window rows
    actually carrying weight (`n_rows` [N] int32 in [1, span]) so the
    kernel can stop staging at the RoI's true extent.

    `chunk_major` emits [N, (span//32)*8, 32] instead — chunk k's
    weights at 8-aligned rows [8k, 8k+out), row 7 zero — the layout
    v7's dynamic-sublane weight slices want, built directly from the
    broadcasted comparison (a post-hoc XLA transpose of the [N, out,
    span] strip measured 2.9 ms/step across the 3 cascade stages).
    """
    g = sample_num
    s = (jnp.arange(g, dtype=start.dtype) + 0.5) / g
    p = jnp.arange(out_size, dtype=start.dtype)
    frac = p[None, :, None] + s[None, None, :]           # [1, out, g]
    coord = start[:, None, None] + frac * bin_size[:, None, None]

    inside = (coord > -1.0) & (coord < size[:, None, None])
    c = jnp.clip(coord, 0.0, size[:, None, None] - 1.0)
    lo = jnp.floor(c)
    hi = jnp.minimum(lo + 1.0, size[:, None, None] - 1.0)
    w_hi = c - lo
    w_lo = (1.0 - w_hi) * inside / g
    w_hi = w_hi * inside / g

    rel_lo = lo - origin[:, None, None]                  # in [0, span)
    rel_hi = hi - origin[:, None, None]
    n_rows = jnp.clip(((rel_hi + 1.0) * inside).max(axis=(1, 2)),
                      1.0, span).astype(jnp.int32)
    if chunk_major:
        nk = span // 32
        cols = jnp.arange(span, dtype=start.dtype).reshape(nk, 32)
        # broadcast straight into [N, nk, out, g, 32] so the target
        # layout falls out of the elementwise fusion, transpose-free
        one_lo = (cols[None, :, None, None, :]
                  == rel_lo[:, None, :, :, None])
        one_hi = (cols[None, :, None, None, :]
                  == rel_hi[:, None, :, :, None])
        w = (one_lo * w_lo[:, None, :, :, None]
             + one_hi * w_hi[:, None, :, :, None]).sum(axis=3)
        w = jnp.pad(w.astype(dtype),
                    ((0, 0), (0, 0), (0, 8 - out_size), (0, 0)))
        return w.reshape(w.shape[0], nk * 8, 32), n_rows
    cols = jnp.arange(span, dtype=start.dtype)
    one_lo = (cols[None, None, None, :] == rel_lo[..., None])
    one_hi = (cols[None, None, None, :] == rel_hi[..., None])
    w = one_lo * w_lo[..., None] + one_hi * w_hi[..., None]
    return w.sum(axis=2).astype(dtype), n_rows           # [N, out, span]


def _pad8(w: int) -> int:
    return (w + 7) // 8 * 8


def _plan(rois: Array, strides: Sequence[int], sizes, out_size: int,
          sample_num: int, finest_scale: int, dtype, span=SPAN,
          fullcov: bool = False, chunk_major: bool = False):
    """Per-RoI planning (plain jnp): window origins + weight strips.

    Mosaic requires dynamic VMEM loads to start at a multiple of 8
    rows, so (a) the flat buffer pads every level's width to a multiple
    of 8 (level offsets and `oy * w8` are then always aligned) and
    (b) the x-origin is rounded down to a multiple of 8, folding the
    remainder into the weight strips.

    Returns (base_row [N] i32, wl [N] i32, ny [N] i32, wide [N] i32,
    nx [N] i32, Wy, Wx [N, out, span]).
    """
    num_levels = len(strides)
    lvl = map_roi_levels(rois, num_levels, finest_scale)
    heights = jnp.asarray([h for h, w in sizes], jnp.int32)[lvl]
    widths = jnp.asarray([w for h, w in sizes], jnp.int32)[lvl]
    w8 = jnp.asarray([_pad8(w) for h, w in sizes], jnp.int32)[lvl]
    offsets_l = []
    acc = 0
    for h, w in sizes:
        offsets_l.append(acc)
        acc += h * _pad8(w)
    offset = jnp.asarray(offsets_l, jnp.int32)[lvl]
    inv_strides = jnp.asarray([1.0 / s for s in strides], rois.dtype)
    scale = inv_strides[lvl]

    x1 = rois[:, 0] * scale - 0.5
    y1 = rois[:, 1] * scale - 0.5
    bw = (rois[:, 2] * scale - 0.5 - x1) / out_size
    bh = (rois[:, 3] * scale - 0.5 - y1) / out_size

    # window origin: at or below the first tap, clamped so the SPAN
    # window stays inside the level extent (sample taps are clipped to
    # [0, size-1]); x additionally aligned down to a multiple of 8.
    # The x clamp is against the PADDED width w8, not `widths`: taps
    # never exceed widths-1, but clamping to widths-SPAN then aligning
    # down can push the window so far left that right-edge taps fall
    # outside the one-hot strip when the level width is >SPAN and not a
    # multiple of 8 (e.g. the STF r1248 stride-8 level, width 156) —
    # windows over the zero-padded columns are harmless and in-bounds
    # by the read_end accounting.
    if fullcov:
        # Full-coverage variants (span >= every level extent): clamping
        # the origin to size - span would force it to 0 on EVERY level,
        # making ny/nx "distance from the level edge to the RoI's far
        # tap" — 3-5x the true extent, which silently span-scaled the
        # extent-proportional kernels' trip counts (v5/v6/v7 all
        # measured 42-50 ms/call from exactly this before the fix).
        # The window trivially covers the RoI from any origin at or
        # below its first tap; the flat buffer's read_end accounting
        # (in _pool_batched) absorbs the deeper worst-case reads.
        oy = jnp.clip(jnp.floor(jnp.clip(y1, 0.0, None)).astype(jnp.int32),
                      0, jnp.maximum(heights - 1, 0))
        ox = jnp.clip(jnp.floor(jnp.clip(x1, 0.0, None)).astype(jnp.int32),
                      0, jnp.maximum(w8 - 8, 0))
    else:
        oy = jnp.clip(jnp.floor(jnp.clip(y1, 0.0, None)).astype(jnp.int32),
                      0, jnp.maximum(heights - span, 0))
        ox = jnp.clip(jnp.floor(jnp.clip(x1, 0.0, None)).astype(jnp.int32),
                      0, jnp.maximum(w8 - span, 0))
    ox = (ox // 8) * 8

    wy, ny = _axis_strip(y1, bh, heights.astype(rois.dtype),
                         oy.astype(rois.dtype), out_size, sample_num,
                         dtype, span, chunk_major)
    wx, nx = _axis_strip(x1, bw, widths.astype(rois.dtype),
                         ox.astype(rois.dtype), out_size, sample_num,
                         dtype, span, chunk_major)
    base = offset + oy * w8 + ox
    # wide flag: any x-tap beyond the window's first half -> the v1-v4
    # kernels must load the upper span/2 columns too (exact, from the
    # one-hot column extent — no margin heuristics). v5 uses the raw
    # `nx` extent to gate its 32-column staging chunks individually.
    wide = (nx > span // 2).astype(jnp.int32)
    return (base.astype(jnp.int32), w8, ny, wide, nx.astype(jnp.int32),
            wy, wx)





def _kernel_v4(base_ref, wl_ref, ny_ref, wide_ref, flat_ref, wy_ref, wx_ref,
               out_ref, s4_ref, sx_ref, *, c: int, out_size: int):
    """v4: shared-weight wide-N x-pool.

    v3 batches G window rows under one MXU issue with a block-diagonal
    [G*8, G*SPAN] weight — paying G x the FLOPs in structural zeros.
    But all G rows of one RoI share the SAME Wx strip, so the same
    batching is ONE [8, SPAN] @ [SPAN, G*C] dot with the rows staged
    side-by-side in the LANE dimension: G x fewer MXU FLOPs, no
    per-RoI weight-block stores, and the x-pool result arrives as
    [8(q), G*C] whose per-row lane slices store straight into the
    y-pool scratch. Stale rows (past ny, or narrow RoIs' upper
    half-windows) cancel exactly as in v1/v3: zero wy columns / zero
    wx columns.
    """
    b = pl.program_id(0)
    chunk_i = pl.program_id(1)
    os8 = 8

    @pl.when(jnp.logical_and(b == 0, chunk_i == 0))
    def _init():
        s4_ref[...] = jnp.zeros_like(s4_ref)
        sx_ref[...] = jnp.zeros_like(sx_ref)

    half = SPAN // 2
    for r in range(CHUNK):
        roi = chunk_i * CHUNK + r
        base = base_ref[b, roi]
        wl = wl_ref[b, roi]
        wide = wide_ref[b, roi]
        wx_r = wx_ref[0, r]                              # [7, SPAN]

        def body(i, carry, base=base, wl=wl, wide=wide, wx_r=wx_r, r=r):
            for g in range(V3_GROUP):
                start = pl.multiple_of(base + (i * V3_GROUP + g) * wl, 8)
                s4_ref[0:half, g * c:g * c + c] = flat_ref[
                    0, pl.ds(start, half), :]

                @pl.when(wide > 0)
                def _upper(start=start, g=g):
                    s4_ref[half:SPAN, g * c:g * c + c] = flat_ref[
                        0, pl.ds(start + half, half), :]

            res = jax.lax.dot_general(
                wx_r, s4_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [7(q), G*C]
            res = res.astype(sx_ref.dtype)
            for g in range(V3_GROUP):
                sx_ref[i * V3_GROUP + g,
                       r * os8:r * os8 + out_size, :] = (
                    res[:, g * c:g * c + c])
            return carry

        n_iter = (ny_ref[b, roi] + V3_GROUP - 1) // V3_GROUP
        jax.lax.fori_loop(0, n_iter, body, 0)

    # y-pool: one contiguous [out_size, C] store per x-bin -> (q, p)
    for r in range(CHUNK):
        wy_r = wy_ref[0, r]                              # [7, SPAN]
        for q in range(out_size):
            col = sx_ref[:, r * os8 + q, :]              # [SPAN, C]
            yp = jax.lax.dot_general(
                wy_r, col,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [7(p), C]
            out_ref[0, r, q * out_size:(q + 1) * out_size, :] = yp.astype(
                out_ref.dtype)




def _kernel_v7(base_ref, wl_ref, ny_ref, nx_ref, flat_ref, wy_ref, wx_ref,
               out_ref, s32_ref, sx_ref, xacc_ref, yacc_ref, *, c: int,
               out_size: int, span: int):
    """v7: full-coverage window, BRANCHLESS extent-proportional work.

    v6 gated each 32-column chunk's load+dot behind `pl.when`, but the
    lab showed that buys nothing over v5's load-only gating (49.7 vs
    42.0 ms/call at 8x1000 realistic RoIs — BOTH 3-4x v4's 13.6):
    fine-grained dynamic branches around the hot dots defeat Mosaic's
    pipelining instead of skipping work. v7 removes the branches: the
    chunk count becomes a fori_loop TRIP COUNT.

      x-pool row-group i:  chunk 0 hoisted (nx >= 1 always):
                             xacc  = Wx[0] @ stage(0)
                           fori_loop(1, ceil(nx/32)):
                             xacc += Wx[k] @ stage(k)
      y-pool bin q:        yacc   = Wy[0] @ sx[0:32]
                           fori_loop(1, ceil(ny/32)):
                             yacc += Wy[k] @ sx[32k:32k+32]

    The per-chunk weight block Wx[k] is a dynamic-sublane slice of a
    chunk-major strip layout ([nchunks*8, 32], row 7 of each chunk
    zero-padded), so no lane-dim dynamic slicing is needed. A typical
    proposal (nx, ny <= 32) runs zero extra-loop trips — the identical
    loads/FLOPs of the 64-wide v4 narrow path — while a full-width
    stride-4 sliver (nx = 160, ny = 1) takes 4 extra x-trips on its
    single row group. f32 accumulators keep the two-dot rounding
    identical to v1-v6 (one bf16 round between pools, one at the end).
    """
    b = pl.program_id(0)
    chunk_i = pl.program_id(1)
    os8 = 8

    @pl.when(jnp.logical_and(b == 0, chunk_i == 0))
    def _init():
        s32_ref[...] = jnp.zeros_like(s32_ref)
        sx_ref[...] = jnp.zeros_like(sx_ref)

    for r in range(CHUNK):
        roi = chunk_i * CHUNK + r
        base = base_ref[b, roi]
        wl = wl_ref[b, roi]
        nkx = (nx_ref[b, roi] + 31) // 32

        def row_body(i, carry, base=base, wl=wl, nkx=nkx, r=r):
            row0 = pl.multiple_of(base + i * V3_GROUP * wl, 8)
            for g in range(V3_GROUP):
                start = pl.multiple_of(row0 + g * wl, 8)
                s32_ref[:, g * c:g * c + c] = flat_ref[
                    0, pl.ds(start, 32), :]
            xacc_ref[...] = jax.lax.dot_general(
                wx_ref[0, r, 0:8, :], s32_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [8(q), G*C]

            def chunk_body(k, carry2, row0=row0, r=r):
                for g in range(V3_GROUP):
                    start = pl.multiple_of(row0 + g * wl + k * 32, 8)
                    s32_ref[:, g * c:g * c + c] = flat_ref[
                        0, pl.ds(start, 32), :]
                xacc_ref[...] += jax.lax.dot_general(
                    wx_ref[0, r, pl.ds(pl.multiple_of(k * 8, 8), 8), :],
                    s32_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return carry2

            jax.lax.fori_loop(1, nkx, chunk_body, 0)
            res = xacc_ref[0:out_size, :].astype(sx_ref.dtype)
            for g in range(V3_GROUP):
                sx_ref[i * V3_GROUP + g,
                       r * os8:r * os8 + out_size, :] = (
                    res[:, g * c:g * c + c])
            return carry

        n_iter = (ny_ref[b, roi] + V3_GROUP - 1) // V3_GROUP
        jax.lax.fori_loop(0, n_iter, row_body, 0)

    # y-pool: chunk trip count from ny; one contiguous store per x-bin
    for r in range(CHUNK):
        nky = (ny_ref[b, chunk_i * CHUNK + r] + 31) // 32
        for q in range(out_size):
            yacc_ref[...] = jax.lax.dot_general(
                wy_ref[0, r, 0:8, :], sx_ref[0:32, r * os8 + q, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [8(p), C]

            def ychunk(k, carry, r=r, q=q):
                yacc_ref[...] += jax.lax.dot_general(
                    wy_ref[0, r, pl.ds(pl.multiple_of(k * 8, 8), 8), :],
                    sx_ref[pl.ds(pl.multiple_of(k * 32, 8), 32),
                           r * os8 + q, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return carry

            jax.lax.fori_loop(1, nky, ychunk, 0)
            out_ref[0, r, q * out_size:(q + 1) * out_size, :] = (
                yacc_ref[0:out_size, :].astype(out_ref.dtype))


def _kernel_v8(base_ref, wl_ref, ny_ref, nx_ref, flat_ref, wy_ref, wx_ref,
               out_ref, s32_ref, sx_ref, xacc_ref, yacc_ref, sem_ref,
               *, c: int, out_size: int, span: int):
    """v8: v7 with async double-buffered staging.

    v7 is issue-bound on the staging copies (~one [32, C] vector copy
    per window row; G copies serialize against the x-pool dot each
    trip). v8 turns the copies into DMA-engine transfers with two
    staging buffers: while the MXU pools trip t from buffer t%2, the
    DMA engines fill buffer (t+1)%2 with trip t+1's rows — loads and
    dots overlap instead of serializing. Same math, same weights, same
    trip counts as v7 (parity-gated by the shared kernel tests).
    """
    b = pl.program_id(0)
    chunk_i = pl.program_id(1)
    os8 = 8

    @pl.when(jnp.logical_and(b == 0, chunk_i == 0))
    def _init():
        s32_ref[...] = jnp.zeros_like(s32_ref)
        sx_ref[...] = jnp.zeros_like(sx_ref)

    def start_trip(slot, row0, wl, t):
        """Launch the G row-window DMAs of trip t into buffer `slot`.

        Trip index t enumerates (row-group i, chunk k) pairs in the
        kernel's traversal order; the caller maps t -> (i, k)."""
        for g in range(V3_GROUP):
            start = pl.multiple_of(row0 + g * wl, 8)
            pltpu.make_async_copy(
                flat_ref.at[0, pl.ds(start, 32), :],
                s32_ref.at[slot, :, pl.ds(g * c, c)],
                sem_ref.at[slot, g]).start()

    def wait_trip(slot):
        for g in range(V3_GROUP):
            pltpu.make_async_copy(
                flat_ref.at[0, pl.ds(0, 32), :],
                s32_ref.at[slot, :, pl.ds(g * c, c)],
                sem_ref.at[slot, g]).wait()

    for r in range(CHUNK):
        roi = chunk_i * CHUNK + r
        base = base_ref[b, roi]
        wl = wl_ref[b, roi]
        nkx = (nx_ref[b, roi] + 31) // 32
        n_rows = (ny_ref[b, roi] + V3_GROUP - 1) // V3_GROUP
        n_trips = n_rows * nkx

        def trip_origin(t, base=base, wl=wl, nkx=nkx):
            i = t // nkx
            k = t % nkx
            return pl.multiple_of(base + i * V3_GROUP * wl, 8) + k * 32

        start_trip(0, trip_origin(0), wl, 0)

        def trip_body(t, carry, wl=wl, nkx=nkx, r=r,
                      trip_origin=trip_origin, n_trips=n_trips):
            slot = jax.lax.rem(t, 2)
            nslot = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < n_trips)
            def _prefetch():
                start_trip(nslot, trip_origin(t + 1), wl, t + 1)

            wait_trip(slot)
            k = jax.lax.rem(t, nkx)
            contrib = jax.lax.dot_general(
                wx_ref[0, r, pl.ds(pl.multiple_of(k * 8, 8), 8), :],
                s32_ref[slot],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [8(q), G*C]

            @pl.when(k == 0)
            def _first():
                xacc_ref[...] = contrib

            @pl.when(k > 0)
            def _accum():
                xacc_ref[...] += contrib

            @pl.when(k == nkx - 1)
            def _emit(t=t, r=r, nkx=nkx):
                i = t // nkx
                res = xacc_ref[0:out_size, :].astype(sx_ref.dtype)
                for g in range(V3_GROUP):
                    sx_ref[i * V3_GROUP + g,
                           r * os8:r * os8 + out_size, :] = (
                        res[:, g * c:g * c + c])
            return carry

        jax.lax.fori_loop(0, n_trips, trip_body, 0)

    # y-pool: identical to v7
    for r in range(CHUNK):
        nky = (ny_ref[b, chunk_i * CHUNK + r] + 31) // 32
        for q in range(out_size):
            yacc_ref[...] = jax.lax.dot_general(
                wy_ref[0, r, 0:8, :], sx_ref[0:32, r * os8 + q, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [8(p), C]

            def ychunk(k, carry, r=r, q=q):
                yacc_ref[...] += jax.lax.dot_general(
                    wy_ref[0, r, pl.ds(pl.multiple_of(k * 8, 8), 8), :],
                    sx_ref[pl.ds(pl.multiple_of(k * 32, 8), 32),
                           r * os8 + q, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return carry

            jax.lax.fori_loop(1, nky, ychunk, 0)
            out_ref[0, r, q * out_size:(q + 1) * out_size, :] = (
                yacc_ref[0:out_size, :].astype(out_ref.dtype))


def _call(base, wl, ny, wide, flat, wy, wx, bsz, n, c, out_size, interpret,
          variant: str = 'v7', span: int = SPAN):
    grid = (bsz, n // CHUNK)
    if variant == 'v8':
        assert span % 32 == 0 and span % V3_GROUP == 0, (span, V3_GROUP)
        nk8 = (span // 32) * 8
        # `wide` carries the raw nx extents; wy/wx are chunk-major
        return pl.pallas_call(
            functools.partial(_kernel_v8, c=c, out_size=out_size,
                              span=span),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, flat.shape[1], c),
                                 lambda b, i, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK, nk8, 32),
                                 lambda b, i, *_: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK, nk8, 32),
                                 lambda b, i, *_: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, CHUNK, out_size * out_size, c),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, 32, V3_GROUP * c), jnp.bfloat16),
                    pltpu.VMEM((span, CHUNK * 8, c), jnp.bfloat16),
                    pltpu.VMEM((8, V3_GROUP * c), jnp.float32),
                    pltpu.VMEM((8, c), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, V3_GROUP)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n, out_size * out_size, c),
                                           jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(base, wl, ny, wide, flat, wy, wx)
    if variant == 'v7':
        assert span % 32 == 0 and span % V3_GROUP == 0, (span, V3_GROUP)
        nk8 = (span // 32) * 8
        # `wide` carries the raw nx extents; wy/wx are chunk-major
        return pl.pallas_call(
            functools.partial(_kernel_v7, c=c, out_size=out_size,
                              span=span),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, flat.shape[1], c),
                                 lambda b, i, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK, nk8, 32),
                                 lambda b, i, *_: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK, nk8, 32),
                                 lambda b, i, *_: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, CHUNK, out_size * out_size, c),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((32, V3_GROUP * c), jnp.bfloat16),
                    pltpu.VMEM((span, CHUNK * 8, c), jnp.bfloat16),
                    pltpu.VMEM((8, V3_GROUP * c), jnp.float32),
                    pltpu.VMEM((8, c), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n, out_size * out_size, c),
                                           jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(base, wl, ny, wide, flat, wy, wx)
    if variant == 'v4':
        assert SPAN % V3_GROUP == 0, (V3_GROUP, SPAN)
        return pl.pallas_call(
            functools.partial(_kernel_v4, c=c, out_size=out_size),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, flat.shape[1], c),
                                 lambda b, i, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK, out_size, SPAN),
                                 lambda b, i, *_: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK, out_size, SPAN),
                                 lambda b, i, *_: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, CHUNK, out_size * out_size, c),
                    lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((SPAN, V3_GROUP * c), jnp.bfloat16),
                    pltpu.VMEM((SPAN, CHUNK * 8, c), jnp.bfloat16),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n, out_size * out_size, c),
                                           jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(base, wl, ny, wide, flat, wy, wx)
    raise ValueError(f'unknown RoIAlign kernel variant: {variant!r}')




def _pool_batched(feats, rois, strides, out_size, sample_num,
                  finest_scale, interpret, flat_out=False, variant='v7'):
    """Batched implementation: feats [B, H_l, W_l, C] per level,
    rois [B, N, 4] -> [B, N, out, out, C] bf16 (or [B, N, out*out, C]
    when `flat_out` — the kernel's native (q, p) row order, sparing the
    consumer the [out, out] re-tiling relayout)."""
    c = feats[0].shape[-1]
    assert out_size <= 8, (
        f'kernel scratch packs one RoI per 8 sublanes (os8=8); '
        f'out_size={out_size} would overlap adjacent RoIs')
    bsz, n_in = rois.shape[:2]
    if n_in % CHUNK:                     # pad to the chunk grid
        rois = jnp.pad(rois, ((0, 0), (0, CHUNK - n_in % CHUNK), (0, 0)))
    n = rois.shape[1]
    sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
    dt = jnp.bfloat16
    span = _v5_span(sizes) if variant in FULLCOV_VARIANTS else SPAN

    fullcov = variant in FULLCOV_VARIANTS
    cm = variant in CHUNK_MAJOR_VARIANTS
    base, wl, ny, wide, nx, wy, wx = jax.vmap(
        lambda r: _plan(r, strides, sizes, out_size, sample_num,
                        finest_scale, dt, span, fullcov, cm))(rois)
    # flat buffer with every level's width padded to a multiple of 8
    # (row alignment for the kernel's dynamic loads)
    flat = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, 0), (0, _pad8(f.shape[2]) - f.shape[2]),
                     (0, 0))).reshape(bsz, -1, c) for f in feats], axis=1)
    flat = flat.astype(dt)
    # pad so every in-window load stays in bounds: the worst read per
    # level starts at that level's largest possible base (_plan clamps
    # oy/ox to the level extent) and runs span-1 rows further down —
    # exact accounting keeps the VMEM-resident buffer small
    total = sum(h * _pad8(w) for h, w in sizes)
    read_end = 0
    acc = 0
    for h, w in sizes:
        w8 = _pad8(w)
        if fullcov:
            # unclamped origin (oy <= h-1, ox <= w8-8): row reads go to
            # ceil((h - oy)/G)*G - 1 rows past oy (<= h + G - 1), and
            # column reads to ox + ceil(nx/32)*32 - 1 <= w8 + 30, which
            # spills one row further down
            base_max = acc + (h + V3_GROUP) * w8 + 32
            read_end = max(read_end, base_max)
        else:
            base_max = acc + max(h - span, 0) * w8 + (w8 - 8)
            read_end = max(read_end, base_max + (span - 1) * w8 + span)
        acc += h * w8
    flat = jnp.pad(flat, ((0, 0), (0, max(0, read_end - total)), (0, 0)))

    out = _call(base, wl, ny, nx if variant in FULLCOV_VARIANTS else wide,
                flat, wy, wx, bsz, n, c, out_size, interpret, variant, span)
    # v4/v7 emit flat rows in (q, p) order; unflatten to (p, q)
    if not flat_out:
        out = out.reshape(bsz, n, out_size, out_size, c)
        if variant in QP_VARIANTS:
            out = out.swapaxes(2, 3)                 # (q, p) -> (p, q)

    if variant in FULLCOV_VARIANTS:
        # The window covers EVERY RoI by construction: sample taps are
        # clipped to [0, size-1] (_axis_strip), so no RoI's in-level
        # extent can exceed its level's own size <= span (_v5_span) —
        # even for boxes outside the image. The fallback below is
        # unreachable, and keeping it is NOT free: its while carry
        # forced XLA to relayout-copy the [B, N, 49, C] pool (3 x
        # 0.73 ms/step at b8, %copy.15249/19/34 in the r4 v7 trace).
        return out[:, :n_in]

    # Exact fallback for RoIs whose feature-space span exceeds the
    # window (aspect ratio beyond ~(SPAN/28)^2), as a `while_loop` that
    # runs ZERO iterations for the typical batch. Each iteration
    # re-pools the FALLBACK widest remaining RoIs per image via the
    # gather formulation and scatter-merges them, so any oversize count
    # is handled exactly in ceil(max_over / FALLBACK) iterations.
    #
    # Why a while and not a cond: `lax.cond` branches returning the
    # [B, N, 49, C] pool (~100 MB bf16 at b8) forced XLA to copy the
    # kernel output into the conditional's operand + result buffers —
    # 2 x 0.69 ms/stage of pure copies even when NO fallback ran
    # (perf/r3_12 %cond.21/%copy.17915), and the unexecuted gather-all
    # branch's [B, N*49, R] temps (5 x 2.99 GB at b32) were allocated
    # anyway, OOMing large batches. The while carries the pool buffer
    # in place (XLA aliases loop carries) and its body only ever
    # materializes [fb, 49, C]-sized temps.
    from hrfuser_tpu.ops.roi_align import multilevel_roi_align
    num_levels = len(strides)
    inv_strides = jnp.asarray([1.0 / s for s in strides], rois.dtype)

    def span_of(rois_i):
        lvl = map_roi_levels(rois_i, num_levels, finest_scale)
        scale = inv_strides[lvl]
        return jnp.maximum((rois_i[:, 2] - rois_i[:, 0]) * scale,
                           (rois_i[:, 3] - rois_i[:, 1]) * scale)

    spans = jax.vmap(span_of)(rois)                      # [B, N]
    # margin: +1 hi-tap, +7 x-origin alignment shift. For v5 the
    # window covers every clipped RoI by construction (_v5_span), so
    # this threshold is unreachable and the while below runs zero
    # iterations — kept as a safety net (and for hypothetical pyramids
    # whose RoIs aren't image-clipped).
    thresh = jnp.asarray(span - 9, spans.dtype)
    fb = min(FALLBACK, n)

    # gather oracle emits (p, q); v2/v3's flat layout is (q, p)
    qp_flat = flat_out and variant in QP_VARIANTS

    def merge_widest(feats_i, rois_i, span_i, out_i):
        _, fb_idx = jax.lax.top_k(span_i, fb)
        fb_out = multilevel_roi_align(
            feats_i, rois_i[fb_idx], list(strides), out_size=out_size,
            sample_num=sample_num, finest_scale=finest_scale,
            gather_dtype=dt).astype(out_i.dtype)
        if qp_flat:
            fb_out = fb_out.swapaxes(1, 2)
        fb_out = fb_out.reshape((fb,) + out_i.shape[1:])
        mask = (span_i[fb_idx] > thresh).reshape(
            (fb,) + (1,) * (out_i.ndim - 1))
        out_i = out_i.at[fb_idx].set(
            jnp.where(mask, fb_out, out_i[fb_idx]))
        # mark the selected RoIs handled so the next iteration (if any)
        # picks the next-widest ones
        return out_i, span_i.at[fb_idx].set(-1.0)

    out, _ = jax.lax.while_loop(
        lambda c: (c[1] > thresh).any(),
        lambda c: jax.vmap(merge_widest)(feats, rois, c[1], c[0]),
        (out, spans))
    return out[:, :n_in]


@functools.lru_cache(maxsize=None)
def _make_pool_fn(strides, out_size, sample_num, finest_scale,
                  interpret, flat_out, variant):
    """Build the single-image entry with a custom vmap rule that maps
    straight onto the batched kernel grid (instead of jax's fallback
    loop-over-batch, which serialized 8 single-image Pallas calls)."""

    @jax.custom_batching.custom_vmap
    def fn(feats, rois):
        out = _pool_batched([f[None] for f in feats], rois[None],
                            strides, out_size, sample_num, finest_scale,
                            interpret, flat_out, variant)
        return out[0]

    @fn.def_vmap
    def fn_vmap_rule(axis_size, in_batched, feats, rois):  # noqa: ANN001
        feats_b, rois_b = in_batched
        feats = [f if b else jnp.broadcast_to(f[None],
                                              (axis_size,) + f.shape)
                 for f, b in zip(feats, feats_b)]
        if not rois_b:
            rois = jnp.broadcast_to(rois[None],
                                    (axis_size,) + rois.shape)
        out = _pool_batched(feats, rois, strides, out_size, sample_num,
                            finest_scale, interpret, flat_out, variant)
        return out, True

    return fn


@functools.partial(jax.jit, static_argnames=('strides', 'out_size',
                                             'sample_num', 'finest_scale',
                                             'interpret', 'flat_out',
                                             'variant'))
def multilevel_roi_align_pallas(feats, rois: Array,
                                strides=(4, 8, 16, 32),
                                out_size: int = 7, sample_num: int = 2,
                                finest_scale: int = 56,
                                interpret: bool = False,
                                flat_out: bool = False,
                                variant: str = 'v7') -> Array:
    """Fused RoIAlign over an FPN pyramid (single image; `vmap` maps
    onto a native (batch, chunk) kernel grid).

    Args:
        feats: per-level [H_l, W_l, C] maps, same C; C a multiple of
            128 (256 in all shipped configs).
        rois: [N, 4] boxes in image coordinates; N % CHUNK == 0 (the
            detector's fixed RoI counts are 512/1000... padded to 8).
        flat_out: return [N, out*out, C] in the kernel's native (p, q)
            row order instead of [N, out, out, C] — consumers that
            flatten anyway (the 2FC head) skip a re-tiling relayout.

    Returns:
        [N, out_size, out_size, C] bfloat16 (f32 dot accumulation, one
        intermediate + one final bf16 round) — identical sampling
        semantics to `multilevel_roi_align` (aligned=True, static
        sample grid).
    """
    assert sample_num > 0, (
        'the Pallas kernel needs a static sample grid; sample_num=0 '
        '(adaptive sampling_ratio=0 semantics) is served by the gather '
        'formulation — see CascadeRoIHead._pool routing')
    fn = _make_pool_fn(tuple(strides), out_size, sample_num,
                       finest_scale, interpret, flat_out, variant)
    return fn(list(feats), rois)
