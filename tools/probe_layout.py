#!/usr/bin/env python
"""Layout probe: NHWC vs channels-first HRFormer block chain on TPU.

The r640 trace shows branch-0 elementwise/copy ops ([8,96,160,18])
running at ~14% lane utilization (C=18 minor of a 128-lane tile). This
probe jits a 6-block HRFormerBlock chain (the stage_c shape) in the
shipped NHWC formulation and in a hand-written channels-first
formulation (W minor -> full lanes), traces both, and prints wall +
device time so `tools/trace_ops.py` can attribute the difference.

Usage: python tools/probe_layout.py [--trace-dir /tmp/probe]
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 8, 96, 160, 18
HEADS, WS, BLOCKS, MLP = 1, 7, 6, 4


def sync(o):
    return float(np.asarray(jnp.sum(
        jax.tree_util.tree_leaves(o)[0].astype(jnp.float32))))


# ---------------------------------------------------------------- NHWC --

def nhwc_chain():
    from hrfuser_tpu.layers import HRFormerBlock
    from flax import linen as nn

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(BLOCKS):
                x = HRFormerBlock(num_heads=HEADS, window_size=WS,
                                  mlp_ratio=MLP, dtype=jnp.bfloat16,
                                  name=f'b{i}')(x, False)
            return x

    m = Chain()
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (B, H, W, C)),
                    jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    fn = jax.jit(lambda v, x: m.apply(v, x))
    return fn, vs, x


# ------------------------------------------------------ channels-first --

def _ln_cf(x, scale, bias, eps=1e-6):
    """LayerNorm over the C axis of [B, C, H, W]."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=1, keepdims=True)
    cen = xf - mean
    var = (cen * cen).mean(axis=1, keepdims=True)
    inv = jnp.where(var > 0.0, jax.lax.rsqrt(var + eps), 0.0)
    y = cen * inv * scale[None, :, None, None] + bias[None, :, None, None]
    return y.astype(x.dtype)


def _dense_cf(x, kernel, bias):
    """1x1 'dense' over C of [B, C, H, W]: einsum contraction."""
    y = jnp.einsum('bchw,cd->bdhw', x, kernel.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y + bias.astype(x.dtype)[None, :, None, None]


def _bn_cf(x, scale, bias):
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _dw3x3_cf(x, k, bias):
    """Depthwise 3x3 as shifted FMAs on [B, C, H, W]."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    y = None
    for dy in range(3):
        for dx in range(3):
            t = xp[:, :, dy:dy + H, dx:dx + W] * k[dy, dx][None, :, None,
                                                           None]
            y = t if y is None else y + t
    return y + bias[None, :, None, None]


def cf_block(x, p):
    """HRFormerBlock on [B, C, H, W] (eval mode, head count 1)."""
    # --- LSA ---
    n = _ln_cf(x, p['ln1_s'], p['ln1_b'])
    qkv = _dense_cf(n, p['qkv_k'], p['qkv_b'])          # [B, 3C, H, W]
    # center pad to window multiples
    ph = (H + WS - 1) // WS * WS - H
    pw = (W + WS - 1) // WS * WS - W
    pt, pl = ph // 2, pw // 2
    qkv = jnp.pad(qkv, ((0, 0), (0, 0), (pt, ph - pt), (pl, pw - pl)))
    hp, wp = H + ph, W + pw
    nh, nw = hp // WS, wp // WS
    qkv = qkv.reshape(B, 3, C, nh, WS, nw, WS)
    qkv = qkv.transpose(1, 0, 3, 5, 2, 4, 6).reshape(
        3, B * nh * nw, C, WS * WS)                     # [3, nW, C, 49]
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = C ** -0.5
    attn = jnp.einsum('wcn,wcm->wnm', q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + p['bias49']                            # [49, 49] RPE
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum('wnm,wcm->wcn', attn, v)            # [nW, C, 49]
    out = out.reshape(B, nh, nw, C, WS, WS).transpose(0, 3, 1, 4, 2, 5)
    out = out.reshape(B, C, hp, wp)[:, :, pt:pt + H, pl:pl + W]
    out = _dense_cf(out, p['out_k'], p['out_b'])
    x = x + out
    # --- CrossFFN ---
    n = _ln_cf(x, p['ln2_s'], p['ln2_b'])
    h1 = _bn_cf(_dense_cf(n, p['fc1_k'], p['fc1_b']), p['bn1_s'], p['bn1_b'])
    h1 = jax.nn.gelu(h1, approximate=False)
    h2 = _bn_cf(_dw3x3_cf(h1, p['dw_k'], p['dw_b']), p['bn2_s'], p['bn2_b'])
    h2 = jax.nn.gelu(h2, approximate=False)
    h3 = _bn_cf(_dense_cf(h2, p['fc2_k'], p['fc2_b']), p['bn3_s'], p['bn3_b'])
    h3 = jax.nn.gelu(h3, approximate=False)
    return x + h3


def cf_chain():
    rng = np.random.default_rng(1)
    hid = C * MLP

    def mk(*shape):
        return jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32)

    params = []
    for _ in range(BLOCKS):
        params.append(dict(
            ln1_s=mk(C), ln1_b=mk(C), qkv_k=mk(C, 3 * C), qkv_b=mk(3 * C),
            bias49=mk(WS * WS, WS * WS), out_k=mk(C, C), out_b=mk(C),
            ln2_s=mk(C), ln2_b=mk(C),
            fc1_k=mk(C, hid), fc1_b=mk(hid), bn1_s=mk(hid), bn1_b=mk(hid),
            dw_k=mk(3, 3, hid), dw_b=mk(hid), bn2_s=mk(hid), bn2_b=mk(hid),
            fc2_k=mk(hid, C), fc2_b=mk(C), bn3_s=mk(C), bn3_b=mk(C)))

    x = jnp.asarray(rng.normal(0, 1, (B, C, H, W)), jnp.float32)

    @jax.jit
    def fn(params, x):
        x = x.astype(jnp.bfloat16)
        for p in params:
            x = cf_block(x, p)
        return x

    return fn, params, x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trace-dir', default='')
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()

    runs = [('nhwc', *nhwc_chain()), ('cf', *cf_chain())]
    for name, fn, vs, x in runs:
        sync(fn(vs, x))                                  # compile
        if args.trace_dir:
            jax.profiler.start_trace(f'{args.trace_dir}/{name}')
        t0 = time.perf_counter()
        outs = [fn(vs, x) for _ in range(args.iters)]
        for o in outs:
            sync(o)
        dt = (time.perf_counter() - t0) / args.iters
        if args.trace_dir:
            jax.profiler.stop_trace()
        # wall time here is dispatch-floor bound (~40 ms/call on the
        # tunneled TPU); compare DEVICE time via tools/trace_ops.py
        print(f'{name}: {dt * 1e3:.2f} ms wall / {BLOCKS}-block chain '
              f'[{B},{H},{W},{C}]', flush=True)


if __name__ == '__main__':
    main()
