"""Lab probe: dense-packed chain kernel vs flax block chain on TPU.

Times an L-block HRFormer chain at the branch-0 money shape
([8, 96, 160, 18] bf16, the r640 flagship's thin-channel wall —
perf/r4_08: 60.75 ms at 3.5x lane padding) for both the production
flax path (cf layout, as the full model runs it) and the Pallas chain
kernel (`ops/pallas_chain.py`).

Usage: python tools/probe_chain.py [--blocks 2 6] [--iters 30]
       [--g 8] [--shape 96 160 18 1] [--batch 8]
"""

import argparse
import os.path as _osp
import sys as _sys
import time

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hrfuser_tpu.layers.attention import HRFormerBlock
from hrfuser_tpu.ops.pallas_chain import hrformer_chain


class Chain(nn.Module):
    n_blocks: int
    num_heads: int
    layout: str = 'cf'

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.n_blocks):
            x = HRFormerBlock(num_heads=self.num_heads, window_size=7,
                              mlp_ratio=4.0, layout=self.layout,
                              dtype=jnp.bfloat16, name=f'b{i}')(x, train)
        return x


def bench(fn, vs, xs, iters=30, sync=False):
    """Per-call timing with HOST MATERIALIZATION of a scalar from the
    output. On this stack `block_until_ready` does NOT reliably wait
    for pure-XLA executables (streamed flax chains measured a bogus
    0.02 ms/block, 60x below the K=18 MXU FLOP floor; per-call
    float(sum(out)) measures 35 ms); only a host-read value proves
    execution. `sync` is ignored (kept for CLI compat).
    """
    del sync
    def call(x):
        out = fn(vs, x) if vs is not None else fn(x)
        return float(jnp.sum(out.astype(jnp.float32)[:1, :1, :8, :8]))
    call(xs[0])                                   # warm
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        call(xs[i % len(xs)])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--blocks', type=int, nargs='+', default=[2, 6])
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--g', type=int, default=8)
    ap.add_argument('--shape', type=int, nargs=4, default=[96, 160, 18, 1],
                    help='H W C heads')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--sync', action='store_true',
                    help='hard-sync every call (exposes any async/'
                         'caching artifacts in the streaming timing)')
    args = ap.parse_args()
    h, w, c, heads = args.shape
    b = args.batch

    rng = np.random.default_rng(0)
    x_nhwc = jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.bfloat16)
    x_cf = x_nhwc.transpose(0, 3, 1, 2)
    # one UNIQUE input per iteration: repeated (executable, buffer)
    # pairs measure impossibly fast on this stack even with per-call
    # hard sync — some layer caches results
    xs = [jax.block_until_ready(x_cf * (1.0 + 1e-4 * i))
          for i in range(args.iters)]

    # per-call round-trip baseline (null jit), subtracted by the reader
    null = jax.jit(lambda a: a[:1, :1, :8, :8] * 1.0)
    nt = bench(null, None, xs, iters=args.iters)
    print(f'null-call baseline: {nt*1e3:.2f} ms', flush=True)

    for L in args.blocks:
        m = Chain(L, heads)
        vs = m.init(jax.random.PRNGKey(0), x_cf)
        flax_fn = jax.jit(lambda v, x: m.apply(v, x))
        t_flax = bench(flax_fn, vs, xs, iters=args.iters, sync=args.sync)

        blocks = [{'params': vs['params'][f'b{i}'],
                   'batch_stats': vs['batch_stats'][f'b{i}']}
                  for i in range(L)]

        def chain_fn(x, blocks=blocks, L=L):
            return hrformer_chain(x, blocks, num_heads=heads,
                                  group_windows=args.g)
        chain_jit = jax.jit(chain_fn)
        t_chain = bench(chain_jit, None, xs, iters=args.iters, sync=args.sync)

        # parity spot check on the same weights
        ref = np.asarray(flax_fn(vs, x_cf), np.float32)
        got = np.asarray(chain_jit(x_cf), np.float32)
        err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
        print(f'L={L}: flax {t_flax*1e3:8.2f} ms ({t_flax/L*1e3:6.2f}/blk)'
              f' | chain {t_chain*1e3:8.2f} ms ({t_chain/L*1e3:6.2f}/blk)'
              f' | speedup {t_flax/t_chain:5.2f}x | maxrelerr {err:.4f}',
              flush=True)


if __name__ == '__main__':
    main()
