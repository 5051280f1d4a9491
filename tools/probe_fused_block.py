"""Scratch: flax vs fused block cost measured as a 10-deep chain in ONE jit
(amortizes the axon-platform per-call input relayout that polluted the
single-call probes)."""
import sys, time, jax, jax.numpy as jnp
from hrfuser_tpu.layers.attention import HRFormerBlock
from hrfuser_tpu.ops.pallas_block import fused_hrformer_block

H, W, C, HEADS = (96, 160, 18, 1) if len(sys.argv) < 2 else map(int, sys.argv[1:5])
B, DEPTH = 8, 10
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, C), jnp.float32).astype(jnp.bfloat16)

blk = HRFormerBlock(num_heads=HEADS, window_size=7, dtype=jnp.bfloat16)
v = blk.init(jax.random.PRNGKey(1), x, True)
v = {'params': v['params'], 'batch_stats': v['batch_stats']}

def chain(fn):
    def g(x):
        for _ in range(DEPTH):
            x = fn(x)
            x = x / (1.0 + jnp.max(jnp.abs(x)))  # keep values sane
        return x
    return jax.jit(g)

for name, fn in [
    ('flax', lambda x: blk.apply(v, x, False)),
    ('fused', lambda x: fused_hrformer_block(x, v, num_heads=HEADS, window=7)),
]:
    f = chain(fn)
    t0 = time.perf_counter(); r = f(x); r.block_until_ready()
    print(name, 'compile+run', round(time.perf_counter() - t0, 1), 's')
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(x)
    r.block_until_ready()
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f'{name}: {ms:.3f} ms / {DEPTH} blocks = {ms/DEPTH:.3f} ms/block')
