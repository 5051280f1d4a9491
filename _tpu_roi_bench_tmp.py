"""Standalone TPU microbench: Pallas vs gather RoIAlign at eval scale."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from hrfuser_tpu.ops import multilevel_roi_align
from hrfuser_tpu.ops.pallas_roi_align import multilevel_roi_align_pallas

B, N, C = 8, 1000, 256
rng = np.random.default_rng(0)
feats = [jnp.asarray(rng.normal(0, 1, (B, 96 // 2**i, 160 // 2**i, C))
                     .astype(np.float32)) for i in range(4)]
x1 = rng.uniform(-10, 600, (B, N)); y1 = rng.uniform(-10, 350, (B, N))
w = rng.uniform(4, 400, (B, N)); h = rng.uniform(4, 250, (B, N))
rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32))

pallas_fn = jax.jit(jax.vmap(lambda fs, r: multilevel_roi_align_pallas(
    [f for f in fs], r, (4, 8, 16, 32))))
gather_fn = jax.jit(jax.vmap(lambda fs, r: multilevel_roi_align(
    [f for f in fs], r, [4, 8, 16, 32], gather_dtype=jnp.bfloat16)))

def sync(x):
    return float(np.asarray(jnp.sum(x[:2, :2, 0, 0, 0])))

for name, fn in (('pallas', pallas_fn), ('gather', gather_fn)):
    out = fn(feats, rois); sync(out)             # compile
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = fn(feats, rois)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f'{name}: p50={sorted(ts)[len(ts)//2]:.2f}ms over {len(ts)}')

# correctness on TPU
o1 = np.asarray(pallas_fn(feats, rois))
o2 = np.asarray(gather_fn(feats, rois))
print('max abs diff vs gather:', float(np.abs(o1 - o2).max()))
