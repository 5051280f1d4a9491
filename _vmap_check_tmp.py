import os
os.environ['HRFUSER_NO_JAX_CACHE'] = '1'
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
from hrfuser_tpu.ops import multilevel_roi_align
from hrfuser_tpu.ops.pallas_roi_align import multilevel_roi_align_pallas

rng = np.random.default_rng(0)
B = 2
feats = [jnp.asarray(rng.normal(0, 1, (B, 32 // 2**i, 48 // 2**i, 256))
                     .astype(np.float32)) for i in range(4)]
rois = jnp.asarray(rng.uniform(0, 120, (B, 16, 4)).astype(np.float32))
rois = rois.at[..., 2:].set(rois[..., :2] + 8 + rois[..., 2:])

def per_img(fs, r):
    return multilevel_roi_align_pallas([f for f in fs], r,
                                       (4, 8, 16, 32), interpret=True)

out = jax.vmap(per_img)(feats, rois)
ref = jax.vmap(lambda fs, r: multilevel_roi_align(
    [f for f in fs], r, [4, 8, 16, 32],
    gather_dtype=jnp.bfloat16))(feats, rois)
print('vmap ok', out.shape,
      float(np.abs(np.asarray(out) - np.asarray(ref)).max()))
