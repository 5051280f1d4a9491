"""HRFuser-TPU: a TPU-native multi-modal 2D detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
timbroed/HRFuser (multi-resolution multi-modal sensor fusion with an
HRFormer backbone, MWCA fusion blocks and a Cascade R-CNN head), designed
TPU-first: NHWC layouts, static shapes everywhere, jit-compiled inference
and training, sharding via jax.sharding.Mesh.
"""

import os as _os

from hrfuser_tpu.version import __version__  # noqa: F401


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt out: HRFUSER_NO_JAX_CACHE=1).

    This host class has few CPU cores and model-sized XLA programs take
    minutes to compile; caching amortizes that across processes (tests,
    tools, bench)."""
    if _os.environ.get('HRFUSER_NO_JAX_CACHE'):
        return
    if _os.environ.get('JAX_PLATFORMS', '').strip().lower() == 'cpu':
        # never cache on CPU: this jaxlib's CPU AOT loader rejects its own
        # cached executables (spurious machine-feature mismatch -> abort)
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            'HRFUSER_JAX_CACHE_DIR',
            _os.path.expanduser('~/.cache/hrfuser_jax_cache'))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:                                    # pragma: no cover
        pass


_enable_compilation_cache()
