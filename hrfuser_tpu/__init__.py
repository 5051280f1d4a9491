"""HRFuser-TPU: a TPU-native multi-modal 2D detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
timbroed/HRFuser (multi-resolution multi-modal sensor fusion with an
HRFormer backbone, MWCA fusion blocks and a Cascade R-CNN head), designed
TPU-first: NHWC layouts, static shapes everywhere, jit-compiled inference
and training, sharding via jax.sharding.Mesh.
"""

from hrfuser_tpu.version import __version__  # noqa: F401
