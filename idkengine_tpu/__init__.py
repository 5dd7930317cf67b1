"""idkengine_tpu — a TPU-native rendering framework with IDKEngine's capabilities.

Rebuilt from scratch for JAX/XLA/Pallas on TPU (not a port of the C#/OpenGL
reference at BoyBaykiller/IDKEngine). The compute core is a fixed-shape
wavefront path tracer over SoA ray megabatches; the host side is a C++
SweepSAH+PreSplitting BVH builder, glTF scene database, animation and
collision system.

Layer map (mirrors SURVEY.md §1, re-architected for TPU):
  utils/     core math, compression, RNG, sorting          (ref: Source/Utils)
  bvh/       C++ SweepSAH BLAS + PLOC TLAS + device refit  (ref: Source/Bvh)
  scene/     glTF loader, SoA scene DB, animation, lights  (ref: ModelLoader/ModelManager)
  ops/       jnp/Pallas intersection + trace kernels       (ref: Resource/Shaders/include)
  render/    path tracer, deferred pipeline, post stack    (ref: Source/Render)
  parallel/  jax.sharding mesh / shard_map helpers         (ref: none — single GPU)
"""

__version__ = "0.1.0"

from . import collision, profiling, recorder  # noqa: E402,F401
from .engine import Engine, EngineSettings, RenderMode  # noqa: E402,F401
