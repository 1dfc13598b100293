"""GSCodec-Studio-TPU: a TPU-native (JAX/XLA/Pallas) Gaussian-splat rendering and
compression framework.

Capability parity target: JasonLSC/GSCodec_Studio (gsplat + compression). See
``SURVEY.md`` at the repo root for the structural analysis of the reference and
``BASELINE.md`` for the performance/quality targets.

The compute path is pure JAX (jnp + Pallas TPU kernels); the runtime around it
(entropy coding, PLAS sorting) uses native C++ via ctypes where the reference
used CUDA/C++ extensions.
"""

__version__ = "0.1.0"

from gscodec_studio_tpu.rendering import rasterization  # noqa: F401
