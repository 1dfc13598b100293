"""Core differentiable splat ops (TPU-native equivalents of gsplat's CUDA layer).

Every op here is a pure function over jnp arrays, differentiable with
``jax.grad`` (hand-written Pallas VJPs are attached only where autodiff would
be slow, i.e. the tile rasterizer). Reference parity notes cite
``/root/reference`` file:line in each docstring.
"""

from gscodec_studio_tpu.ops.quat import (  # noqa: F401
    normalize_quat,
    quat_to_rotmat,
    quat_scale_to_covar,
    quat_scale_to_covar_preci,
)
from gscodec_studio_tpu.ops.transforms import world_to_cam  # noqa: F401
from gscodec_studio_tpu.ops.projection import (  # noqa: F401
    persp_proj,
    ortho_proj,
    fisheye_proj,
    proj,
    fully_fused_projection,
)
from gscodec_studio_tpu.ops.sh import spherical_harmonics, num_sh_bases  # noqa: F401
from gscodec_studio_tpu.ops.isect import isect_tiles, isect_offset_encode  # noqa: F401
from gscodec_studio_tpu.ops.relocation import compute_relocation  # noqa: F401
