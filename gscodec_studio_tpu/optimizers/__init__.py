from gscodec_studio_tpu.optimizers.selective_adam import selective_adam  # noqa: F401
from gscodec_studio_tpu.optimizers.builders import build_splat_optimizers  # noqa: F401
