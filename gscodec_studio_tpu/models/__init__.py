from gscodec_studio_tpu.models.splats import (  # noqa: F401
    create_splats,
    splat_activations,
    rgb_to_sh,
    sh_to_rgb,
)
