from gscodec_studio_tpu.parallel.distributed import (  # noqa: F401
    make_mesh,
    rasterize_sharded,
    distributed_render,
    distributed_train_step,
)
