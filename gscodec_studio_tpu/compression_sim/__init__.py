from gscodec_studio_tpu.compression_sim.ops import (  # noqa: F401
    fake_quantize_ste,
    log_transform,
    inverse_log_transform,
    ste_binary,
)
from gscodec_studio_tpu.compression_sim.entropy_model import (  # noqa: F401
    init_factorized,
    factorized_bits,
)
from gscodec_studio_tpu.compression_sim.ada_mask import (  # noqa: F401
    annealing_mask_apply,
    annealing_mask_sparsity_loss,
)
from gscodec_studio_tpu.compression_sim.simulation import (  # noqa: F401
    CompressionSimulation,
)
