from gscodec_studio_tpu.strategy.default import DefaultStrategy  # noqa: F401
from gscodec_studio_tpu.strategy.mcmc import MCMCStrategy  # noqa: F401
