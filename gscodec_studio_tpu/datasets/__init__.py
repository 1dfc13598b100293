from gscodec_studio_tpu.datasets.colmap import Parser, Dataset  # noqa: F401
