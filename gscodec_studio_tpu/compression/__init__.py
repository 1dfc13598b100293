from gscodec_studio_tpu.compression.png_compression import (  # noqa: F401
    PngCompression,
    compressed_size,
)
from gscodec_studio_tpu.compression.entropy_coding import (  # noqa: F401
    EntropyCodingCompression,
)
from gscodec_studio_tpu.compression.outlier_filter import filter_splats  # noqa: F401
from gscodec_studio_tpu.compression.sort import sort_splats  # noqa: F401
