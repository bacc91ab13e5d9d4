from lz4jpeg_tpu.utils.parity import (  # noqa: F401
    quantization_tie_mask,
    assert_quantized_parity,
)
from lz4jpeg_tpu.utils.stats import trimmed_mean, median  # noqa: F401
