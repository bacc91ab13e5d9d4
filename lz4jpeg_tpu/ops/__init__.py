"""Batched TPU kernels (jnp + Pallas) for the codec pipelines.

Each op has a jnp implementation (XLA-fused, the default) verified
coefficient-exactly against ``oracle/``, and — for the hot paths — a Pallas
kernel tuned for the MXU/VPU (``ops/pallas_kernels.py``).
"""

from lz4jpeg_tpu.ops.color import (  # noqa: F401
    rgb_to_ycbcr,
    chroma_subsample_422,
    ycbcr_to_rgb_mcus,
)
from lz4jpeg_tpu.ops.dct import (  # noqa: F401
    dct_basis,
    dct2_batched,
    idct2_batched,
)
from lz4jpeg_tpu.ops.quantize import quantize, dequantize  # noqa: F401
from lz4jpeg_tpu.ops.zigzag import zigzag, reverse_zigzag  # noqa: F401
from lz4jpeg_tpu.ops.rle import rle_encode_batched, rle_decode_batched  # noqa: F401
