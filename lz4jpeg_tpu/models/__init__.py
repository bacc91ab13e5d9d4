from lz4jpeg_tpu.models.jpeg import JPEGPipeline, JPEGEncoded  # noqa: F401
from lz4jpeg_tpu.models.lz4 import LZ4Codec  # noqa: F401
from lz4jpeg_tpu.models.lzw import lzw_encode, lzw_decode  # noqa: F401
