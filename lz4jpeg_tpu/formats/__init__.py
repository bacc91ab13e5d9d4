from lz4jpeg_tpu.formats.lz4_frame import (  # noqa: F401
    Sequence,
    Block,
    pack_frame,
    unpack_frame,
    apply_sequences,
    decode_frame_bytes,
)
from lz4jpeg_tpu.formats.fast_frame import (  # noqa: F401
    encode_fast,
    decode_fast,
    is_fast_frame,
)
from lz4jpeg_tpu.formats.jpeg_container import (  # noqa: F401
    pack_container,
    unpack_container,
    is_jpeg_container,
)
