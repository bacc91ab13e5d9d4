from lz4jpeg_tpu.formats.lz4_frame import (  # noqa: F401
    Sequence,
    Block,
    pack_frame,
    unpack_frame,
    apply_sequences,
    decode_frame_bytes,
)
