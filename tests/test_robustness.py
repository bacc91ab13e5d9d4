"""Corrupt/adversarial input handling: clean errors, never crashes.

The reference crashes or silently corrupts on malformed streams (signed-
char UB, unchecked reads — SURVEY.md §2.1); the framework decoders must
reject them with typed errors instead.
"""

import numpy as np
import pytest

from lz4jpeg_tpu.formats import decode_frame_bytes, fast_frame
from lz4jpeg_tpu.formats.jpeg_container import (
    JPEGContainerError,
    unpack_container,
)
from lz4jpeg_tpu.formats.lz4_frame import FormatError


class TestParityFrameRobustness:
    def test_truncated_frame(self, golden_compressed):
        with pytest.raises(FormatError):
            decode_frame_bytes(golden_compressed[:20])

    def test_bad_block_size(self, golden_compressed):
        data = bytearray(golden_compressed)
        data[2] = 0xFF  # blow up the first block's byte_size
        with pytest.raises(FormatError):
            decode_frame_bytes(bytes(data))

    def test_trailing_garbage(self, golden_compressed):
        with pytest.raises(FormatError):
            decode_frame_bytes(golden_compressed + b"\x00\x01")

    def test_empty(self):
        with pytest.raises(FormatError):
            decode_frame_bytes(b"")


class TestFastFrameRobustness:
    def test_bad_magic(self):
        with pytest.raises(fast_frame.FastFormatError):
            fast_frame.decode_fast(b"NOPE" + b"\x00" * 20)

    def test_truncated(self):
        enc = fast_frame.encode_fast(b"hello world " * 100)
        with pytest.raises(fast_frame.FastFormatError):
            fast_frame.decode_fast(enc[: len(enc) // 2])

    def test_every_truncation_point_is_typed(self):
        # Cutting the frame at ANY byte boundary must yield the typed error.
        enc = fast_frame.encode_fast(b"the quick brown fox " * 40)
        for cut in range(len(enc)):
            try:
                fast_frame.decode_fast(enc[:cut])
            except fast_frame.FastFormatError:
                pass

    def test_bad_version(self):
        enc = bytearray(fast_frame.encode_fast(b"x" * 100))
        enc[4] = 99
        with pytest.raises(fast_frame.FastFormatError):
            fast_frame.decode_fast(bytes(enc))

    def test_corrupt_offset(self):
        # A match offset pointing before the stream start must be rejected.
        enc = bytearray(fast_frame.encode_fast(b"abcdabcdabcdabcd" * 50))
        # Flip payload bytes until the decoder objects (or output differs);
        # it must never crash with an unhandled exception type.
        for flip in range(24, min(len(enc), 60)):
            mutated = bytearray(enc)
            mutated[flip] ^= 0xFF
            try:
                fast_frame.decode_fast(bytes(mutated))
            except fast_frame.FastFormatError:
                pass

    def test_native_rejects_corrupt(self):
        from lz4jpeg_tpu.native import native_available, native_backend

        if not native_available():
            pytest.skip("native backend not built")
        enc = bytearray(native_backend().encode_fast(b"abcd" * 1000))
        enc[10] ^= 0xFF  # corrupt raw_size
        with pytest.raises(RuntimeError):
            native_backend().decode_fast(bytes(enc), 4000)


class TestContainerRobustness:
    def test_bad_magic(self):
        with pytest.raises(JPEGContainerError):
            unpack_container(b"\x00" * 32)

    def test_short(self):
        with pytest.raises(JPEGContainerError):
            unpack_container(b"\x01")

    def test_truncated_channel(self, rng):
        from lz4jpeg_tpu.config import JPEGConfig
        from lz4jpeg_tpu.formats.jpeg_container import pack_container
        from lz4jpeg_tpu.models.jpeg import JPEGPipeline

        pipe = JPEGPipeline(JPEGConfig(precision="exact", entropy="shared"))
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        blob = pack_container(pipe.encode(img))
        for cut in (10, len(blob) // 2, len(blob) - 10):
            with pytest.raises(JPEGContainerError):
                unpack_container(blob[:cut])


class TestPacked16WalkerFallback:
    def test_out_of_range_pairs_fall_back_to_int_path(self):
        """A (hostile or extreme-quality) stream whose pairs don't fit the
        packed-u16 layout (count > 64 or |value| > 511) must make the u16
        walker decline (None) while the int32 walker still decodes it —
        the container loader then falls back to the int layout."""
        from lz4jpeg_tpu.native import native_available, native_backend
        from lz4jpeg_tpu.ops.huffman import (
            build_canonical_codebook,
            pack_symbols,
        )

        if not native_available():
            pytest.skip("native backend not built")
        native = native_backend()
        # One 64-symbol block covered by a single run of count 64 but with
        # a value outside 10 bits.
        symbols = np.asarray([64, 600], np.int32)
        cb = build_canonical_codebook(symbols)
        packed, nbits = pack_symbols(symbols, cb)
        assert (
            native.huff_unpack_pairs16(packed, nbits, cb, 64, 1, 64) is None
        )
        got = native.huff_unpack_pairs(packed, nbits, cb, 64, 1, 128)
        assert got is not None
        np.testing.assert_array_equal(got[0][0, :2], [64, 600])
        # Same for an unrepresentable count.
        symbols = np.asarray([65, 5, 63, 7], np.int32)
        cb = build_canonical_codebook(symbols)
        packed, nbits = pack_symbols(symbols, cb)
        assert (
            native.huff_unpack_pairs16(packed, nbits, cb, 64, 2, 64) is None
        )


class TestOracleRobustness:
    def test_oracle_flags_ub_streams(self):
        from lz4jpeg_tpu.oracle.lz4_oracle import ParityError, lz4_decode_oracle

        # Frame block count >= 128 sign-extends in the reference decoder.
        with pytest.raises(ParityError):
            lz4_decode_oracle(bytes([0x80]) + b"\x00" * 10)


class TestHuffmanLimits:
    def test_overlong_codes_rejected(self):
        # Fibonacci-like counts force Huffman depth > 32; the codebook
        # builder must refuse rather than overflow uint32 codewords.
        from lz4jpeg_tpu.ops.huffman import build_canonical_codebook

        fib = [1, 1]
        while len(fib) < 40:
            fib.append(fib[-1] + fib[-2])
        symbols = np.concatenate(
            [np.full(c, i, np.int64) for i, c in enumerate(fib)]
        )
        with pytest.raises(ValueError, match="32-bit"):
            build_canonical_codebook(symbols)


class TestHuffmanUnpackBounds:
    def test_oversized_bit_count_rejected(self, rng):
        # nbits claiming more than the buffer holds must raise before any
        # native read (OOB protection for hostile containers).
        from lz4jpeg_tpu.ops.huffman import (
            build_canonical_codebook,
            pack_symbols,
            unpack_symbols,
        )

        symbols = rng.integers(0, 10, size=100).astype(np.int32)
        cb = build_canonical_codebook(symbols)
        packed, nbits = pack_symbols(symbols, cb)
        with pytest.raises(ValueError, match="exceeds packed buffer"):
            unpack_symbols(packed, 8 * len(packed) + 64, cb)
