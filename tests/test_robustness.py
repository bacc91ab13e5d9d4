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
        # Cutting the frame at ANY strict-prefix byte boundary must RAISE
        # the typed error (the frame's trailing-bytes check makes every
        # strict prefix invalid); the full frame must round-trip exactly.
        data = b"the quick brown fox " * 40
        enc = fast_frame.encode_fast(data)
        assert fast_frame.decode_fast(enc) == data
        for cut in range(len(enc)):
            with pytest.raises(fast_frame.FastFormatError):
                fast_frame.decode_fast(enc[:cut])

    def test_bad_version(self):
        enc = bytearray(fast_frame.encode_fast(b"x" * 100))
        enc[4] = 99
        with pytest.raises(fast_frame.FastFormatError):
            fast_frame.decode_fast(bytes(enc))

    def test_corrupt_offset(self):
        # Flipping any early payload byte must either raise the typed error
        # or be caught by the content checksum — silent wrong bytes are a
        # test failure, not a pass.
        data = b"abcdabcdabcdabcd" * 50
        enc = bytearray(fast_frame.encode_fast(data))
        for flip in range(24, min(len(enc), 60)):
            mutated = bytearray(enc)
            mutated[flip] ^= 0xFF
            try:
                got = fast_frame.decode_fast(bytes(mutated))
            except fast_frame.FastFormatError:
                continue
            assert got == data, f"silent corruption at byte {flip}"

    def test_native_rejects_corrupt(self):
        from lz4jpeg_tpu.native import native_available, native_backend

        if not native_available():
            pytest.skip("native backend not built")
        enc = bytearray(native_backend().encode_fast(b"abcd" * 1000))
        enc[10] ^= 0xFF  # corrupt raw_size
        with pytest.raises(RuntimeError):
            native_backend().decode_fast(bytes(enc), 4000)


class TestMutationFuzz:
    """Seeded byte-mutation fuzz: every decoder must either raise its typed
    error or return bit-exact bytes — never garbage, never crash with an
    untyped exception.  The LZ4T content checksum (CRC32 folded to 16 bits
    in the header) is what makes this assertable: corrupt-but-parseable
    streams fail verification instead of decoding silently wrong.
    """

    TRIALS = 300

    @pytest.fixture(scope="class")
    def lz4t_case(self):
        rng = np.random.default_rng(0xC0FFEE)
        data = bytes(rng.integers(32, 127, size=8000, dtype=np.uint8))
        # Make it compressible so real match sequences exist.
        data = data[:2000] * 4
        return data, fast_frame.encode_fast(data)

    def _mutations(self, frame: bytes, seed: int):
        rng = np.random.default_rng(seed)
        for _ in range(self.TRIALS):
            mutated = bytearray(frame)
            pos = int(rng.integers(0, len(frame)))
            bit = int(rng.integers(0, 8))
            mutated[pos] ^= 1 << bit
            yield bytes(mutated), pos

    def test_lz4t_python_spec(self, lz4t_case):
        data, frame = lz4t_case
        for mutated, pos in self._mutations(frame, 1):
            try:
                got = fast_frame.decode_fast(mutated)
            except fast_frame.FastFormatError:
                continue
            assert got == data, f"silent corruption (flip at {pos})"

    def test_lz4t_native(self, lz4t_case):
        from lz4jpeg_tpu.native import native_available, native_backend

        if not native_available():
            pytest.skip("native backend not built")
        data, frame = lz4t_case
        nb = native_backend()
        for mutated, pos in self._mutations(frame, 2):
            try:
                got = nb.decode_fast(mutated, len(data))
            except RuntimeError:
                continue
            assert got == data, f"native silent corruption (flip at {pos})"

    def test_lz4t_device_copy_program(self, lz4t_case):
        # The device decoder's host framing pass + checksum gate share the
        # same contract (the resolve itself is bit-verified elsewhere).
        from lz4jpeg_tpu.ops.lz4t_decode import decode_fast_device

        data, frame = lz4t_case
        for mutated, pos in self._mutations(frame, 3):
            if self.TRIALS > 60 and pos % 5:
                continue  # the device round trip is slow; sample positions
            try:
                got = decode_fast_device(mutated)
            except fast_frame.FastFormatError:
                continue
            assert got == data, f"device silent corruption (flip at {pos})"

    def test_parity_frame_never_crashes_untyped(self, golden_compressed):
        # The parity format is the reference's wire format — no room for a
        # checksum, so content flips may legally decode to different bytes;
        # the contract is "typed error or some decode", never IndexError/
        # struct.error/overflow.
        for mutated, _pos in self._mutations(golden_compressed, 4):
            try:
                decode_frame_bytes(mutated)
            except FormatError:
                pass

    def test_jpeg_container_typed_or_shaped(self, rng):
        from lz4jpeg_tpu.config import JPEGConfig
        from lz4jpeg_tpu.formats.jpeg_container import pack_container
        from lz4jpeg_tpu.models.jpeg import JPEGPipeline

        pipe = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        blob = pack_container(pipe.encode(img))
        # TJPG v2's folded CRC32 covers the header AND the whole payload
        # (formats/jpeg_container.py), so the assertable contract is the
        # strong one: any bit flip is a typed error or decodes BIT-EXACT
        # to the unmutated stream (a 1/65535 fold collision is possible in
        # principle; these seeds are deterministic, so none occurs here).
        baseline = np.asarray(pipe.decode(unpack_container(blob)))
        fuzz_rng = np.random.default_rng(5)
        for _ in range(60):  # entropy decode is heavier; fewer trials
            mutated = bytearray(blob)
            pos = int(fuzz_rng.integers(0, len(blob)))
            mutated[pos] ^= 1 << int(fuzz_rng.integers(0, 8))
            try:
                enc = unpack_container(bytes(mutated))
                rec = pipe.decode(enc)
            except (JPEGContainerError, ValueError, RuntimeError):
                continue  # typed rejection (container, bounds, native walker)
            assert (np.asarray(rec) == baseline).all(), (
                f"silent corruption passed the checksum (flip at {pos})"
            )


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
