"""Native C++ entropy stage: histogram, pair pack, unpack+re-block.

Cross-checks every native pass against the pure-Python/NumPy spec path on
the same data, plus the strict-walker fallback contract (malformed streams
return None and the Python path takes over).
"""

import numpy as np
import pytest

from lz4jpeg_tpu.models.jpeg import _CHANNEL_SHAPES, _split_symbols, _valid_symbols
from lz4jpeg_tpu.native import native_available, native_backend
from lz4jpeg_tpu.ops.huffman import (
    build_canonical_codebook,
    build_canonical_codebook_from_counts,
    pack_symbols,
    unpack_symbols,
)
from lz4jpeg_tpu.ops.rle import rle_encode_batched

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native backend not built"
)


def make_pairs(rng, n_blocks=64, block_size=64):
    """Valid padded RLE pairs + lengths the forward pass could produce."""
    vals = rng.integers(-40, 40, size=(n_blocks, block_size)).astype(np.int32)
    pairs, lengths = map(np.asarray, rle_encode_batched(vals))
    return pairs.astype(np.int32), lengths.astype(np.int32)


class TestHistogram:
    def test_matches_numpy_unique(self, rng):
        pairs, lengths = make_pairs(rng)
        native = native_backend()
        counts, total = native.rle_symbol_hist(pairs, lengths, 2048, 4096)
        symbols = _valid_symbols(pairs, lengths)
        assert total == len(symbols)
        values, ref_counts = np.unique(symbols, return_counts=True)
        (bins,) = np.nonzero(counts)
        np.testing.assert_array_equal(bins - 2048, values)
        np.testing.assert_array_equal(counts[bins], ref_counts)

    def test_codebook_from_counts_identical(self, rng):
        pairs, lengths = make_pairs(rng)
        native = native_backend()
        counts, _ = native.rle_symbol_hist(pairs, lengths, 2048, 4096)
        (bins,) = np.nonzero(counts)
        cb_counts = build_canonical_codebook_from_counts(
            bins.astype(np.int64) - 2048, counts[bins]
        )
        cb_ref = build_canonical_codebook(_valid_symbols(pairs, lengths))
        np.testing.assert_array_equal(cb_counts.symbols, cb_ref.symbols)
        np.testing.assert_array_equal(cb_counts.lengths, cb_ref.lengths)
        np.testing.assert_array_equal(cb_counts.codes, cb_ref.codes)

    def test_out_of_range_symbol_rejected(self):
        native = native_backend()
        pairs = np.array([[1, 5000]], np.int32)  # 5000 + 2048 >= 4096 bins
        with pytest.raises(RuntimeError):
            native.rle_symbol_hist(pairs, np.array([2], np.int32), 2048, 4096)


class TestPackPairs:
    def test_bitstream_identical_to_spec_path(self, rng):
        pairs, lengths = make_pairs(rng)
        symbols = _valid_symbols(pairs, lengths)
        cb = build_canonical_codebook(symbols)
        native = native_backend()
        packed_n, nbits_n = native.huff_pack_pairs(pairs, lengths, cb)
        packed_p, nbits_p = pack_symbols(symbols, cb)
        assert nbits_n == nbits_p
        assert packed_n == packed_p

    def test_symbol_outside_codebook_rejected(self, rng):
        pairs, lengths = make_pairs(rng)
        cb = build_canonical_codebook(
            _valid_symbols(pairs, lengths)[: len(pairs) // 2]
        )
        missing = set(_valid_symbols(pairs, lengths)) - set(cb.symbols)
        if not missing:
            pytest.skip("random draw covered the codebook")
        with pytest.raises(RuntimeError):
            native_backend().huff_pack_pairs(pairs, lengths, cb)


class TestUnpackPairs:
    def test_inverts_pack_and_matches_split_symbols(self, rng):
        pairs, lengths = make_pairs(rng)
        symbols = _valid_symbols(pairs, lengths)
        cb = build_canonical_codebook(symbols)
        packed, nbits = pack_symbols(symbols, cb)
        native = native_backend()
        got = native.huff_unpack_pairs(
            packed, nbits, cb, 64, pairs.shape[0], pairs.shape[1]
        )
        assert got is not None
        ref = _split_symbols(
            unpack_symbols(packed, nbits, cb), pairs.shape[0], pairs.shape[1], 64
        )
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])
        np.testing.assert_array_equal(got[0], pairs)
        np.testing.assert_array_equal(got[1], lengths)

    def test_malformed_stream_falls_back(self, rng):
        """A dangling half-pair (odd symbol count) makes the strict walker
        return None instead of guessing."""
        pairs, lengths = make_pairs(rng)
        symbols = _valid_symbols(pairs, lengths)
        cb = build_canonical_codebook(symbols)
        packed, nbits = pack_symbols(np.append(symbols, symbols[0]), cb)
        got = native_backend().huff_unpack_pairs(
            packed, nbits, cb, 64, pairs.shape[0], pairs.shape[1]
        )
        assert got is None

    def test_nonpositive_count_falls_back(self):
        cb = build_canonical_codebook(np.array([-1, 2, 2, 64], np.int64))
        packed, nbits = pack_symbols(np.array([-1, 2], np.int32), cb)
        got = native_backend().huff_unpack_pairs(packed, nbits, cb, 64, 4, 128)
        assert got is None

    def test_overfull_block_falls_back(self):
        """More pairs than a row can hold → strict walker refuses."""
        syms = np.array([1, 7] * 40, np.int32)  # 40 pairs, 40 counts of 1
        cb = build_canonical_codebook(np.append(syms, [5, 5]))
        packed, nbits = pack_symbols(syms, cb)
        got = native_backend().huff_unpack_pairs(packed, nbits, cb, 64, 1, 16)
        assert got is None

    def test_oversized_bit_count_rejected_before_native_read(self, rng):
        pairs, lengths = make_pairs(rng)
        symbols = _valid_symbols(pairs, lengths)
        cb = build_canonical_codebook(symbols)
        packed, nbits = pack_symbols(symbols, cb)
        with pytest.raises(ValueError, match="exceeds packed buffer"):
            native_backend().huff_unpack_pairs(
                packed, 8 * len(packed) + 64, cb, 64, pairs.shape[0], pairs.shape[1]
            )


class TestPerBlockHuffman:
    """Native per-block parity Huffman must reproduce the oracle's quirky
    bitstrings exactly (heap without sift-up, first-seen frequency order,
    DFS '0'/'1' codes — JPEG.c:844-1097)."""

    def test_matches_oracle_random(self, rng):
        from lz4jpeg_tpu.native import native_available, native_backend
        from lz4jpeg_tpu.oracle import jpeg_oracle

        if not native_available():
            pytest.skip("native backend not built")
        nb = native_backend()
        N, W = 120, 128
        pairs = np.zeros((N, W), np.int32)
        lengths = rng.integers(1, W + 1, size=N).astype(np.int32)
        for i in range(N):
            n = lengths[i]
            pairs[i, :n] = rng.integers(-999, 1025, size=n)
            if i % 3 == 0:
                pairs[i, :n] = rng.integers(1, 5, size=n)
            if i % 7 == 0:
                lengths[i] = 1  # single-symbol block → empty-code quirk
        got = nb.huff_per_block(pairs, lengths)
        for i in range(N):
            ref, _root, _codes = jpeg_oracle.encode_huffman_oracle(
                [int(v) for v in pairs[i, : lengths[i]]]
            )
            assert got[i] == ref, f"block {i}"

    def test_out_of_domain_declines(self):
        from lz4jpeg_tpu.native import native_available, native_backend

        if not native_available():
            pytest.skip("native backend not built")
        # symbol -1001 collides with the reference's internal marker (its
        # tree walk is undefined there) — the native pass must decline.
        bad = np.full((1, 4), -1001, np.int32)
        assert (
            native_backend().huff_per_block(
                bad, np.asarray([4], np.int32)
            )
            is None
        )


class TestCrc32Export:
    def test_matches_zlib_incremental(self, rng):
        import zlib

        nb = native_backend()
        data = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
        assert nb.crc32(data) == zlib.crc32(data)
        mid = nb.crc32(data[:1000])
        assert nb.crc32(data[1000:], mid) == zlib.crc32(data)


class TestPerBlockBufferRetry:
    def test_adversarial_wide_block_succeeds_natively(self, rng):
        """A 128-unique-symbol block can emit code lengths far above the
        64-chars/symbol first-guess buffer; the doubled-buffer retry must
        keep it on the native path instead of silently falling back."""
        from lz4jpeg_tpu.oracle import jpeg_oracle

        # Exponential-ish frequencies force a deep (quirky) Huffman tree.
        syms = []
        for i in range(64):
            syms.extend([i - 32] * (2 ** min(i // 4, 12)))
        pairs_list = syms[:4096]
        n = len(pairs_list)
        pairs = np.zeros((1, n), np.int32)
        pairs[0, :] = pairs_list
        got = native_backend().huff_per_block(
            pairs, np.asarray([n], np.int32)
        )
        assert got is not None
        ref, _root, _codes = jpeg_oracle.encode_huffman_oracle(pairs_list)
        assert got[0] == ref
