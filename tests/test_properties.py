"""Property-based tests (hypothesis) over the codec surfaces."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lz4jpeg_tpu.formats import fast_frame
from lz4jpeg_tpu.models.lzw import lzw_decode, lzw_encode
from lz4jpeg_tpu.oracle import lz4_decode_oracle, lz4_encode_oracle
from lz4jpeg_tpu.oracle.jpeg_oracle import (
    reverse_zigzag_oracle,
    zigzag_oracle,
)

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=300,
    max_size=2000,
)


@settings(max_examples=25, deadline=None)
@given(printable)
def test_lz4_oracle_roundtrip_printable(text):
    """The robust decoder round-trips every representable stream; the
    bug-compatible oracle decoder either agrees or correctly flags the
    reference's own UB (signed-char extension arithmetic fires on literal
    runs ≥ 143 — streams the reference encoder emits but its decoder
    corrupts)."""
    from lz4jpeg_tpu.formats import decode_frame_bytes
    from lz4jpeg_tpu.formats.lz4_frame import FormatError
    from lz4jpeg_tpu.oracle.lz4_oracle import ParityError

    data = text.encode("ascii")
    encoded = lz4_encode_oracle(data)
    try:
        robust = decode_frame_bytes(encoded)
    except FormatError:
        # Only legitimate for streams with >270-byte literal runs, which
        # the wrapped u8 extension cannot represent at all.
        longest = max(
            (len(r) for r in _literal_runs(data)), default=0
        )
        assert longest > 270
        return
    assert robust == data
    try:
        assert lz4_decode_oracle(encoded) == data
    except ParityError:
        pass  # reference decoder UB on its own encoder's output


def _literal_runs(data: bytes):
    """Literal runs of the oracle parse (between match emissions)."""
    from lz4jpeg_tpu.oracle.lz4_oracle import block_encode_oracle

    for start in range(0, len(data), 300):
        block = data[start : start + 300]
        for seq in block_encode_oracle(block).sequences:
            yield seq.literals


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_fast_frame_roundtrip_any_bytes(data):
    assert fast_frame.decode_fast(fast_frame.encode_fast(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=500,
    )
)
def test_lzw_roundtrip_printable(text):
    data = text.encode("ascii")
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=8))
def test_zigzag_inverse_tall_shapes(w, h):
    # The reference's reverse formulas are only complete for w <= h (its
    # blocks are 8×8 and 4×8); see reverse_zigzag_indices.
    if w > h:
        return
    block = np.arange(w * h, dtype=np.float64)
    zz = zigzag_oracle(block, w, h)
    assert sorted(zz) == list(block)  # permutation
    np.testing.assert_array_equal(reverse_zigzag_oracle(zz, w, h), block)


def test_reverse_zigzag_wide_shape_incomplete():
    """Documents the reference quirk: for w > h its reverse enumeration
    covers only h² cells (it never uses such shapes)."""
    from lz4jpeg_tpu.oracle.jpeg_oracle import reverse_zigzag_indices

    assert len(reverse_zigzag_indices(8, 4)) == 16  # not 32


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-40, max_value=40), min_size=1, max_size=200))
def test_canonical_huffman_roundtrip(values):
    from lz4jpeg_tpu.ops.huffman import (
        build_canonical_codebook,
        pack_symbols,
        unpack_symbols,
    )

    symbols = np.asarray(values, np.int32)
    cb = build_canonical_codebook(symbols)
    packed, nbits = pack_symbols(symbols, cb)
    np.testing.assert_array_equal(unpack_symbols(packed, nbits, cb), symbols)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=-3, max_value=3), min_size=1, max_size=64))
def test_rle_oracle_inverse(values):
    from lz4jpeg_tpu.oracle.jpeg_oracle import inverse_rle_oracle, rle_oracle

    arr = np.asarray(values, np.float64)
    pairs = rle_oracle(arr)
    np.testing.assert_array_equal(
        inverse_rle_oracle(pairs, len(arr)), arr
    )
