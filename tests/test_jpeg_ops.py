"""Stage-by-stage parity of the batched JAX JPEG ops against the oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from lz4jpeg_tpu.ops import (
    chroma_subsample_422,
    dct2_batched,
    idct2_batched,
    quantize,
    reverse_zigzag,
    rgb_to_ycbcr,
    rle_decode_batched,
    rle_encode_batched,
    zigzag,
)
from lz4jpeg_tpu.ops.color import merge_mcus, split_mcus
from lz4jpeg_tpu.ops.quantize import (
    CHROMINANCE_QUANTIZATION_TABLE,
    LUMINANCE_QUANTIZATION_TABLE,
)
from lz4jpeg_tpu.oracle import jpeg_oracle as oracle


def noise(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestColor:
    def test_ycbcr_matches_oracle_f64(self, rng):
        img = noise(rng, 16, 24)
        oy, ocr, ocb = oracle.build_ycbcr_planes(img, snap_ties=True)
        y, cr, cb = rgb_to_ycbcr(jnp.asarray(img), dtype=jnp.float64)
        np.testing.assert_array_equal(np.asarray(y), oy)
        np.testing.assert_array_equal(np.asarray(cr), ocr)
        np.testing.assert_array_equal(np.asarray(cb), ocb)

    def test_ycbcr_f32_close_to_oracle(self, rng):
        # The fast path may differ by ±1 at truncation boundaries.
        img = noise(rng, 32, 32)
        oy, _, _ = oracle.build_ycbcr_planes(img)
        y, _, _ = rgb_to_ycbcr(jnp.asarray(img), dtype=jnp.float32)
        assert np.abs(np.asarray(y).astype(int) - oy.astype(int)).max() <= 1

    def test_subsample_matches_oracle(self, rng):
        plane = rng.integers(0, 256, size=(8, 17), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(chroma_subsample_422(jnp.asarray(plane))),
            oracle.chroma_subsample(plane),
        )

    def test_split_mcus_matches_divide_image(self, rng):
        img = noise(rng, 24, 16)
        oy, ocr, ocb = oracle.build_ycbcr_planes(img)
        ocr_s, ocb_s = oracle.chroma_subsample(ocr), oracle.chroma_subsample(ocb)
        planes = oracle.divide_image(oy, ocr_s, ocb_s)
        lum, r, b = split_mcus(
            jnp.asarray(oy), jnp.asarray(ocr_s), jnp.asarray(ocb_s)
        )
        np.testing.assert_array_equal(
            np.asarray(lum).reshape(-1, 64), planes.lum
        )
        np.testing.assert_array_equal(np.asarray(r).reshape(-1, 32), planes.r)
        np.testing.assert_array_equal(np.asarray(b).reshape(-1, 32), planes.b)

    def test_merge_inverts_split(self, rng):
        plane = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        lum, _, _ = split_mcus(
            jnp.asarray(plane),
            jnp.zeros((16, 8), jnp.uint8),
            jnp.zeros((16, 8), jnp.uint8),
        )
        np.testing.assert_array_equal(
            np.asarray(merge_mcus(lum, 2, 2)), plane
        )


class TestDCTParity:
    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_dct_f64_bitwise_close(self, rng, w, h):
        # Matmul ordering differs from the oracle's sequential summation,
        # so raw coefficients agree to ~1e-10 (not bit-equal).
        tiles = rng.integers(0, 256, size=(5, h, w), dtype=np.uint8)
        ours = np.asarray(dct2_batched(jnp.asarray(tiles), jnp.float64))
        for i in range(5):
            ref = oracle.dct2d_oracle(tiles[i].reshape(-1), w, h)
            np.testing.assert_allclose(
                ours[i].reshape(-1), ref, rtol=0, atol=1e-9
            )

    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_quantized_coefficients_exact_f64(self, rng, w, h):
        # The correctness gate: quantized coefficients match the oracle
        # exactly under deterministic tie handling, and match the
        # bug-compatible C behavior everywhere except quantization ties
        # (where the C's own result is an ulp artifact).
        from lz4jpeg_tpu.utils import assert_quantized_parity

        table = (
            LUMINANCE_QUANTIZATION_TABLE
            if w == 8
            else CHROMINANCE_QUANTIZATION_TABLE
        )
        tiles = rng.integers(0, 256, size=(32, h, w), dtype=np.uint8)
        coeff = dct2_batched(jnp.asarray(tiles), jnp.float64)
        q = np.asarray(quantize(coeff, table.reshape(h, w)))
        for i in range(32):
            c64 = oracle.dct2d_oracle(tiles[i].reshape(-1), w, h)
            snapped = oracle.quantize_oracle(c64, table, snap_ties=True)
            np.testing.assert_array_equal(q[i].reshape(-1), snapped)
            c_faithful = oracle.quantize_oracle(c64, table)
            assert_quantized_parity(
                q[i].reshape(-1), c_faithful, c64, table
            )

    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_quantized_coefficients_f32_match_f64(self, rng, w, h):
        # The fast path must agree with exact mode after quantization on
        # noise inputs (f32 DCT error ≪ quantizer step away from ties).
        table = (
            LUMINANCE_QUANTIZATION_TABLE
            if w == 8
            else CHROMINANCE_QUANTIZATION_TABLE
        ).reshape(h, w)
        tiles = rng.integers(0, 256, size=(64, h, w), dtype=np.uint8)
        q32 = np.asarray(
            quantize(dct2_batched(jnp.asarray(tiles), jnp.float32), table)
        )
        q64 = np.asarray(
            quantize(dct2_batched(jnp.asarray(tiles), jnp.float64), table)
        )
        np.testing.assert_array_equal(q32, q64)

    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_idct_matches_oracle_f64(self, rng, w, h):
        table = (
            LUMINANCE_QUANTIZATION_TABLE
            if w == 8
            else CHROMINANCE_QUANTIZATION_TABLE
        )
        tiles = rng.integers(0, 256, size=(8, h, w), dtype=np.uint8)
        # Run the full forward+inverse with realistic (quantized) inputs.
        coeff = dct2_batched(jnp.asarray(tiles), jnp.float64)
        deq = np.asarray(quantize(coeff, table.reshape(h, w))) * table.reshape(h, w)
        ours = np.asarray(idct2_batched(jnp.asarray(deq), jnp.float64))
        for i in range(8):
            ref = oracle.idct2d_oracle(deq[i].reshape(-1), w, h)
            np.testing.assert_array_equal(ours[i].reshape(-1), ref)


class TestZigzagOps:
    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_zigzag_matches_oracle(self, rng, w, h):
        blocks = rng.normal(size=(6, h, w))
        zz = np.asarray(zigzag(jnp.asarray(blocks), w, h))
        for i in range(6):
            np.testing.assert_array_equal(
                zz[i], oracle.zigzag_oracle(blocks[i].reshape(-1), w, h)
            )

    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_reverse_zigzag_matches_oracle(self, rng, w, h):
        zz = rng.normal(size=(6, h * w))
        rec = np.asarray(reverse_zigzag(jnp.asarray(zz), w, h))
        for i in range(6):
            np.testing.assert_array_equal(
                rec[i], oracle.reverse_zigzag_oracle(zz[i], w, h)
            )


class TestRLEOps:
    def test_encode_matches_oracle(self, rng):
        values = np.trunc(rng.normal(scale=2, size=(10, 64)))
        pairs, lengths = rle_encode_batched(jnp.asarray(values, dtype=jnp.int32))
        pairs, lengths = np.asarray(pairs), np.asarray(lengths)
        for i in range(10):
            ref = oracle.rle_oracle(values[i])
            assert lengths[i] == len(ref)
            np.testing.assert_array_equal(pairs[i, : len(ref)], ref)
            assert np.all(pairs[i, len(ref):] == 0)  # zero padding

    def test_packed_int16_path_matches_int32_path(self, rng):
        # int16 inputs take the single-operand packed sort; the results
        # must be identical to the generic two-operand path, including at
        # the value-range extremes the packing bias must survive.
        values = np.trunc(rng.normal(scale=100, size=(64, 64))).astype(
            np.int16
        )
        values[0, :] = -1024  # DCT coefficient bound (±√64·128)
        values[1, ::2] = 1016
        p16, l16 = rle_encode_batched(jnp.asarray(values))
        p32, l32 = rle_encode_batched(jnp.asarray(values, dtype=jnp.int32))
        np.testing.assert_array_equal(np.asarray(p16), np.asarray(p32))
        np.testing.assert_array_equal(np.asarray(l16), np.asarray(l32))

    def test_decode_inverts_encode(self, rng):
        values = np.trunc(rng.normal(scale=2, size=(10, 64))).astype(np.int32)
        pairs, lengths = rle_encode_batched(jnp.asarray(values))
        out = np.asarray(rle_decode_batched(pairs, lengths, 64))
        np.testing.assert_array_equal(out, values)

    def test_decode_caps_and_pads_like_oracle(self):
        pairs = jnp.asarray([[10, 3, 0, 0]])
        lengths = jnp.asarray([2])
        out = np.asarray(rle_decode_batched(pairs, lengths, 4))
        np.testing.assert_array_equal(out[0], [3, 3, 3, 3])
        out2 = np.asarray(rle_decode_batched(jnp.asarray([[2, 7, 0, 0]]), lengths, 4))
        np.testing.assert_array_equal(out2[0], [7, 7, 0, 0])
