"""Forward megakernel (ops/pallas_fwd.py) — interpret-mode parity.

The kernel must be bit-identical to the XLA reference chain: color
transform → 4:2:2 subsample → fused plane einsum → sparse-delta RLE
(the chain it replaces on TPU).  On-chip identity was measured at
0/268M mismatched coefficients (profiles/probe_megakernel.py)."""

import numpy as np
import jax.numpy as jnp

from lz4jpeg_tpu.ops.color import (
    chroma_subsample_422,
    rgb_to_ycbcr,
    split_mcus,
)
from lz4jpeg_tpu.ops.fused import fused_forward_jnp
from lz4jpeg_tpu.ops.pallas_fwd import (
    CB_SLICE,
    CR_SLICE,
    LUM_SLICE,
    forward_megakernel,
    rgb_to_kt,
    sparse_lengths,
)
from lz4jpeg_tpu.ops.quantize import (
    CHROMINANCE_QUANTIZATION_TABLE,
    LUMINANCE_QUANTIZATION_TABLE,
)
from lz4jpeg_tpu.ops.rle import rle_encode_sparse16


def _reference_sparse(rgb_batch):
    """Per-channel sparse streams through the staged XLA ops."""
    outs = {"lum": [], "r": [], "b": []}
    lens = {"lum": [], "r": [], "b": []}
    for frame in rgb_batch:
        y, cr, cb = rgb_to_ycbcr(jnp.asarray(frame), jnp.float32)
        lum, r, b = split_mcus(
            y, chroma_subsample_422(cr), chroma_subsample_422(cb)
        )
        for name, tiles, table, w, h in (
            ("lum", lum, LUMINANCE_QUANTIZATION_TABLE, 8, 8),
            ("r", r, CHROMINANCE_QUANTIZATION_TABLE, 4, 8),
            ("b", b, CHROMINANCE_QUANTIZATION_TABLE, 4, 8),
        ):
            zz = fused_forward_jnp(tiles, table, w, h)
            sp, ln = rle_encode_sparse16(zz.astype(jnp.int16))
            outs[name].append(np.asarray(sp))
            lens[name].append(np.asarray(ln))
    return (
        {c: np.concatenate(v) for c, v in outs.items()},
        {c: np.concatenate(v) for c, v in lens.items()},
    )


class TestForwardMegakernel:
    def test_bit_identical_to_xla_chain(self):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
        rgb[:, :, ::2] = rgb[:, :, 1::2]  # create runs
        ref, ref_lens = _reference_sparse(rgb)

        kt = rgb_to_kt(jnp.asarray(rgb))
        combined = np.asarray(
            forward_megakernel(
                kt, LUMINANCE_QUANTIZATION_TABLE,
                CHROMINANCE_QUANTIZATION_TABLE, interpret=True,
            )
        )
        assert combined.shape == (2 * 8 * 8, 128)
        assert np.array_equal(combined[:, LUM_SLICE], ref["lum"])
        assert np.array_equal(combined[:, CR_SLICE], ref["r"])
        assert np.array_equal(combined[:, CB_SLICE], ref["b"])

        lens = {k: np.asarray(v) for k, v in
                sparse_lengths(jnp.asarray(combined)).items()}
        for c in ("lum", "r", "b"):
            assert np.array_equal(lens[c], ref_lens[c])

    def test_rgb_to_kt_layout(self):
        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 256, size=(24, 16, 3)).astype(np.uint8)
        kt = np.asarray(rgb_to_kt(jnp.asarray(rgb)))
        assert kt.shape == (3, 64, (24 // 8) * (16 // 8))
        # block n=(bi*bw+bj), position k=(r*8+c) ↔ pixel (8bi+r, 8bj+c)
        for ch in range(3):
            for n, (bi, bj) in enumerate((i, j) for i in range(3) for j in range(2)):
                for k in (0, 9, 63):
                    r, c = k // 8, k % 8
                    assert kt[ch, k, n] == rgb[8 * bi + r, 8 * bj + c, ch]

    def test_padding_blocks_are_valid_streams(self):
        """N not a C_CHUNK multiple: padded blocks must decode to zeros
        (slot 0 = bias, rest zero) before the caller slices them off —
        asserted indirectly: output equals reference after slicing."""
        rng = np.random.default_rng(2)
        rgb = rng.integers(0, 256, size=(1, 8, 8, 3)).astype(np.uint8)
        ref, _ = _reference_sparse(rgb)
        kt = rgb_to_kt(jnp.asarray(rgb))
        combined = np.asarray(
            forward_megakernel(
                kt, LUMINANCE_QUANTIZATION_TABLE,
                CHROMINANCE_QUANTIZATION_TABLE, interpret=True,
            )
        )
        assert combined.shape == (1, 128)
        assert np.array_equal(combined[:, LUM_SLICE], ref["lum"])

    def test_quality_scaled_tables(self):
        from lz4jpeg_tpu.ops.quantize import scale_table

        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, size=(1, 32, 32, 3)).astype(np.uint8)
        lum_t = scale_table(LUMINANCE_QUANTIZATION_TABLE, 80)
        chr_t = scale_table(CHROMINANCE_QUANTIZATION_TABLE, 80)

        outs = {"lum": [], "r": [], "b": []}
        y, cr, cb = rgb_to_ycbcr(jnp.asarray(rgb[0]), jnp.float32)
        lum, r, b = split_mcus(
            y, chroma_subsample_422(cr), chroma_subsample_422(cb)
        )
        for name, tiles, table, w, h in (
            ("lum", lum, lum_t, 8, 8),
            ("r", r, chr_t, 4, 8),
            ("b", b, chr_t, 4, 8),
        ):
            zz = fused_forward_jnp(tiles, table, w, h)
            sp, _ = rle_encode_sparse16(zz.astype(jnp.int16))
            outs[name] = np.asarray(sp)

        kt = rgb_to_kt(jnp.asarray(rgb))
        combined = np.asarray(
            forward_megakernel(kt, lum_t, chr_t, interpret=True)
        )
        assert np.array_equal(combined[:, LUM_SLICE], outs["lum"])
        assert np.array_equal(combined[:, CR_SLICE], outs["r"])
        assert np.array_equal(combined[:, CB_SLICE], outs["b"])
