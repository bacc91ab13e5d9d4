"""Bit-identity of the shipped Pallas RLE kernel vs the XLA sort path.

The Pallas inverse-butterfly (``ops/pallas_rle.py``) is the production
pack16 compaction for 64-lane blocks on TPU; on every backend its outputs
must equal ``ops/rle.py::rle_encode_packed16`` exactly — these tests pin
that in interpret mode (CPU), and the on-chip A/B
(``profiles/profile_pallas_rle_pack16.py``) re-asserts it on devices.
"""

import numpy as np
import pytest

from lz4jpeg_tpu.ops.pallas_rle import rle_encode_packed16_pallas
from lz4jpeg_tpu.ops.rle import rle_encode_packed16


def _check(vals):
    import jax
    import jax.numpy as jnp

    a = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
    b = rle_encode_packed16_pallas(jnp.asarray(vals), interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


class TestPallasRLEIdentity:
    @pytest.mark.parametrize("length", [64, 32])
    def test_random_blocks(self, rng, length):
        vals = rng.integers(-511, 512, size=(517, length)).astype(np.int16)
        _check(vals)

    @pytest.mark.parametrize("length", [64, 32])
    def test_runny_blocks(self, rng, length):
        rep = np.repeat(
            rng.integers(-511, 512, size=(300, (length + 7) // 8)), 8, axis=1
        )[:, :length]
        _check(rep.astype(np.int16))

    def test_edge_blocks(self):
        vals = np.zeros((6, 64), np.int16)
        vals[1] = 7  # constant nonzero
        vals[2, ::2] = 1  # alternating → 64 runs
        vals[3, :] = np.arange(64) - 32  # all distinct
        vals[4, 63] = -511
        vals[5, 0] = 511
        _check(vals)

    def test_row_count_not_multiple_of_segments(self, rng):
        # 64-lane blocks pack 2 per 128-lane row; odd counts exercise the
        # pad-and-trim path.
        vals = rng.integers(-511, 512, size=(7, 64)).astype(np.int16)
        _check(vals)

    def test_rejects_bad_length(self, rng):
        import jax.numpy as jnp

        with pytest.raises(ValueError):
            rle_encode_packed16_pallas(
                jnp.zeros((4, 48), jnp.int16), interpret=True
            )


class TestPallasKtIdentity:
    """Transposed-input (plane-layout) kernel: (R, K, C) blocks along the
    middle axis must produce exactly rle_encode_packed16 of the relayouted
    rows — the production forward path for width-1024-multiple images."""

    @pytest.mark.parametrize("shape", [(6, 64, 256), (10, 32, 128), (7, 64, 128)])
    def test_random(self, rng, shape):
        import jax
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.pallas_rle import rle_encode_packed16_pallas_kt

        r, k, c = shape
        kt = rng.integers(-511, 512, size=shape).astype(np.int16)
        kt[:, :, ::2] = np.repeat(kt[:, ::8, ::2], 8, axis=1)[:, :k]
        p, l = rle_encode_packed16_pallas_kt(jnp.asarray(kt), interpret=True)
        nk = np.transpose(kt, (0, 2, 1)).reshape(-1, k)
        rp, rl = jax.jit(rle_encode_packed16)(jnp.asarray(nk))
        np.testing.assert_array_equal(np.asarray(rp), np.asarray(p))
        np.testing.assert_array_equal(np.asarray(rl), np.asarray(l))

    def test_rejects_unaligned_columns(self):
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.pallas_rle import rle_encode_packed16_pallas_kt

        with pytest.raises(ValueError):
            rle_encode_packed16_pallas_kt(
                jnp.zeros((2, 64, 96), jnp.int16), interpret=True
            )


class TestPlaneEinsumIdentity:
    """The plane-view fused einsum must match the tile matmul path
    coefficient-for-coefficient (verified on-chip too; this pins the CPU
    lowering)."""

    def test_matches_tile_path(self, rng):
        import jax
        import jax.numpy as jnp

        from lz4jpeg_tpu.config import JPEGConfig
        from lz4jpeg_tpu.models.jpeg import (
            JPEGPipeline,
            _CHANNEL_SHAPES,
            forward_channel,
        )
        from lz4jpeg_tpu.ops.color import (
            chroma_subsample_422,
            rgb_to_ycbcr,
            split_mcus,
        )
        from lz4jpeg_tpu.ops.fused import fused_forward_plane_jnp

        pipe = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        y, cr, cb = rgb_to_ycbcr(jnp.asarray(img), jnp.float32)
        crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
        lum_t, r_t, b_t = split_mcus(y, crs, cbs)
        for name, tiles, plane in (
            ("lum", lum_t, y), ("r", r_t, crs), ("b", b_t, cbs)
        ):
            tw = _CHANNEL_SHAPES[name][1]
            zz_tile = jax.jit(
                lambda t, n=name: forward_channel(
                    t, n, pipe._tables, jnp.float32, True
                )
            )(tiles)
            zz_kt = jax.jit(
                lambda p, n=name, w=tw: fused_forward_plane_jnp(
                    p, pipe._tables[n], w
                )
            )(plane)
            nk = np.transpose(np.asarray(zz_kt), (0, 2, 1)).reshape(
                -1, zz_kt.shape[1]
            )
            np.testing.assert_array_equal(np.asarray(zz_tile), nk)


class TestPallasDecodeIdentity:
    """Expansion-butterfly decode: must reproduce the membership-einsum
    rle_decode_packed16 exactly (and therefore round-trip the encoder)."""

    @pytest.mark.parametrize("shape", [(256, 64), (384, 32), (128, 64)])
    def test_roundtrip_identity(self, rng, shape):
        import jax
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.pallas_rle import rle_decode_packed16_pallas
        from lz4jpeg_tpu.ops.rle import rle_decode_packed16

        n, k = shape
        vals = rng.integers(-511, 512, size=shape).astype(np.int16)
        rep = np.repeat(
            rng.integers(-511, 512, size=(n, (k + 7) // 8)), 8, axis=1
        )[:, :k]
        vals[::2] = rep[::2].astype(np.int16)
        vals[3] = 0  # constant-zero block (single run covers the block)
        packed, lengths = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
        ref = jax.jit(
            lambda p, l, k=k: rle_decode_packed16(p, l, k)
        )(packed, lengths)
        got = rle_decode_packed16_pallas(
            packed, lengths, k, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        np.testing.assert_array_equal(np.asarray(got), vals.astype(np.int32))

    @pytest.mark.parametrize("shape", [(256, 64), (512, 32)])
    def test_wide_negative_stays_identical(self, rng, shape):
        """The retired wide (lane-resident) decode kernel — a measured
        negative, see its docstring — must stay bit-identical to the
        production KT kernel so the A/B remains reproducible."""
        import jax
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.pallas_rle import (
            rle_decode_packed16_pallas,
            rle_decode_packed16_pallas_wide,
        )

        n, k = shape
        vals = rng.integers(-511, 512, size=shape).astype(np.int16)
        rep = np.repeat(
            rng.integers(-511, 512, size=(n, (k + 7) // 8)), 8, axis=1
        )[:, :k]
        vals[::2] = rep[::2].astype(np.int16)
        vals[3] = 0
        vals[4] = 7  # single-run block
        packed, lengths = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
        kt = rle_decode_packed16_pallas(packed, lengths, k, interpret=True)
        wide = rle_decode_packed16_pallas_wide(packed, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(kt), np.asarray(wide).astype(np.int32)
        )

    def test_rejects_bad_shapes(self):
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.pallas_rle import rle_decode_packed16_pallas

        with pytest.raises(ValueError):
            rle_decode_packed16_pallas(
                jnp.zeros((100, 64), jnp.uint16), None, 64, interpret=True
            )  # N not a multiple of 128
        with pytest.raises(ValueError):
            rle_decode_packed16_pallas(
                jnp.zeros((128, 64), jnp.uint16), None, 128, interpret=True
            )  # out_size != K


class TestPlaneDecodeChain:
    """KT-output decode butterfly + plane inverse einsum + plane color:
    each piece bit-equal to the row-major/tile production path."""

    def test_plane_decode_matches_rowmajor(self, rng):
        import jax
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.pallas_rle import (
            rle_decode_packed16_pallas,
            rle_decode_packed16_pallas_plane,
        )
        from lz4jpeg_tpu.ops.rle import rle_encode_packed16

        bh, bw, k = 4, 128, 64
        n = bh * bw
        vals = rng.integers(-511, 512, size=(n, k)).astype(np.int16)
        vals[::3] = np.repeat(
            rng.integers(-511, 512, size=(n, k // 8)), 8, axis=1
        )[::3].astype(np.int16)
        packed, lengths = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
        row = np.asarray(
            rle_decode_packed16_pallas(packed, lengths, k, interpret=True)
        )
        plane = np.asarray(
            rle_decode_packed16_pallas_plane(packed, bw, interpret=True)
        )
        assert plane.shape == (bh, k, bw)
        # plane[a, k, b] == row[a*bw + b, k]
        np.testing.assert_array_equal(
            plane, row.reshape(bh, bw, k).transpose(0, 2, 1)
        )

    def test_plane_inverse_matches_tile_path(self, rng):
        import jax.numpy as jnp

        from lz4jpeg_tpu.models.jpeg import scaled_tables
        from lz4jpeg_tpu.ops.color import (
            merge_mcus,
            ycbcr_planes_to_rgb,
            ycbcr_to_rgb_mcus,
        )
        from lz4jpeg_tpu.ops.fused import (
            fused_inverse_jnp,
            fused_inverse_plane_jnp,
        )

        tables = scaled_tables(None)
        bh, bw = 4, 128
        h, w = 8 * bh, 8 * bw
        n = bh * bw
        zz = {
            "lum": rng.integers(-200, 200, size=(n, 64)).astype(np.int32),
            "r": rng.integers(-200, 200, size=(n, 32)).astype(np.int32),
            "b": rng.integers(-200, 200, size=(n, 32)).astype(np.int32),
        }
        # Tile path (production fallback).
        tiles = {
            c: fused_inverse_jnp(
                jnp.asarray(zz[c]), tables[c], tw, 8
            )
            for c, tw in (("lum", 8), ("r", 4), ("b", 4))
        }
        ref = np.asarray(
            ycbcr_to_rgb_mcus(
                tiles["lum"], tiles["r"], tiles["b"], bh, bw, h, w
            )
        )
        # Plane path: KT layout in, planes out.
        planes = {
            c: fused_inverse_plane_jnp(
                jnp.asarray(
                    zz[c].reshape(bh, bw, -1).transpose(0, 2, 1)
                ),
                tables[c],
                tw,
            )
            for c, tw in (("lum", 8), ("r", 4), ("b", 4))
        }
        # Plane tiles must equal merged tile-path tiles exactly.
        np.testing.assert_array_equal(
            np.asarray(planes["lum"]), np.asarray(merge_mcus(tiles["lum"], bh, bw))
        )
        got = np.asarray(
            ycbcr_planes_to_rgb(planes["lum"], planes["r"], planes["b"], h, w)
        )
        np.testing.assert_array_equal(got, ref)

    def test_kt_encode_ragged_rows(self, rng):
        """Ragged block-row counts (prime rows — the pad-widened plane
        path's 1080p/630p shapes) must fall back to whole-array grid
        steps instead of violating Mosaic's sublane-8 tiling."""
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.pallas_rle import (
            rle_encode_packed16_pallas_kt,
        )
        from lz4jpeg_tpu.ops.rle import rle_encode_packed16

        rows, seg, cols = 5, 64, 128  # rows prime-ish: no 8-divisor
        zz_kt = rng.integers(
            -300, 300, size=(rows, seg, cols)
        ).astype(np.int16)
        packed, lengths = rle_encode_packed16_pallas_kt(
            jnp.asarray(zz_kt), interpret=True
        )
        row_major = np.transpose(zz_kt, (0, 2, 1)).reshape(-1, seg)
        ref_p, ref_l = rle_encode_packed16(jnp.asarray(row_major))
        np.testing.assert_array_equal(np.asarray(packed), np.asarray(ref_p))
        np.testing.assert_array_equal(np.asarray(lengths), np.asarray(ref_l))

    def test_basis_folded_upsample_bit_equal(self, rng):
        """Chroma inverse with the 4:2:2 upsample folded into the basis
        (duplicated Minv columns) must equal round-then-repeat exactly —
        the dot products are identical and round/clip commute with
        duplication."""
        import jax.numpy as jnp

        from lz4jpeg_tpu.models.jpeg import scaled_tables
        from lz4jpeg_tpu.ops.fused import fused_inverse_plane_jnp

        tables = scaled_tables(None)
        bh, bw = 3, 128
        zz_kt = jnp.asarray(
            rng.integers(-200, 200, size=(bh, 32, bw)).astype(np.int16)
        )
        narrow = np.asarray(
            fused_inverse_plane_jnp(zz_kt, tables["r"], 4)
        )
        wide = np.asarray(
            fused_inverse_plane_jnp(zz_kt, tables["r"], 4, upsample_cols=True)
        )
        np.testing.assert_array_equal(np.repeat(narrow, 2, axis=1), wide)
