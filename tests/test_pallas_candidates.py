"""Bit-identity of the Pallas kernel candidates vs the shipped XLA ops.

The candidates in ``profiles/`` lost their on-chip A/B against the XLA
formulations (``results/pallas_ab.json``) and are not part of the package,
but the A/B is only meaningful if they stay *correct* — these tests run
them in interpret mode on CPU against the production jnp/XLA ops.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from lz4jpeg_tpu.ops.fused import fused_forward_jnp, fused_inverse_jnp
from lz4jpeg_tpu.ops.quantize import (
    CHROMINANCE_QUANTIZATION_TABLE,
    LUMINANCE_QUANTIZATION_TABLE,
)
from lz4jpeg_tpu.ops.rle import rle_encode_batched

_PROFILES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "profiles")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_PROFILES, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


pallas_mcu = _load("pallas_mcu")
pallas_rle = _load("pallas_rle")


def _table(w):
    return (
        LUMINANCE_QUANTIZATION_TABLE
        if w == 8
        else CHROMINANCE_QUANTIZATION_TABLE
    )


class TestMCUCandidate:
    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_forward_matches_jnp(self, rng, w, h):
        tiles = rng.integers(0, 256, size=(700, h, w), dtype=np.uint8)
        ours = np.asarray(
            pallas_mcu.fused_forward_pallas(
                jnp.asarray(tiles), _table(w), w, h, interpret=True
            )
        )
        ref = np.asarray(
            fused_forward_jnp(jnp.asarray(tiles), _table(w), w, h, jnp.float32)
        )
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("w,h", [(8, 8), (4, 8)])
    def test_inverse_matches_jnp(self, rng, w, h):
        tiles = rng.integers(0, 256, size=(700, h, w), dtype=np.uint8)
        zz = fused_forward_jnp(jnp.asarray(tiles), _table(w), w, h, jnp.float32)
        ours = np.asarray(
            pallas_mcu.fused_inverse_pallas(zz, _table(w), w, h, interpret=True)
        )
        ref = np.asarray(fused_inverse_jnp(zz, _table(w), w, h, jnp.float32))
        np.testing.assert_array_equal(ours, ref)

    def test_ragged_grid_tail(self, rng):
        # N not a multiple of BLOCK_N exercises the padded last grid step.
        tiles = rng.integers(0, 256, size=(5, 8, 8), dtype=np.uint8)
        ours = np.asarray(
            pallas_mcu.fused_forward_pallas(
                jnp.asarray(tiles), _table(8), 8, 8, interpret=True
            )
        )
        ref = np.asarray(
            fused_forward_jnp(jnp.asarray(tiles), _table(8), 8, 8, jnp.float32)
        )
        np.testing.assert_array_equal(ours, ref)


class TestRLECandidate:
    @pytest.mark.parametrize("length", [32, 64])
    def test_matches_sort_formulation(self, rng, length):
        # Run-heavy rows (few distinct values) plus the all-equal and
        # all-distinct extremes.
        x = rng.integers(-3, 4, size=(300, length)).astype(np.int16)
        x[0] = 0
        x[1] = np.arange(length) - length // 2
        ours_p, ours_l = pallas_rle.rle_encode_pallas(
            jnp.asarray(x), interpret=True
        )
        ref_p, ref_l = rle_encode_batched(jnp.asarray(x))
        np.testing.assert_array_equal(
            np.asarray(ours_p, np.int32), np.asarray(ref_p, np.int32)
        )
        np.testing.assert_array_equal(np.asarray(ours_l), np.asarray(ref_l))

    def test_row_padding_tail(self, rng):
        # N not a multiple of segs-per-row exercises the pad path.
        x = rng.integers(-2, 3, size=(5, 32)).astype(np.int16)
        ours_p, ours_l = pallas_rle.rle_encode_pallas(
            jnp.asarray(x), interpret=True
        )
        ref_p, ref_l = rle_encode_batched(jnp.asarray(x))
        np.testing.assert_array_equal(
            np.asarray(ours_p, np.int32), np.asarray(ref_p, np.int32)
        )
        np.testing.assert_array_equal(np.asarray(ours_l), np.asarray(ref_l))
