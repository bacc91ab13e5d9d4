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
