"""Device-parallel LZ4T decode: copy program, pointer doubling, sharding.

Capability match for the reference's block-parallel decode
(``Algorithms/parallel/LZ4/LZ4.c:1105-1222``), built on the LZ4T format's
up-front size table (prefix-sum framing) instead of the reference's serial
block-header walk.
"""

import numpy as np
import pytest

from lz4jpeg_tpu.config import LZ4Config
from lz4jpeg_tpu.formats.fast_frame import FastFormatError, decode_fast, encode_fast
from lz4jpeg_tpu.models.lz4 import LZ4Codec
from lz4jpeg_tpu.ops.lz4t_decode import (
    build_copy_program_fast,
    decode_fast_device,
)


def mixed_payload(rng) -> bytes:
    """Compressible text + incompressible noise (raw-stored) + ragged tail."""
    text = (b"the quick brown fox jumps over the lazy dog. " * 3000)[:130000]
    noise = rng.integers(0, 256, 70000, dtype=np.uint8).tobytes()
    return text + noise + text[:12345]


class TestCopyProgram:
    def test_literals_and_matches_cover_output(self, rng):
        frame = encode_fast(mixed_payload(rng))
        lit, src, raw_sizes, p, max_depth = build_copy_program_fast(frame)
        assert max_depth >= 1
        assert lit.shape == src.shape == (len(raw_sizes), p)
        # Valid region: every position is a literal (src -1) or an
        # in-block backward reference.
        for b, n in enumerate(raw_sizes):
            s = src[b, : int(n)]
            idx = np.arange(int(n))
            assert ((s == -1) | ((s >= 0) & (s < idx))).all()

    def test_python_fallback_matches_native(self, rng, monkeypatch):
        frame = encode_fast(mixed_payload(rng))
        lit_n, src_n, sz_n, _, d_n = build_copy_program_fast(frame)
        import lz4jpeg_tpu.ops.lz4t_decode as mod

        monkeypatch.setattr(
            "lz4jpeg_tpu.native.native_available", lambda *a, **k: False
        )
        lit_p, src_p, sz_p, _, d_p = mod.build_copy_program_fast(frame)
        np.testing.assert_array_equal(lit_n, lit_p)
        np.testing.assert_array_equal(src_n, src_p)
        np.testing.assert_array_equal(sz_n, sz_p)
        assert d_n == d_p

    def test_malformed_frame_raises(self):
        with pytest.raises(FastFormatError):
            build_copy_program_fast(b"LZ4Tgarbage")


class TestDeviceDecode:
    def test_roundtrip_mixed(self, rng):
        data = mixed_payload(rng)
        assert decode_fast_device(encode_fast(data)) == data

    def test_overlapping_match_chains(self):
        # offset-1 / offset-2 / offset-3 runs: the deepest doubling chains.
        data = b"A" * 70000 + b"BC" * 40000 + b"xyz" * 11111
        assert decode_fast_device(encode_fast(data)) == data

    def test_single_short_block(self):
        data = b"hello hello hello hello hello!"
        assert decode_fast_device(encode_fast(data)) == data

    def test_empty(self):
        assert decode_fast_device(encode_fast(b"")) == b""

    def test_matches_host_decoder(self, metamorphosis):
        frame = encode_fast(metamorphosis)
        assert decode_fast_device(frame) == decode_fast(frame)

    def test_codec_engine_dispatch(self, metamorphosis, golden_input):
        fast = LZ4Codec(LZ4Config(mode="fast"))
        frame = fast.encode(metamorphosis)
        assert fast.decode(frame, engine="tpu") == metamorphosis
        parity = LZ4Codec(LZ4Config(mode="parity"))
        pframe = parity.encode(golden_input)
        assert parity.decode(pframe, engine="tpu") == golden_input


class TestShardedDecode:
    def test_sharded_equals_host(self, rng):
        from lz4jpeg_tpu.config import MeshConfig
        from lz4jpeg_tpu.parallel.lz4 import sharded_fast_decode
        from lz4jpeg_tpu.parallel.mesh import codec_mesh

        mesh = codec_mesh(MeshConfig(num_devices=8))
        # 11 one-KiB blocks (ragged vs the 8-device mesh → padding rows).
        data = mixed_payload(rng)[: 11 * 1024 + 17]
        frame = encode_fast(data, block_log=10)
        assert sharded_fast_decode(frame, mesh) == data

    def test_sharded_full_size_blocks(self, metamorphosis):
        from lz4jpeg_tpu.config import MeshConfig
        from lz4jpeg_tpu.parallel.lz4 import sharded_fast_decode
        from lz4jpeg_tpu.parallel.mesh import codec_mesh

        mesh = codec_mesh(MeshConfig(num_devices=4))
        frame = encode_fast(metamorphosis)  # 64 KiB blocks
        assert sharded_fast_decode(frame, mesh) == metamorphosis


class TestMXUResolve:
    def test_matches_pointer_doubling(self, rng):
        """The round-5 one-hot MXU resolve (interpret mode) is bit-exact
        against take_along_axis on fully-rooted programs."""
        import jax.numpy as jnp

        from lz4jpeg_tpu.ops.lz4t_decode import resolve_blocks_mxu

        frame = encode_fast(mixed_payload(rng))
        lit, src, raw_sizes, p, _ = build_copy_program_fast(
            frame, depth_cap=1
        )
        idx = np.arange(p, dtype=np.int32)[None, :]
        root = np.where(src < 0, idx, src).astype(np.int32)
        ref = np.take_along_axis(lit, root, axis=1)
        got = np.asarray(
            resolve_blocks_mxu(
                jnp.asarray(lit), jnp.asarray(root), interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)
