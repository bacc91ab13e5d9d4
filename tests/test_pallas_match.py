"""Fused Pallas LZ4 matcher (ops/pallas_match.py), interpret mode.

Covers: stride=1 bit-parity with the XLA sort matcher, stride=2 match
validity (every emitted match's verified prefix really matches), parse
non-overlap, and an end-to-end frame round trip through the production
emitters on the real Metamorphosis corpus.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lz4jpeg_tpu.ops.lz4_fast import fast_match_blocks, pad_blocks_fast
from lz4jpeg_tpu.ops.pallas_match import fast_match_blocks_pallas

CORPUS = "/root/reference/Output-Input/input/Metamorphosis.txt"


@pytest.fixture(scope="module")
def corpus():
    with open(CORPUS, "rb") as f:
        return f.read()


def _fields(data, **kw):
    padded, lengths = pad_blocks_fast(data)
    out = fast_match_blocks_pallas(
        jnp.asarray(padded), jnp.asarray(lengths), interpret=True, **kw
    )
    return [np.asarray(o) for o in out], padded, lengths


class TestStride1Parity:
    def test_identical_to_xla_matcher(self, corpus):
        data = corpus[: 4 * 16384]
        padded, lengths = pad_blocks_fast(data)
        ref = fast_match_blocks(
            jnp.asarray(padded), jnp.asarray(lengths), lcp_words=2, seg=512
        )
        got = fast_match_blocks_pallas(
            jnp.asarray(padded), jnp.asarray(lengths),
            stride=1, lcp_words=2, seg=512, interpret=True,
        )
        for name, r, g in zip(("is_match", "len", "dist"), ref, got):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(g), err_msg=name
            )


class TestStride2Validity:
    @pytest.fixture(scope="class")
    def parsed(self, corpus):
        return _fields(corpus, stride=2, lcp_words=2, seg=512)

    def test_matches_verified_and_on_anchors(self, parsed):
        (is_match, emit_len, emit_dist), padded, lengths = parsed
        total = 0
        for b in range(padded.shape[0]):
            n = int(lengths[b])
            row = padded[b]
            for i in np.nonzero(is_match[b])[0]:
                ln, d = int(emit_len[b, i]), int(emit_dist[b, i])
                total += 1
                assert i % 2 == 0, "match off the anchor grid"
                assert d >= 1 and i - d >= 0 and i + ln <= n
                assert 4 <= ln <= 8  # lcp_words=2 cap
                np.testing.assert_array_equal(
                    row[i : i + ln], row[i - d : i - d + ln],
                    err_msg=f"unverified match at block {b} pos {i}",
                )
        assert total > 1000  # real text must produce plenty of matches

    def test_no_overlap_within_segment(self, parsed):
        (is_match, emit_len, _), padded, _ = parsed
        for b in range(padded.shape[0]):
            end = -1
            for i in np.nonzero(is_match[b])[0]:
                assert i > end, f"overlapping parse at block {b} pos {i}"
                end = i + int(emit_len[b, i]) - 1

    def test_roundtrip_through_emitters(self, corpus):
        from lz4jpeg_tpu.formats.fast_frame import (
            assemble_frame,
            decode_fast,
            emit_block_from_parse,
        )
        from lz4jpeg_tpu.ops.lz4_fast import TPU_BLOCK_LOG

        (is_match, emit_len, emit_dist), padded, lengths = _fields(
            corpus, stride=2, lcp_words=2, seg=512
        )
        raws, payloads = [], []
        for b in range(padded.shape[0]):
            n = int(lengths[b])
            raw = padded[b, :n].astype(np.uint8).tobytes()
            raws.append(raw)
            payloads.append(
                emit_block_from_parse(
                    raw, is_match[b, :n], emit_len[b, :n], emit_dist[b, :n]
                )
            )
        frame = assemble_frame(payloads, raws, len(corpus), TPU_BLOCK_LOG)
        assert decode_fast(frame) == corpus
        ratio = len(frame) / len(corpus)
        assert ratio < 0.75, f"stride-2 ratio regressed badly: {ratio}"


class TestShapes:
    def test_small_block_log(self, corpus):
        # The dryrun's 1 KiB blocks: pa=512 → 4 sublane rows.
        data = corpus[: 8 * 1024]
        padded, lengths = pad_blocks_fast(data, block_log=10)
        is_match, emit_len, emit_dist = fast_match_blocks_pallas(
            jnp.asarray(padded), jnp.asarray(lengths),
            stride=2, lcp_words=2, interpret=True,
        )
        assert int(np.asarray(is_match).sum()) > 0

    def test_bad_anchor_count_raises(self):
        with pytest.raises(ValueError):
            fast_match_blocks_pallas(
                jnp.zeros((1, 100), jnp.int32), jnp.asarray([100]),
                stride=2, interpret=True,
            )


class TestConfigKnobs:
    def test_matcher_validation(self):
        from lz4jpeg_tpu.config import LZ4Config

        with pytest.raises(ValueError):
            LZ4Config(matcher="bogus")
        with pytest.raises(ValueError):
            LZ4Config(match_stride=3)
        cfg = LZ4Config(matcher="fused", match_stride=4)
        assert cfg.matcher == "fused" and cfg.match_stride == 4

    def test_cpu_backend_falls_back_to_sort(self, corpus):
        """matcher='fused' on a non-TPU backend silently uses the portable
        sort matcher — encode must still round-trip."""
        from lz4jpeg_tpu import LZ4Codec
        from lz4jpeg_tpu.config import LZ4Config
        from lz4jpeg_tpu.formats.fast_frame import decode_fast

        data = corpus[:40000]
        c = LZ4Codec(LZ4Config(mode="fast", matcher="fused"))
        frame = c.encode(data, engine="tpu")
        assert decode_fast(frame) == data
