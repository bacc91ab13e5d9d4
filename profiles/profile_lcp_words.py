# LCP carry-width sweep for the fast LZ4 matcher: with greedy extension at
# emission recovering capped matches, does a narrower carried suffix keep
# the compression ratio while cutting the dominant sort traffic?
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.formats.fast_frame import assemble_frame
from lz4jpeg_tpu.native import native_backend
from lz4jpeg_tpu.ops.lz4_fast import (
    TPU_BLOCK_LOG,
    compact_parse,
    fast_match_blocks,
    pad_blocks_fast,
)

corpus = open(
    "/root/reference/Output-Input/input/Metamorphosis.txt", "rb"
).read()
native = native_backend()


def encode_with(data, lcp_words, fn_cache={}):
    if lcp_words not in fn_cache:
        fn_cache[lcp_words] = jax.jit(
            lambda b, l: compact_parse(
                *fast_match_blocks(b, l, lcp_words=lcp_words)
            )
        )
    fn = fn_cache[lcp_words]
    padded, lengths = pad_blocks_fast(data, TPU_BLOCK_LOG)
    num_blocks, p = padded.shape
    pos_bits = (p - 1).bit_length()
    data_u8 = padded.astype(np.uint8)
    pos_sorted, packed, counts = fn(
        jnp.asarray(data_u8), jnp.asarray(lengths)
    )
    max_count = int(jnp.max(counts))
    k = 1 << max(1, (max_count - 1).bit_length())
    k = min(k, p)
    pos_h, packed_h, counts_h = jax.device_get(
        (pos_sorted[:, :k], packed[:, :k], counts)
    )
    is_match = np.zeros((num_blocks, p), np.uint8)
    emit_len = np.zeros((num_blocks, p), np.int32)
    emit_dist = np.zeros((num_blocks, p), np.int32)
    slot = np.arange(k)[None, :] < counts_h[:, None]
    rows = np.broadcast_to(np.arange(num_blocks)[:, None], (num_blocks, k))
    r, c = rows[slot], pos_h[slot]
    is_match[r, c] = 1
    emit_len[r, c] = packed_h[slot] >> pos_bits
    emit_dist[r, c] = packed_h[slot] & (p - 1)
    raws = [
        data_u8[bi, : int(lengths[bi])].tobytes() for bi in range(num_blocks)
    ]
    payloads = native.emit_blocks(
        data_u8, lengths, is_match, emit_len, emit_dist
    )
    return assemble_frame(payloads, raws, len(data), TPU_BLOCK_LOG)


# ratio on the full corpus
host = native.encode_fast(corpus)
print(f"host C++ encoder: {len(host)} B  ({len(host)/len(corpus):.4f})")
for w in (2, 4, 8):
    frame = encode_with(corpus, w)
    raw = native.decode_fast(frame, len(corpus))
    assert raw == corpus, f"roundtrip failed at lcp_words={w}"
    print(
        f"lcp_words={w}: {len(frame)} B  ({len(frame)/len(corpus):.4f})"
    )

# fenced device match throughput at scale
nblocks, p = 1024, 1 << TPU_BLOCK_LOG
reps = -(-nblocks * p // len(corpus))
data = (corpus * reps)[: nblocks * p]
blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(nblocks, p))
lengths = jnp.full((nblocks,), p, jnp.int32)
for w in (2, 4, 8):
    f = jax.jit(
        lambda b, l, w=w: sum(
            jnp.sum(o.astype(jnp.float32))
            for o in fast_match_blocks(b, l, lcp_words=w)
        )
    )
    float(f(blocks, lengths))
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        float(f(blocks, lengths))
        best = min(best, time.time() - t0)
    mb = nblocks * p / 1e6
    print(
        f"lcp_words={w}: match {best*1e3:7.1f} ms  ({mb/best:6.1f} MB/s fenced)"
    )
