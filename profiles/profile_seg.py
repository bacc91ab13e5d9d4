# Parse-segment-size sweep for the fast LZ4 matcher: the greedy parse is a
# lax.scan of `seg` lockstep steps over B*P/seg independent segments, and
# matches are truncated at segment boundaries (greedy extension at emission
# recovers the truncated length, so seg mainly trades scan depth against
# parse choices).  Sweeps seg with lcp_words fixed at the production 4.
import sys
import time

sys.path.insert(0, "/root/repo")
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


def encode_with(data, seg, fn_cache={}):
    if seg not in fn_cache:
        fn_cache[seg] = jax.jit(
            lambda b, l: compact_parse(*fast_match_blocks(b, l, seg=seg))
        )
    fn = fn_cache[seg]
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


SEGS = (128, 256, 512)

host = native.encode_fast(corpus)
print(f"host C++ encoder: {len(host)} B  ({len(host)/len(corpus):.4f})")
for s in SEGS:
    frame = encode_with(corpus, s)
    raw = native.decode_fast(frame, len(corpus))
    assert raw == corpus, f"roundtrip failed at seg={s}"
    print(f"seg={s:5d}: {len(frame)} B  ({len(frame)/len(corpus):.4f})")

# fenced device match throughput at scale
nblocks, p = 1024, 1 << TPU_BLOCK_LOG
reps = -(-nblocks * p // len(corpus))
data = (corpus * reps)[: nblocks * p]
blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(nblocks, p))
lengths = jnp.full((nblocks,), p, jnp.int32)
for s in SEGS:
    f = jax.jit(
        lambda b, l, s=s: sum(
            jnp.sum(o.astype(jnp.float32))
            for o in fast_match_blocks(b, l, seg=s)
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
        f"seg={s:5d}: match {best*1e3:7.1f} ms  ({mb/best:6.1f} MB/s fenced)"
    )
