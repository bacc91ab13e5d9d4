# Device-side JPEG inverse: stage timing + RLE-decode formulation A/B.
# Current rle_decode builds an (N, out, K) f32 membership tensor (~16 KB/row
# for lum) contracted on the MXU; candidate: sort+associative-scan expansion
# (~1 KB/row of sort traffic). Fenced, batch of 32 x 2048^2 equivalents.
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import CHANNELS, JPEGPipeline
from lz4jpeg_tpu.ops.rle import (
    rle_decode_packed16,
    rle_encode_packed16,
    unpack16_pairs,
)
from lz4jpeg_tpu.utils.inputs import generate_noise_image

size, frames = 2048, 32
rng = np.random.default_rng(0)
p = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

# Build device-resident packed RLE for `frames` images (via the forward).
img = generate_noise_image(size, size, rng)
slim = jax.block_until_ready(p._forward_rle(jnp.asarray(img)))
rle1 = {c: slim[c][0] for c in CHANNELS}
len1 = {c: slim[c][1] for c in CHANNELS}
rle = {c: jnp.tile(rle1[c], (frames, 1)) for c in CHANNELS}
lens = {c: jnp.tile(len1[c], frames) for c in CHANNELS}
bpc = bpr = size // 8


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        out = f(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(l.astype(jnp.float32)[..., ::17]) for l in leaves))
        best = min(best, time.time() - t0)
    mpix = frames * size * size / 1e6
    print(f"{name:32s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")
    return out


# A: current full inverse per frame-tile batch (frames folded into N axis;
# RGB reassembly omitted — we time the per-MCU chain, which is the scaling
# part).
def inv_stage(rle, lens):
    from lz4jpeg_tpu.models.jpeg import _CHANNEL_SHAPES, inverse_channel

    rec = {}
    for c in CHANNELS:
        h, w = _CHANNEL_SHAPES[c]
        zz = rle_decode_packed16(rle[c], lens[c], h * w)
        rec[c] = inverse_channel(zz, c, p._tables, jnp.float32, True)
    return rec


timeit("A inverse (membership einsum)", inv_stage, rle, lens)


# isolate: rle decode only
def rle_only(rle, lens):
    from lz4jpeg_tpu.models.jpeg import _CHANNEL_SHAPES

    return {
        c: rle_decode_packed16(
            rle[c], lens[c],
            _CHANNEL_SHAPES[c][0] * _CHANNEL_SHAPES[c][1],
        )
        for c in CHANNELS
    }


timeit("  rle decode only", rle_only, rle, lens)


# B: sort+scan expansion
def rle_decode_sortscan(packed, lengths, out_size):
    counts, vals = unpack16_pairs(packed)
    n, k = counts.shape
    pair_valid = jnp.arange(k, dtype=jnp.int32)[None, :] < (
        lengths.astype(jnp.int32) // 2
    )[:, None]
    counts = jnp.where(pair_valid, counts, 0)
    ends = jnp.cumsum(counts, axis=1, dtype=jnp.int32)
    begins = jnp.where(pair_valid, ends - counts, out_size)
    # items: runs keyed (begin*2) carrying value+flag; outputs keyed (p*2+1)
    run_key = begins * 2
    out_key = jnp.arange(out_size, dtype=jnp.int32) * 2 + 1
    FLAG = jnp.int32(1 << 20)
    run_payload = (vals + 1024) | FLAG  # value biased to >=0, flagged
    out_payload = jnp.zeros((n, out_size), jnp.int32)
    keys = jnp.concatenate(
        [run_key, jnp.broadcast_to(out_key, (n, out_size))], axis=1
    )
    payloads = jnp.concatenate([run_payload, out_payload], axis=1)
    keys_s, pay_s = jax.lax.sort((keys, payloads), dimension=1, num_keys=1)

    def combine(a, b):
        return jnp.where(b & FLAG != 0, b, a)

    filled = jax.lax.associative_scan(combine, pay_s, axis=1)
    # extract output slots in order: sort by (is_run ? BIG : position)
    pos = keys_s >> 1
    extract_key = jnp.where(keys_s & 1 == 1, pos, out_size + 1)
    _, out_vals = jax.lax.sort(
        (extract_key, filled), dimension=1, num_keys=1
    )
    return (out_vals[:, :out_size] & (FLAG - 1)) - 1024


def rle_only_b(rle, lens):
    from lz4jpeg_tpu.models.jpeg import _CHANNEL_SHAPES

    return {
        c: rle_decode_sortscan(
            rle[c], lens[c],
            _CHANNEL_SHAPES[c][0] * _CHANNEL_SHAPES[c][1],
        )
        for c in CHANNELS
    }


got_b = timeit("  rle decode sort+scan", rle_only_b, rle, lens)
got_a = jax.jit(rle_only)(rle, lens)
for c in CHANNELS:
    np.testing.assert_array_equal(np.asarray(got_a[c]), np.asarray(got_b[c]))
print("B == A bitwise")
