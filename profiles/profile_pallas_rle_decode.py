# On-chip A/B: Pallas VMEM-membership RLE decode vs the production
# membership einsum (ops/rle.py::rle_decode_packed16), at production scale
# (the per-channel streams of 32 x 2048^2 frames), fenced.
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.ops.rle import rle_decode_packed16, rle_encode_packed16
from profiles.pallas_rle_decode import rle_decode_packed16_pallas

rng = np.random.default_rng(0)
FRAMES = 32


def make_stream(tiles, l):
    sym = rng.integers(-40, 40, (tiles, l)) * (rng.random((tiles, l)) < 0.25)
    packed, lens = rle_encode_packed16(jnp.asarray(sym, jnp.int16))
    return jax.block_until_ready(packed), jax.block_until_ready(lens)


def timeit(name, f, *args):
    jf = jax.jit(f)
    out = jf(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        out = jf(*args)
        float(jnp.sum(out.astype(jnp.float32)[..., ::13]))
        best = min(best, time.time() - t0)
    mpix = FRAMES * 2048 * 2048 / 1e6
    print(f"{name:40s} {best*1000:8.1f} ms ({mpix/best:7.1f} MPix/s-equiv)")


# luma-shaped stream of 32 frames at 2048^2: (32*65536, 64)
lum = make_stream(FRAMES * 65536, 64)

timeit("einsum rle_decode (lum)", lambda p, l: rle_decode_packed16(p, l, 64), *lum)
timeit(
    "pallas rle_decode (lum)",
    lambda p, l: rle_decode_packed16_pallas(p, l, 64),
    *lum,
)

# chroma-shaped: (32*2*32768, 32)
chroma = make_stream(FRAMES * 2 * 32768, 32)
timeit(
    "einsum rle_decode (chroma)",
    lambda p, l: rle_decode_packed16(p, l, 32),
    *chroma,
)
timeit(
    "pallas rle_decode (chroma)",
    lambda p, l: rle_decode_packed16_pallas(p, l, 32),
    *chroma,
)

# correctness at scale
want = np.asarray(rle_decode_packed16(*lum, 64))
got = np.asarray(rle_decode_packed16_pallas(*lum, 64))[: want.shape[0]]
print("lum mismatches:", int((got != want).sum()), "/", want.size)
