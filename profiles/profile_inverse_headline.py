# Refresh the README's batched device-decode number on current production
# code: device-resident packed16 RLE pairs -> full inverse chain (RLE
# expansion, fused IDCT, YCbCr->RGB reassembly) with bench.py's chained
# pipelined dispatch and checksum fencing.
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import CHANNELS, JPEGPipeline
from lz4jpeg_tpu.utils.inputs import generate_noise_image

SIZE, BATCH, CHAIN = 2048, 32, 4
rng = np.random.default_rng(0)
p = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

img = generate_noise_image(SIZE, SIZE, rng)
slim = jax.block_until_ready(p._forward_rle(jnp.asarray(img)))
rle = {c: jnp.tile(slim[c][0], (BATCH, 1, 1)) for c in CHANNELS}
lens = {c: jnp.tile(slim[c][1], (BATCH, 1)) for c in CHANNELS}
bpc = bpr = SIZE // 8


def inverse_fenced(rle, lens, carry):
    rgb = jax.vmap(
        lambda r, l: p._inverse_impl(
            r, l, bpc=bpc, bpr=bpr, height=SIZE, width=SIZE,
            layout="packed16"
        )
    )(rle, lens)
    return carry + jnp.sum(rgb[..., ::13, 0].astype(jnp.float32))


f = jax.jit(inverse_fenced)


def step():
    s = jnp.float32(0)
    for _ in range(CHAIN):
        s = f(rle, lens, s)
    float(s)


step()  # warmup/compile
times = []
for _ in range(10):
    t0 = time.time()
    step()
    times.append(time.time() - t0)
times.sort()
trimmed = times[1:-1]
mean = sum(trimmed) / len(trimmed)
mpix = CHAIN * BATCH * SIZE * SIZE / 1e6
print(
    f"device inverse (packed16 RLE -> RGB), {BATCH}x{SIZE}^2, chain {CHAIN}: "
    f"{mean*1000:.1f} ms -> {mpix/mean:.0f} MPix/s "
    f"(median {mpix/sorted(times)[len(times)//2]:.0f})"
)
