import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import JPEGPipeline, forward_channel, CHANNELS
from lz4jpeg_tpu.utils.inputs import generate_noise_image

size, batch = 2048, 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(np.stack([generate_noise_image(size, size, rng) for _ in range(batch)]))
p = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

def timeit(name, fn):
    f = jax.jit(fn)
    r = f(imgs); jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    best = 1e9
    for _ in range(3):
        t = time.time()
        r = f(imgs)
        # fence via scalar readback of first leaf sum
        leaves = jax.tree_util.tree_leaves(r)
        float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
        dt = time.time() - t
        best = min(best, dt)
    mpix = batch * size * size / 1e6
    print(f"{name:24s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")

# split only (color + subsample + MCU split)
timeit("split", lambda b: jax.vmap(p._split_impl)(b))

# split + DCT/quant/zigzag (no RLE)
def to_zz(b):
    def one(rgb):
        lum, r, bb = p._split_impl(rgb)
        from lz4jpeg_tpu.models.jpeg import forward_channel
        return {n: forward_channel(t, n, p._tables, p.config.dtype, True)
                for n, t in (("lum", lum), ("r", r), ("b", bb))}
    return jax.vmap(one)(b)
timeit("split+dct+quant+zz", to_zz)

# full forward (incl. RLE)
timeit("full forward", lambda b: jax.vmap(p._forward_impl)(b))
