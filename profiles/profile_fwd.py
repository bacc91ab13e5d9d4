import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import JPEGPipeline, forward_channel
from lz4jpeg_tpu.utils.inputs import generate_noise_image

size, batch = 2048, 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(np.stack([generate_noise_image(size, size, rng) for _ in range(batch)]))
p = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

def fenced(fn):
    def g(a, carry):
        out = fn(a)
        return carry + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
    return jax.jit(g)

def timeit(name, fn, a, chain=4):
    f = fenced(fn)
    float(f(a, jnp.float32(0)))
    best = 1e9
    for _ in range(4):
        t = time.time()
        s = jnp.float32(0)
        for _ in range(chain):
            s = f(a, s)
        float(s)
        best = min(best, (time.time() - t) / chain)
    mpix = batch * size * size / 1e6
    print(f"{name:26s} {best*1000:8.1f} ms/dispatch  {mpix/best:8.0f} MPix/s")

timeit("identity", lambda b: (jnp.sum(b, axis=(1,2,3)),), imgs)
timeit("split", lambda b: jax.vmap(p._split_impl)(b), imgs)
def to_zz(b):
    def one(rgb):
        lum, r, bb = p._split_impl(rgb)
        return {n: forward_channel(t, n, p._tables, p.config.dtype, True)
                for n, t in (("lum", lum), ("r", r), ("b", bb))}
    return jax.vmap(one)(b)
timeit("split+dct+quant+zz", to_zz, imgs)
timeit("full forward (bench)", lambda b: jax.vmap(p._forward_impl)(b), imgs)
timeit("forward_rle slim i16", lambda b: jax.vmap(p._forward_rle_impl)(b), imgs)
