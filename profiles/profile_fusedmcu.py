# On-chip A/B: the fused DCT+quant+zigzag matmul as three per-channel
# matmuls (N,64)@(64,64) + 2x(N,32)@(32,32) — each underfilling the 128x128
# MXU tile — vs ONE block-diagonal (N,128)@(128,128) over the concatenated
# per-MCU row [lum(64) | r(32) | b(32)]. Same math, denser MXU shapes.
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import JPEGPipeline, forward_channel
from lz4jpeg_tpu.ops.fused import _table_key, forward_basis
from lz4jpeg_tpu.utils.inputs import generate_noise_image

size, batch = 2048, 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(
    np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
)
p = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
tables = p._tables

# Precompute tiles once (isolate the matmul stage).
tiles = jax.jit(jax.vmap(p._split_impl))(imgs)
tiles = jax.tree_util.tree_map(lambda a: a.block_until_ready(), tiles)
lum, r, b = tiles
n = lum.shape[1]


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    best = 1e9
    for _ in range(4):
        t = time.time()
        out = f(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
        best = min(best, time.time() - t)
    mpix = batch * size * size / 1e6
    print(f"{name:28s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")
    return out


# A: current three matmuls
def three(lum, r, b):
    return {
        name: forward_channel(t, name, tables, jnp.float32, True)
        for name, t in (("lum", lum), ("r", r), ("b", b))
    }


ra = timeit("A three matmuls", jax.vmap(three), lum, r, b)

# B: one block-diagonal 128x128 matmul
m_l, off_l = forward_basis(8, 8, _table_key(tables["lum"]))
m_r, off_r = forward_basis(4, 8, _table_key(tables["r"]))
m_b, off_b = forward_basis(4, 8, _table_key(tables["b"]))
MB = np.zeros((128, 128), np.float64)
MB[:64, :64] = m_l
MB[64:96, 64:96] = m_r
MB[96:, 96:] = m_b
OFF = np.concatenate([off_l, off_r, off_b])
MBj = jnp.asarray(MB.T, jnp.float32)
OFFj = jnp.asarray(OFF, jnp.float32)
SNAP = 1e-5


def blockdiag(lum, r, b):
    nt = lum.shape[0]
    x = jnp.concatenate(
        [
            lum.reshape(nt, 64).astype(jnp.float32),
            r.reshape(nt, 32).astype(jnp.float32),
            b.reshape(nt, 32).astype(jnp.float32),
        ],
        axis=1,
    )
    ratio = jnp.matmul(x, MBj, precision="highest") - OFFj
    nearest = jnp.round(ratio)
    ratio = jnp.where(jnp.abs(ratio - nearest) <= SNAP, nearest, ratio)
    zz = jnp.trunc(ratio)
    return {"lum": zz[:, :64], "r": zz[:, 64:96], "b": zz[:, 96:]}


rb_ = timeit("B blockdiag 128", jax.vmap(blockdiag), lum, r, b)

for c in ("lum", "r", "b"):
    np.testing.assert_array_equal(np.asarray(ra[c]), np.asarray(rb_[c]))
print("B == A bitwise")
