# On-chip A/B of color_split formulations (the roofline's limiting stage:
# 32.7 GB/s achieved vs 819 GB/s HBM peak, results/roofline_jpeg_forward.json).
# Hypothesis: the stride-3 channel extraction from (H, W, 3) wastes lanes;
# candidate fixes below. Run on the real chip; keep the winner.
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.ops.color import (
    _snap_trunc,
    chroma_subsample_422,
    rgb_to_ycbcr,
    split_mcus,
)
from lz4jpeg_tpu.utils.inputs import generate_noise_image

size, batch = 2048, 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(
    np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    best = 1e9
    for _ in range(4):
        t = time.time()
        r = f(*args)
        leaves = jax.tree_util.tree_leaves(r)
        float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
        best = min(best, time.time() - t)
    mpix = batch * size * size / 1e6
    print(f"{name:28s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")
    return r


def split_one(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    return split_mcus(y, chroma_subsample_422(cr), chroma_subsample_422(cb))


# floor: just touch the bytes
timeit("floor: sum(u8)", lambda b: jnp.sum(b.astype(jnp.float32)), imgs)

# A: current (stride-3 extraction inside rgb_to_ycbcr)
ra = timeit("A current", jax.vmap(split_one), imgs)


# B: transpose-first to (3, H, W), then full-lane plane math
def split_b(rgb):
    chw = jnp.transpose(rgb, (2, 0, 1))
    r = chw[0].astype(jnp.float32)
    g = chw[1].astype(jnp.float32)
    b = chw[2].astype(jnp.float32)
    y = _snap_trunc(0.299 * r + 0.587 * g + 0.114 * b).astype(jnp.uint8)
    cr = jnp.clip(
        _snap_trunc(0.439 * r - 0.368 * g - 0.071 * b + 128), 0, 255
    ).astype(jnp.uint8)
    cb = jnp.clip(
        _snap_trunc(-0.148 * r - 0.291 * g + 0.439 * b + 128), 0, 255
    ).astype(jnp.uint8)
    return split_mcus(y, chroma_subsample_422(cr), chroma_subsample_422(cb))


rb = timeit("B transpose-first", jax.vmap(split_b), imgs)


# C: color as (HW,3)@(3,3) matmul (contiguous read), then transpose planes
M = jnp.asarray(
    [
        [0.299, 0.587, 0.114],
        [0.439, -0.368, -0.071],
        [-0.148, -0.291, 0.439],
    ],
    jnp.float32,
).T
BIAS = jnp.asarray([0.0, 128.0, 128.0], jnp.float32)


def split_c(rgb):
    h, w, _ = rgb.shape
    flat = rgb.reshape(h * w, 3).astype(jnp.float32)
    # highest: bf16-multiply default flips trunc boundaries (see
    # profiles/check_matmul_precision.py)
    ycc = jnp.matmul(flat, M, precision="highest") + BIAS
    ycc = _snap_trunc(ycc)
    ycc = ycc.reshape(h, w, 3)
    y = ycc[..., 0].astype(jnp.uint8)
    cr = jnp.clip(ycc[..., 1], 0, 255).astype(jnp.uint8)
    cb = jnp.clip(ycc[..., 2], 0, 255).astype(jnp.uint8)
    return split_mcus(y, chroma_subsample_422(cr), chroma_subsample_422(cb))


rc = timeit("C matmul color", jax.vmap(split_c), imgs)


# D: B but skipping uint8 round trips (tiles stay f32; DCT casts anyway)
def split_d(rgb):
    chw = jnp.transpose(rgb, (2, 0, 1))
    r = chw[0].astype(jnp.float32)
    g = chw[1].astype(jnp.float32)
    b = chw[2].astype(jnp.float32)
    y = _snap_trunc(0.299 * r + 0.587 * g + 0.114 * b)
    cr = jnp.clip(_snap_trunc(0.439 * r - 0.368 * g - 0.071 * b + 128), 0, 255)
    cb = jnp.clip(_snap_trunc(-0.148 * r - 0.291 * g + 0.439 * b + 128), 0, 255)
    return split_mcus(y, chroma_subsample_422(cr), chroma_subsample_422(cb))


rd = timeit("D transpose-first f32", jax.vmap(split_d), imgs)

for name, rr in (("B", rb), ("C", rc)):
    for got, want in zip(rr, ra):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    print(f"{name} == A bitwise")
for got, want in zip(rd, ra):
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.uint8), np.asarray(want)
    )
print("D == A after uint8 cast")
