# Variant E for the color_split bottleneck: the 8x8 tiling relayout as a
# macro-chunk transpose + SELECTION MATMUL on the MXU.
#
# Mosaic can't lower sublane<->lane shuffles (profile_colorsplit3.py), and
# XLA's direct u8 tile transpose has minor dim 8 -> ~50 GB/s.  Split the
# relayout into two lane-friendly steps:
#   1. (bh, 8, chunks, 128) -> (bh, chunks, 8, 128): a transpose whose
#      contiguous inner block is a full 128-lane row (u8), which XLA moves
#      at near-copy speed;
#   2. one (M, 1024) @ (1024, 1024) matmul with a 0/1 selection matrix that
#      shuffles each chunk's (r, w8*tw+c) into (w8, r*tw+c) tile rows.
# Each output element receives exactly one u8 value and bf16 holds u8
# exactly, so the MXU pass is bit-exact.  ~550 GFLOP bf16 for the whole
# 32x2048^2 batch ~= 3 ms at peak vs ~15 ms for the XLA tile transpose.
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.models.jpeg import scaled_tables
from lz4jpeg_tpu.ops.color import (
    chroma_subsample_422,
    rgb_to_ycbcr,
    split_mcus,
)
from lz4jpeg_tpu.ops.fused import fused_forward_jnp
from lz4jpeg_tpu.utils.inputs import generate_noise_image

SIZE, BATCH = 2048, 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(
    np.stack([generate_noise_image(SIZE, SIZE, rng) for _ in range(BATCH)])
)
TABLES = scaled_tables(None)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        out = f(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(l.astype(jnp.float32)[..., ::13]) for l in leaves))
        best = min(best, time.time() - t0)
    mpix = BATCH * SIZE * SIZE / 1e6
    print(f"{name:40s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")
    return out


# ---------------------------------------------------------------- baseline
def baseline(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    lum, r, b = split_mcus(
        y, chroma_subsample_422(cr), chroma_subsample_422(cb)
    )
    out = []
    for name, tiles in (("lum", lum), ("r", r), ("b", b)):
        h, w = (8, 8) if name == "lum" else (8, 4)
        out.append(fused_forward_jnp(tiles, TABLES[name], w, h, jnp.float32))
    return tuple(out)


base_out = timeit("A baseline split+matmul", jax.vmap(baseline), imgs)


# ------------------------------------------- E: chunk transpose + sel matmul
def selection_matrix(tw):
    """(1024, 1024) 0/1: chunk row-major (r, w8*tw+c) -> (w8, r*tw+c)."""
    tiles_per = 128 // tw
    e = np.zeros((1024, 1024), np.float32)
    for r in range(8):
        for w8 in range(tiles_per):
            for c in range(tw):
                e[r * 128 + w8 * tw + c, w8 * 8 * tw + r * tw + c] = 1.0
    return jnp.asarray(e, jnp.bfloat16)


E_BY_TW = {8: selection_matrix(8), 4: selection_matrix(4)}


def matmul_tiles(plane, tw, out_dtype=jnp.float32):
    """(H, Wp) u8 plane -> (n_tiles, 8*tw) tiles, macro transpose + MXU."""
    h, wp = plane.shape
    bh, chunks = h // 8, wp // 128
    x = plane.reshape(bh, 8, chunks, 128).transpose(0, 2, 1, 3)
    flat = x.reshape(bh * chunks, 1024).astype(jnp.bfloat16)
    out = jnp.matmul(
        flat, E_BY_TW[tw], preferred_element_type=out_dtype
    )
    return out.reshape(bh * (wp // tw), 8 * tw)


def variant_e(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
    out = []
    for name, plane, tw in (("lum", y, 8), ("r", crs, 4), ("b", cbs, 4)):
        h, w = (8, 8) if name == "lum" else (8, 4)
        flat = matmul_tiles(plane, tw)  # f32 (N, 8*tw), u8-valued, exact
        out.append(
            fused_forward_jnp(flat.reshape(-1, h, w), TABLES[name], w, h,
                              jnp.float32)
        )
    return tuple(out)


e_out = timeit("E chunkT+sel-matmul", jax.vmap(variant_e), imgs)


# stage-only: relayout cost alone (color included, like 'split only' A/B)
def relayout_only(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    return (
        matmul_tiles(y, 8, jnp.bfloat16),
        matmul_tiles(chroma_subsample_422(cr), 4, jnp.bfloat16),
        matmul_tiles(chroma_subsample_422(cb), 4, jnp.bfloat16),
    )


timeit("E relayout-only (incl color)", jax.vmap(relayout_only), imgs)


def chunk_transpose_only(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)

    def t(plane):
        h, wp = plane.shape
        bh, chunks = h // 8, wp // 128
        return plane.reshape(bh, 8, chunks, 128).transpose(0, 2, 1, 3)

    return t(y), t(chroma_subsample_422(cr)), t(chroma_subsample_422(cb))


timeit("chunk transpose only (incl color)", jax.vmap(chunk_transpose_only), imgs)


def color_only(rgb):
    return rgb_to_ycbcr(rgb, jnp.float32)


timeit("color only", jax.vmap(color_only), imgs)


# --------------------------------------------------------------- correctness
def report(name, got, want):
    total = mism = 0
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        total += w.size
        mism += int((g.reshape(w.shape) != w).sum())
    print(f"{name}: {mism}/{total} coefficient mismatches vs baseline")


base_np = [np.asarray(t) for t in base_out]
report("E", [np.asarray(t) for t in e_out], base_np)
