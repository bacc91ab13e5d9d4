# Variant F for the color_split bottleneck: the whole fused MCU transform
# (tiling + DCT + quant + zigzag) as ONE stride-8 convolution.
#
#   out[a, b, k] = sum_{r,c} T[k, r*8+c] * plane[8a+r, 8b+c]
#
# is exactly lax.conv with an (8, tw) kernel, stride (8, tw), 64 output
# channels, NHWC -> the output minor dim is k: the (N, 64) zigzag layout
# falls out for free and the explicit tile relayout disappears -- XLA's TPU
# conv emitter does the window staging internally.  Also A/Bs an int16
# output epilogue (quantized coeffs fit i16; halves the coefficient write).
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
from lz4jpeg_tpu.ops.fused import _table_key, forward_basis, fused_forward_jnp
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
    print(f"{name:44s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")
    return out


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


# -------------------------------------------------- F: fused MCU as a conv
def snap_trunc(ratio, eps=1e-5):
    nearest = jnp.round(ratio)
    return jnp.trunc(
        jnp.where(jnp.abs(ratio - nearest) <= eps, nearest, ratio)
    )


def conv_forward(plane, table, tw, out_i16=False):
    """(H, Wp) u8 -> (N, 8*tw) quantized zigzag coeffs via stride conv."""
    h, wp = plane.shape
    m, off = forward_basis(tw, 8, _table_key(table))
    kern = jnp.asarray(
        m.reshape(8 * tw, 8, tw).transpose(1, 2, 0)[:, :, None, :],
        jnp.float32,
    )  # HWIO (8, tw, 1, 64)
    x = plane[None, :, :, None].astype(jnp.float32)  # NHWC
    ratio = jax.lax.conv_general_dilated(
        x, kern, window_strides=(8, tw), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )[0] - jnp.asarray(off, jnp.float32)
    out = snap_trunc(ratio).reshape(-1, 8 * tw)
    return out.astype(jnp.int16) if out_i16 else out


def variant_f(rgb, out_i16=False):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
    return (
        conv_forward(y, TABLES["lum"], 8, out_i16),
        conv_forward(crs, TABLES["r"], 4, out_i16),
        conv_forward(cbs, TABLES["b"], 4, out_i16),
    )


f_out = timeit("F conv fused transform (f32 out)",
               jax.vmap(lambda im: variant_f(im, False)), imgs)
timeit("F2 conv fused transform (i16 out)",
       jax.vmap(lambda im: variant_f(im, True)), imgs)


# -------------------------------- baseline with i16 epilogue (for reference)
def baseline_i16(rgb):
    return tuple(t.astype(jnp.int16) for t in baseline(rgb))


timeit("A2 baseline, i16 out", jax.vmap(baseline_i16), imgs)


# --------------------------------------------------------------- correctness
def report(name, got, want):
    total = mism = 0
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        total += w.size
        mism += int((g.reshape(w.shape).astype(np.float32) != w).sum())
    print(f"{name}: {mism}/{total} coefficient mismatches vs baseline")


base_np = [np.asarray(t) for t in base_out]
report("F", [np.asarray(t) for t in f_out], base_np)
