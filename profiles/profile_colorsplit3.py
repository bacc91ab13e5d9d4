# Round-2 follow-up on the color_split bottleneck (4% SOL in
# results/roofline_jpeg_forward.json): can the 8x8 tiling relayout be
# (a) absorbed into the fused MCU matmul as a two-contracting-dim einsum
#     straight off the free (bh, 8, bw, tw) plane view, or
# (b) done by a hand-written Pallas relayout kernel (u8 in, u8 tiles out)?
#
# Measures the color->split->fused-matmul prefix of the forward chain
# (everything the candidates change), with the usual checksum fencing.
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    print(f"{name:36s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")
    return out


def snap_trunc(ratio, eps=1e-5):
    nearest = jnp.round(ratio)
    return jnp.trunc(
        jnp.where(jnp.abs(ratio - nearest) <= eps, nearest, ratio)
    )


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


# ------------------------------------------------- B: einsum from plane view
def einsum_forward(plane, table, tw, out_order):
    """plane (H, Wp) uint8 -> (bh*bw, 8*tw) zigzag coeffs, no relayout."""
    h, wp = plane.shape
    bh, bw = h // 8, wp // tw
    m, off = forward_basis(tw, 8, _table_key(table))
    x = plane.reshape(bh, 8, bw, tw).astype(jnp.float32)
    mt = jnp.asarray(m.reshape(8 * tw, 8, tw), jnp.float32)
    if out_order == "abk":
        ratio = jnp.einsum(
            "krc,arbc->abk", mt, x, precision="highest"
        ) - jnp.asarray(off, jnp.float32)
        return snap_trunc(ratio).reshape(bh * bw, 8 * tw)
    ratio = jnp.einsum(
        "krc,arbc->akb", mt, x, precision="highest"
    ) - jnp.asarray(off, jnp.float32)[:, None]
    return snap_trunc(ratio)  # (bh, 64, bw): transpose deferred to caller


def variant_b(rgb, out_order):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
    return (
        einsum_forward(y, TABLES["lum"], 8, out_order),
        einsum_forward(crs, TABLES["r"], 4, out_order),
        einsum_forward(cbs, TABLES["b"], 4, out_order),
    )


b_out = timeit(
    "B einsum-from-plane (abk)",
    jax.vmap(lambda im: variant_b(im, "abk")), imgs,
)
timeit(
    "B2 einsum-from-plane (akb, no fin. T)",
    jax.vmap(lambda im: variant_b(im, "akb")), imgs,
)


# ------------------------------------------------- C: Pallas relayout kernel
def _relayout_kernel(tw):
    tiles_per = 128 // tw

    def kernel(in_ref, out_ref):
        x = in_ref[:]  # (64, 128) u8: 8 tile-rows x tiles_per tiles
        out_ref[:] = (
            x.reshape(8, 8, tiles_per, tw)
            .transpose(0, 2, 1, 3)
            .reshape(8, tiles_per * 8 * tw)
        )

    return kernel


def pallas_tile(plane, tw):
    """(H, Wp) u8 -> (bh*bw, 8*tw) u8 tiles via Pallas relayout."""
    h, wp = plane.shape
    bh, bw = h // 8, wp // tw
    grid = (h // 64, wp // 128)
    out = pl.pallas_call(
        _relayout_kernel(tw),
        out_shape=jax.ShapeDtypeStruct((bh, bw * 8 * tw), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (64, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (8, 1024), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )(plane)
    return out.reshape(bh * bw, 8 * tw)


def variant_c(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
    out = []
    for name, plane, tw in (("lum", y, 8), ("r", crs, 4), ("b", cbs, 4)):
        tiles = pallas_tile(plane, tw)
        m, off = forward_basis(tw, 8, _table_key(TABLES[name]))
        ratio = jnp.matmul(
            tiles.astype(jnp.float32),
            jnp.asarray(m.T, jnp.float32),
            precision="highest",
        ) - jnp.asarray(off, jnp.float32)
        out.append(snap_trunc(ratio))
    return tuple(out)


try:
    c_out = timeit("C pallas relayout + matmul", jax.vmap(variant_c), imgs)
except Exception as e:  # noqa: BLE001
    c_out = None
    print(f"C pallas relayout FAILED: {type(e).__name__}: {str(e)[:200]}")


# ----------------------------------------------------------- stage-only A/Bs
def split_only_base(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    return split_mcus(y, chroma_subsample_422(cr), chroma_subsample_422(cb))


timeit("split only: baseline", jax.vmap(split_only_base), imgs)


def split_only_pallas(rgb):
    y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
    return (
        pallas_tile(y, 8),
        pallas_tile(chroma_subsample_422(cr), 4),
        pallas_tile(chroma_subsample_422(cb), 4),
    )


try:
    timeit("split only: pallas", jax.vmap(split_only_pallas), imgs)
except Exception as e:  # noqa: BLE001
    print(f"split only pallas FAILED: {type(e).__name__}: {str(e)[:200]}")


# --------------------------------------------------------------- correctness
def report_mismatch(name, got, want):
    total = mism = 0
    for g, w in zip(got, want):
        g = np.asarray(g).reshape(w.shape)
        total += w.size
        mism += int((np.asarray(g) != np.asarray(w)).sum())
    print(f"{name}: {mism}/{total} coefficient mismatches vs baseline")


base_np = [np.asarray(t) for t in base_out]
report_mismatch("B (abk)", [np.asarray(t) for t in b_out], base_np)
if c_out is not None:
    report_mismatch("C", [np.asarray(t) for t in c_out], base_np)
