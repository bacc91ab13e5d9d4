# Color-transform stage A/B: u32 byte-swizzle de-interleave.
#
# rgb_to_ycbcr extracts R/G/B with stride-3 u8 slices of the interleaved
# (H, W, 3) input.  Candidate: bitcast 12-byte pixel quads to three u32
# lanes, extract the 12 byte fields with shifts/ands, compute the color
# math on 4 subpixel phases at W/4 width, and re-pack each Y/Cr/Cb quad
# into one u32 lane — all VPU byte arithmetic, no strided u8 access.
# Output planes are bitcast-identical to the production path's.
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.ops.color import _snap_trunc, rgb_to_ycbcr
from lz4jpeg_tpu.utils.inputs import generate_noise_image

SIZE, BATCH = 2048, 32
rng = np.random.default_rng(0)
imgs = jnp.asarray(
    np.stack([generate_noise_image(SIZE, SIZE, rng) for _ in range(BATCH)])
)


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


def color_swizzle(rgb):
    """(H, W, 3) u8 -> u8 Y/Cr/Cb planes via u32 byte swizzles."""
    h, w = rgb.shape[:2]
    q = jax.lax.bitcast_convert_type(
        rgb.reshape(h, w // 4, 3, 4), jnp.uint32
    )  # (h, w/4, 3): lanes [R0G0B0R1][G1B1R2G2][B2R3G3B3]
    a, b, c = q[:, :, 0], q[:, :, 1], q[:, :, 2]

    def byte(word, k):
        return ((word >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32)

    # 4 subpixel phases at w/4 width
    r = [byte(a, 0), byte(a, 3), byte(b, 2), byte(c, 1)]
    g = [byte(a, 1), byte(b, 0), byte(b, 3), byte(c, 2)]
    bl = [byte(a, 2), byte(b, 1), byte(c, 0), byte(c, 3)]

    def pack4(vals):
        out = vals[0].astype(jnp.uint32)
        for k in (1, 2, 3):
            out = out | (vals[k].astype(jnp.uint32) << (8 * k))
        return jax.lax.bitcast_convert_type(out, jnp.uint8).reshape(h, w)

    ys, crs, cbs = [], [], []
    for k in range(4):
        ys.append(_snap_trunc(0.299 * r[k] + 0.587 * g[k] + 0.114 * bl[k]))
        crs.append(jnp.clip(
            _snap_trunc(0.439 * r[k] - 0.368 * g[k] - 0.071 * bl[k] + 128),
            0, 255))
        cbs.append(jnp.clip(
            _snap_trunc(-0.148 * r[k] - 0.291 * g[k] + 0.439 * bl[k] + 128),
            0, 255))
    return pack4(ys), pack4(crs), pack4(cbs)


base = timeit("A rgb_to_ycbcr (stride-3 u8)", jax.vmap(
    lambda im: rgb_to_ycbcr(im, jnp.float32)), imgs)
swz = timeit("B u32 byte-swizzle color", jax.vmap(color_swizzle), imgs)

for name, g, w in zip("Y Cr Cb".split(), swz, base):
    g, w = np.asarray(g), np.asarray(w)
    print(f"{name}: {(g != w).sum()}/{w.size} byte mismatches")
