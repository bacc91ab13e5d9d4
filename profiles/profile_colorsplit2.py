# Stage-level breakdown of color_split (the forward's limiting stage):
# which part eats the time — the color transform, the 4:2:2 subsample, or
# the 8x8 tiling relayout? Plus a no-pad tiling variant.
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.ops.color import (
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
    out = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        out = f(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(l.astype(jnp.float32)[..., ::13]) for l in leaves))
        best = min(best, time.time() - t0)
    mpix = batch * size * size / 1e6
    print(f"{name:28s} {best*1000:8.1f} ms  {mpix/best:8.1f} MPix/s")
    return out


# color transform only (planes out)
planes = timeit("color only", jax.vmap(lambda x: rgb_to_ycbcr(x, jnp.float32)), imgs)
planes = jax.tree_util.tree_map(lambda a: a.block_until_ready(), planes)
y, cr, cb = planes

# subsample only
subs = timeit(
    "subsample only",
    jax.vmap(lambda cr, cb: (chroma_subsample_422(cr), chroma_subsample_422(cb))),
    cr, cb,
)
crs, cbs = subs

# tiling relayout only
timeit("split_mcus only", jax.vmap(split_mcus), y, crs, cbs)


# no-pad tiling (2048 divides evenly; skip the zeros+update-slice)
def split_nopad(y, cr_sub, cb_sub):
    def tile(plane, th, tw):
        hh, ww = plane.shape
        return (
            plane.reshape(hh // th, th, ww // tw, tw)
            .transpose(0, 2, 1, 3)
            .reshape(-1, th, tw)
        )

    return tile(y, 8, 8), tile(cr_sub, 8, 4), tile(cb_sub, 8, 4)


timeit("split no-pad", jax.vmap(split_nopad), y, crs, cbs)

# whole stage, fused (what the pipeline runs)
def whole(rgb):
    yy, rr, bb = rgb_to_ycbcr(rgb, jnp.float32)
    return split_mcus(yy, chroma_subsample_422(rr), chroma_subsample_422(bb))


timeit("color+sub+split fused", jax.vmap(whole), imgs)
