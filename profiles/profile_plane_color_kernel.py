"""Pallas plane-color kernel A/B (round 4 follow-up).

The plane inverse chain's limiting stage is now the YCbCr→RGB merge:
33 ms standalone / ~60 ms in-chain at 268 MPix (10% of the measured
stream ceiling) for what is algorithmically a 5-byte/pixel streaming
pass.  This probe tests a VMEM kernel built on ``pltpu.repeat`` for the
4:2:2 lane upsample: y/cr/cb plane tiles in, three planar u8 channels
out (the planar→interleaved stack measured free in XLA,
profiles history), exact trunc semantics.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(y_ref, cr_ref, cb_ref, r_ref, g_ref, b_ref):
        y = y_ref[...].astype(jnp.int32)
        # u8→f32 does not lower in Mosaic (r3 capability map); widen via
        # i32 first.
        cr = (
            pltpu.repeat(cr_ref[...], 2, axis=1)
            .astype(jnp.int32)
            .astype(jnp.float32)
        )
        cb = (
            pltpu.repeat(cb_ref[...], 2, axis=1)
            .astype(jnp.int32)
            .astype(jnp.float32)
        )
        cr_term = jnp.trunc(1.402 * (cr - 128)).astype(jnp.int32)
        g_cb = jnp.trunc(0.344136 * (cb - 128)).astype(jnp.int32)
        g_cr = jnp.trunc(0.714136 * (cr - 128)).astype(jnp.int32)
        cb_term = jnp.trunc(1.772 * (cb - 128)).astype(jnp.int32)
        r_ref[...] = jnp.clip(y + cr_term, 0, 255).astype(jnp.uint8)
        g_ref[...] = jnp.clip(y - g_cb - g_cr, 0, 255).astype(jnp.uint8)
        b_ref[...] = jnp.clip(y + cb_term, 0, 255).astype(jnp.uint8)

    def call(y, cr_sub, cb_sub, rb=128):
        n, w = y.shape
        spec = pl.BlockSpec((rb, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((rb, w // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _kernel,
            grid=(n // rb,),
            in_specs=[spec, cspec, cspec],
            out_specs=(spec, spec, spec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((n, w), jnp.uint8) for _ in range(3)
            ),
        )(y, cr_sub, cb_sub)

    return call


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lz4jpeg_tpu.ops.color import ycbcr_planes_to_rgb

    rng = np.random.default_rng(0)
    size, batch = 2048, 64
    h = batch * size
    y = jnp.asarray(rng.integers(0, 256, size=(h, size), dtype=np.uint8))
    cr = jnp.asarray(
        rng.integers(0, 256, size=(h, size // 2), dtype=np.uint8)
    )
    cb = jnp.asarray(
        rng.integers(0, 256, size=(h, size // 2), dtype=np.uint8)
    )
    kern = make_kernel()

    # -- exactness vs the XLA path on a slice -----------------------------
    ys, crs, cbs = y[:4096], cr[:4096], cb[:4096]
    rr, gg, bb = jax.jit(kern)(ys, crs, cbs)
    ref = np.asarray(
        jax.jit(
            lambda a, b, c: ycbcr_planes_to_rgb(a, b, c, 4096, 2048)
        )(ys, crs, cbs)
    )
    got = np.stack([np.asarray(rr), np.asarray(gg), np.asarray(bb)], -1)
    assert (got == ref).all(), "kernel disagrees with XLA color path"
    print("exactness OK")

    # -- fenced timing, planar kernel vs XLA plane color ------------------
    def fence(f, runs=4):
        def chained(y, cr, cb, c):
            s = jnp.float32(0)
            for i in range(4):
                out = f(y ^ (c + i).astype(jnp.uint8), cr, cb)
                leaves = jax.tree_util.tree_leaves(out)
                s = s + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
            return s

        g = jax.jit(chained)
        float(g(y, cr, cb, jnp.uint8(0)))
        best = 1e9
        for _ in range(runs):
            t0 = time.perf_counter()
            float(g(y, cr, cb, jnp.uint8(0)))
            best = min(best, time.perf_counter() - t0)
        return best / 4

    npix = h * size
    t = fence(kern)
    print(f"pallas plane color (planar out): {t*1e3:7.2f} ms "
          f"({npix/1e6/t:6.0f} MPix/s)")
    t = fence(lambda a, b, c: ycbcr_planes_to_rgb(a, b, c, h, size))
    print(f"XLA plane color (interleaved):  {t*1e3:7.2f} ms "
          f"({npix/1e6/t:6.0f} MPix/s)")


if __name__ == "__main__":
    main()
