"""Why is the composed sparse16 inverse 57 ms when its stages sum to 31?
Suspects: the optimization_barrier (a packed16-era fix), vmap layout
choices, the per-channel loop structure."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


npix = 0


def main():
    global npix
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import (
        CHANNELS, _CHANNEL_SHAPES, JPEGPipeline,
    )
    from lz4jpeg_tpu.ops.color import ycbcr_planes_to_rgb
    from lz4jpeg_tpu.ops.fused import fused_inverse_plane_sparse_jnp
    from lz4jpeg_tpu.ops.pallas_fwd import CB_SLICE, CR_SLICE, LUM_SLICE
    from lz4jpeg_tpu.ops.rle import SPARSE16_DELTA_BIAS
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    size, batch, chain = 2048, 64, 8
    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    rng = np.random.default_rng(0)
    img = generate_noise_image(size, size, rng)
    slim = jax.block_until_ready(pipeline._forward_rle(jnp.asarray(img)))
    comb = jnp.tile(slim[None], (batch, 1, 1))
    bpc = bpr = size // 8
    npix = batch * size * size
    slices = {"lum": LUM_SLICE, "r": CR_SLICE, "b": CB_SLICE}

    def bench(body, data, label):
        def chained(x, c0):
            def step(_, carry):
                c, s = carry
                return body(x, c, s)
            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s
        f = jax.jit(chained)
        float(f(data, jnp.uint16(0)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(data, jnp.uint16(0)))
            best = min(best, time.perf_counter() - t0)
        t = best / chain
        print(f"{label:52s} {t*1e3:8.2f} ms  {npix/1e6/t:8.0f} MPix/s",
              flush=True)
        return t

    def inverse_variant(cc, barrier, fuse_unbias):
        planes = {}
        for name in CHANNELS:
            tw = _CHANNEL_SHAPES[name][1]
            k = 8 * tw
            w16 = cc[:, slices[name]].astype(jnp.int32)
            d = jnp.where(w16 != 0, w16 - SPARSE16_DELTA_BIAS, 0)
            d_kt = jnp.transpose(d.reshape(bpc, bpr, k), (0, 2, 1))
            if fuse_unbias == "barrier_kt":
                (d_kt,) = jax.lax.optimization_barrier((d_kt,))
            plane = fused_inverse_plane_sparse_jnp(
                d_kt, pipeline._tables[name], tw, jnp.float32,
                upsample_cols=(name != "lum"),
            )
            if barrier:
                (plane,) = jax.lax.optimization_barrier((plane,))
            planes[name] = plane
        return ycbcr_planes_to_rgb(
            planes["lum"], planes["r"], planes["b"], size, size,
            jnp.float32, chroma_upsampled=True,
        )

    def make_body(**kw):
        def body(cb, c, s):
            rgb = jax.vmap(lambda cc: inverse_variant(cc, **kw))(
                cb ^ c.astype(jnp.uint16)
            )
            s = s + jnp.sum(rgb.astype(jnp.float32))
            return (s % 2).astype(jnp.uint16), s
        return body

    print(f"== inverse composition gap, {size}² × b{batch} ==")
    bench(make_body(barrier=True, fuse_unbias="no"), comb,
          "production (plane barrier)")
    bench(make_body(barrier=False, fuse_unbias="no"), comb,
          "NO barrier (fully fused)")

    # i16 deltas (half the intermediate bytes; exact: |d| <= 1022)
    def inverse_i16(cc, barrier=False):
        planes = {}
        for name in CHANNELS:
            tw = _CHANNEL_SHAPES[name][1]
            k = 8 * tw
            w16 = cc[:, slices[name]].astype(jnp.int32)
            d = jnp.where(w16 != 0, w16 - SPARSE16_DELTA_BIAS, 0).astype(
                jnp.int16)
            d_kt = jnp.transpose(d.reshape(bpc, bpr, k), (0, 2, 1))
            plane = fused_inverse_plane_sparse_jnp(
                d_kt, pipeline._tables[name], tw, jnp.float32,
                upsample_cols=(name != "lum"),
            )
            if barrier:
                (plane,) = jax.lax.optimization_barrier((plane,))
            planes[name] = plane
        return ycbcr_planes_to_rgb(
            planes["lum"], planes["r"], planes["b"], size, size,
            jnp.float32, chroma_upsampled=True,
        )

    def body_i16(cb, c, s):
        rgb = jax.vmap(lambda cc: inverse_i16(cc))(
            cb ^ c.astype(jnp.uint16))
        s = s + jnp.sum(rgb.astype(jnp.float32))
        return (s % 2).astype(jnp.uint16), s
    bench(body_i16, comb, "i16 deltas, no barrier")

    for b2 in (16, 32):
        comb2 = jnp.tile(slim[None], (b2, 1, 1))
        npix_save = npix
        npix = b2 * size * size
        bench(make_body(barrier=False, fuse_unbias="no"), comb2,
              f"no barrier, batch={b2}")
        npix = npix_save


if __name__ == "__main__":
    main()
