"""A/B: force materialization of the zz coefficient stream between the
fused MCU matmul and the RLE stage.

The full-chain fence probe showed the rle tail costs 27.4 ms/iter at b32
while the standalone sort stage costs 9.9 ms — the gap matches the fused
matmul (7.4 ms) being recomputed into 2-3 separate RLE consumer fusions
(sort operand, num_runs reduce, fence).  An optimization_barrier on zz
(and optionally on the int16 cast) makes XLA write it once and read it
back instead.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import JPEGPipeline, forward_channel
    from lz4jpeg_tpu.ops.rle import rle_encode_packed16
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    size, batch, chain = 2048, 32, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
    )
    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

    def make_fwd(barrier_on):
        def fwd_one(rgb):
            lum, r, b = pipeline._split_impl(rgb)
            out = {}
            for name, tiles in (("lum", lum), ("r", r), ("b", b)):
                zz = forward_channel(
                    tiles, name, pipeline._tables, jnp.float32, True
                )
                if barrier_on == "f32":
                    zz = jax.lax.optimization_barrier(zz)
                    x16 = zz.astype(jnp.int16)
                elif barrier_on == "i16":
                    x16 = jax.lax.optimization_barrier(zz.astype(jnp.int16))
                else:
                    x16 = zz.astype(jnp.int16)
                p, l = rle_encode_packed16(x16)
                out[name] = (p, l.astype(jnp.int32))
            return out

        return jax.vmap(fwd_one)

    def fence(out, s):
        l0 = out["lum"][1]
        s = s + sum(
            jnp.sum(v[0].astype(jnp.float32)) + jnp.sum(v[1].astype(jnp.float32))
            for v in out.values()
        )
        return (l0[0, 0] % 3).astype(jnp.int16), s

    def bench(fwd, label):
        def chained(x, c0):
            def step(_, carry):
                c, s = carry
                out = fwd(x + c.astype(jnp.uint8))
                return fence(out, s)

            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s

        f = jax.jit(chained)
        float(f(imgs, jnp.int16(0)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(imgs, jnp.int16(0)))
            best = min(best, time.perf_counter() - t0)
        per = best / chain
        mpix = batch * size * size / 1e6 / per
        print(f"{label}: {per*1e3:.2f} ms/iter  {mpix:.0f} MPix/s", flush=True)
        return per

    bench(make_fwd(None), "no barrier     ")
    bench(make_fwd("f32"), "barrier on f32 zz")
    bench(make_fwd("i16"), "barrier on i16 zz")


if __name__ == "__main__":
    main()
