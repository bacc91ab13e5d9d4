"""Can fori_loop-chaining inside one jit beat the python-chained headline?

bench.py python-chains `chain` dispatches and pays per-dispatch tunnel
overhead; a lax.fori_loop carry-chain runs the same serialized work in
one dispatch.  Sweep (batch, chain) pairs at constant total work.
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
    from lz4jpeg_tpu.models.jpeg import JPEGPipeline
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    size = 2048
    rng = np.random.default_rng(0)
    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    fwd = jax.vmap(pipeline._forward_rle_impl)

    def fence(out, s):
        l0 = out["lum"][1]
        s = s + sum(
            jnp.sum(v[0].astype(jnp.float32)) + jnp.sum(v[1].astype(jnp.float32))
            for v in out.values()
        )
        return (l0[0, 0] % 3).astype(jnp.int16), s

    base = np.stack(
        [generate_noise_image(size, size, rng) for _ in range(128)]
    )

    for batch, chain in ((32, 8), (64, 4), (96, 4), (128, 2), (128, 4)):
        imgs = jnp.asarray(base[:batch])

        def chained(x, c0):
            def step(_, carry):
                c, s = carry
                out = fwd(x + c.astype(jnp.uint8))
                return fence(out, s)

            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s

        f = jax.jit(chained)
        try:
            float(f(imgs, jnp.int16(0)))
        except Exception as e:  # OOM guard
            print(f"b{batch} c{chain}: FAILED {type(e).__name__}", flush=True)
            continue
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(imgs, jnp.int16(0)))
            best = min(best, time.perf_counter() - t0)
        per = best / chain
        mpix = batch * size * size / 1e6 / per
        print(
            f"b{batch} c{chain}: {per*1e3:.2f} ms/iter  {mpix:.0f} MPix/s "
            f"(run {best*1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
