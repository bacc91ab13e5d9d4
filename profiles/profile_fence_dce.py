"""Probe: does checksumming only the RLE *lengths* let XLA dead-code-
eliminate the sort+pack of the forward chain?

Hypothesis (from the committed roofline artifact): full_forward measured
27.6 ms at b32 = color_split (20.4) + mcu_matmul (7.4) with the rle stage
(9.9) missing — because lengths = 2*num_runs = sum(starts) needs only the
boundary compares, not the bitonic sort or the pack16.

Times three fenced fori_loop-chained variants of the SAME production
forward (jax.vmap(JPEGPipeline._forward_rle_impl)) at b32 / chain 8:

  A. checksum lengths only          (the committed roofline's fence)
  B. checksum pairs + lengths      (bench.py's fence — forces the sort)
  C. checksum pairs[:, :, 0] sum    (slice fence — does XLA slice the sort?)
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

    size, batch, chain = 2048, 32, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
    )
    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    # Round 5: the production interchange is the sparse16 combined
    # array; this script reproduces the HISTORICAL pair-path fence
    # lesson, so pin the pre-round-5 layout explicitly.
    pipeline._sparse16 = pipeline._megakernel = False
    fwd = jax.vmap(pipeline._forward_rle_impl)

    def bench(fence, label):
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

    def fence_lengths(out, s):
        l0 = out["lum"][1]
        s = s + sum(jnp.sum(v[1].astype(jnp.float32)) for v in out.values())
        return (l0[0, 0] % 3).astype(jnp.int16), s

    def fence_full(out, s):
        l0 = out["lum"][1]
        s = s + sum(
            jnp.sum(v[0].astype(jnp.float32)) + jnp.sum(v[1].astype(jnp.float32))
            for v in out.values()
        )
        return (l0[0, 0] % 3).astype(jnp.int16), s

    def fence_slice(out, s):
        l0 = out["lum"][1]
        s = s + sum(
            jnp.sum(v[0][:, :, 0].astype(jnp.float32))
            + jnp.sum(v[1].astype(jnp.float32))
            for v in out.values()
        )
        return (l0[0, 0] % 3).astype(jnp.int16), s

    a = bench(fence_lengths, "A lengths-only ")
    b = bench(fence_full, "B pairs+lengths")
    c = bench(fence_slice, "C sliced pairs ")
    print(f"DCE gap A vs B: {1e3*(b-a):.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
