"""A/B: (1) fence formulation cost, (2) uint16-packed RLE sort.

The headline fence reduces the full pack16 output; `sum(pairs.astype(f32))`
may materialize an f32 copy of ~0.5 GB per b32 iteration.  A `max` reduce
over the raw u16 is equally un-DCE-able (every element feeds the result)
and needs no cast.

The RLE sort currently packs (key<<16 | val+32768) into ONE int32 word.
In pack16 mode |val| <= 511 and keys are positions 0..63, so
(key<<10 | val+511) fits uint16 with sentinel 0xFFFF for non-starts —
halving the traffic of the only op in the chain XLA cannot fuse.
Sentinel ordering: valid slot low bits <= 1022 < 1023, so the position-63
run still sorts before any sentinel; valid keys are unique positions so
low bits never reorder them.
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
    from lz4jpeg_tpu.models.jpeg import (
        CHANNELS,
        JPEGPipeline,
        forward_channel,
    )
    from lz4jpeg_tpu.ops.rle import (
        PACK16_VALUE_BIAS,
        rle_encode_packed16,
    )
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    size, batch, chain = 2048, 32, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
    )
    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

    def rle_encode_packed16_u16sort(values):
        """pack16 RLE with the internal sort on uint16 operands."""
        x = values.astype(jnp.int32)
        n, length = x.shape
        idx = jnp.arange(length, dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.ones((n, 1), jnp.bool_), x[:, 1:] != x[:, :-1]], axis=1
        )
        packed = jnp.where(
            starts, (idx << 10) + (x + 511), 0xFFFF
        ).astype(jnp.uint16)
        (ps,) = jax.lax.sort((packed,), dimension=1, num_keys=1)
        ps32 = ps.astype(jnp.int32)
        key = ps32 >> 10
        val = (ps32 & 0x3FF) - 511
        invalid = ps32 == 0xFFFF
        nxt_key = jnp.concatenate(
            [key[:, 1:], jnp.full((n, 1), length, jnp.int32)], axis=1
        )
        nxt_invalid = jnp.concatenate(
            [invalid[:, 1:], jnp.ones((n, 1), jnp.bool_)], axis=1
        )
        nxt = jnp.where(nxt_invalid, length, nxt_key)
        counts = jnp.where(invalid, 0, nxt - key)
        out = (jnp.maximum(counts - 1, 0) << 10) | (val + PACK16_VALUE_BIAS)
        out = jnp.where(counts > 0, out, 0).astype(jnp.uint16)
        num_runs = jnp.sum(starts, axis=1, dtype=jnp.int32)
        return out, 2 * num_runs

    def make_fwd(rle_fn):
        def fwd_one(rgb):
            lum, r, b = pipeline._split_impl(rgb)
            out = {}
            for name, tiles in (("lum", lum), ("r", r), ("b", b)):
                zz = forward_channel(
                    tiles, name, pipeline._tables, jnp.float32, True
                )
                p, l = rle_fn(zz.astype(jnp.int16))
                out[name] = (p, l.astype(jnp.int32))
            return out

        return jax.vmap(fwd_one)

    def bench(fwd, fence, label):
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

    def fence_sum(out, s):
        l0 = out["lum"][1]
        s = s + sum(
            jnp.sum(v[0].astype(jnp.float32)) + jnp.sum(v[1].astype(jnp.float32))
            for v in out.values()
        )
        return (l0[0, 0] % 3).astype(jnp.int16), s

    def fence_max(out, s):
        l0 = out["lum"][1]
        s = s + sum(
            jnp.max(v[0]).astype(jnp.float32) + jnp.max(v[1]).astype(jnp.float32)
            for v in out.values()
        )
        return (l0[0, 0] % 3).astype(jnp.int16), s

    fwd32 = make_fwd(rle_encode_packed16)
    fwd16 = make_fwd(rle_encode_packed16_u16sort)

    # correctness first
    small = imgs[:2, :256, :256, :]
    a = jax.jit(fwd32)(small)
    b = jax.jit(fwd16)(small)
    for c in CHANNELS:
        np.testing.assert_array_equal(np.asarray(a[c][0]), np.asarray(b[c][0]))
        np.testing.assert_array_equal(np.asarray(a[c][1]), np.asarray(b[c][1]))
    print("u16-sort pack16 output bit-identical to production", flush=True)

    bench(fwd32, fence_sum, "i32 sort, sum-f32 fence")
    bench(fwd32, fence_max, "i32 sort, max-u16 fence")
    bench(fwd16, fence_sum, "u16 sort, sum-f32 fence")
    bench(fwd16, fence_max, "u16 sort, max-u16 fence")


if __name__ == "__main__":
    main()
