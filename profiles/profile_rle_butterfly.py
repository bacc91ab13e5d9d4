"""A/B: bitonic-sort compaction vs inverse-butterfly (parallel-extract)
compaction for the RLE stage.

The RLE compaction does not need a general sort: run starts already occur
in ascending position order, so moving them to the front is a *monotone
concentration* — routable collision-free on an inverse butterfly network
in log2(L)=6 swap stages, LSB of the shift distance first (Hilewitz &
Lee's PEX construction), vs the bitonic sort's ~21 compare-exchange
stages.  Each element's shift distance d_i = number of non-starts before
it; stage k swaps pairs (i, i+2^k) with bit k of i clear when the right
element still has bit k of its remaining distance set.

Payload packing (one int32 word): d in bits 0..5, position in bits 6..12,
value+511 in bits 13..22, valid flag in bit 23.
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
    from lz4jpeg_tpu.ops.rle import PACK16_VALUE_BIAS, rle_encode_packed16
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    size, batch, chain = 2048, 32, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
    )
    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

    D_BITS = 6
    POS_SH = 6
    VAL_SH = 13
    VALID_BIT = 1 << 23

    def rle_packed16_butterfly(values):
        x = values.astype(jnp.int32)
        n, length = x.shape
        steps = int(np.log2(length))
        idx = jnp.arange(length, dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.ones((n, 1), jnp.bool_), x[:, 1:] != x[:, :-1]], axis=1
        )
        rank = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1
        dist = idx[None, :] - rank  # shift distance for valid elements
        word = jnp.where(
            starts,
            dist
            | (idx[None, :] << POS_SH)
            | ((x + 511) << VAL_SH)
            | VALID_BIT,
            0,
        )
        inval = jnp.zeros((n, 1), jnp.int32)
        for k in range(steps):
            m = 1 << k
            # Uniform left-shift by m: L[i] = word[i+m].  Collision-free:
            # current positions i - (d_i mod 2^k) stay strictly increasing
            # across valid elements after every stage (d_j - d_i <= j-i-1
            # for valid i<j), so an arriving element's slot never holds a
            # staying valid element.
            L = jnp.concatenate([word[:, m:], jnp.tile(inval, (1, m))], axis=1)
            arrive = ((L & VALID_BIT) != 0) & ((L & m) != 0)
            depart = ((word & VALID_BIT) != 0) & ((word & m) != 0)
            word = jnp.where(arrive, L - m, jnp.where(depart, 0, word))
        valid = (word & VALID_BIT) != 0
        key = jnp.where(valid, (word >> POS_SH) & 0x7F, length)
        val = ((word >> VAL_SH) & 0x3FF) - 511
        nxt = jnp.concatenate(
            [key[:, 1:], jnp.full((n, 1), length, jnp.int32)], axis=1
        )
        counts = jnp.where(valid, nxt - key, 0)
        packed = (jnp.maximum(counts - 1, 0) << 10) | (val + PACK16_VALUE_BIAS)
        packed = jnp.where(counts > 0, packed, 0).astype(jnp.uint16)
        num_runs = jnp.sum(starts, axis=1, dtype=jnp.int32)
        return packed, 2 * num_runs

    # ---- validity: exhaustive-ish random run structures vs production ----
    rng2 = np.random.default_rng(7)
    for trial, L in ((4000, 64), (4000, 32)):
        # random run-length data in the pack16 value range
        vals = rng2.integers(-511, 512, size=(trial, L)).astype(np.int16)
        # force long runs in half the rows
        rep = np.repeat(
            rng2.integers(-511, 512, size=(trial, (L + 7) // 8)), 8, axis=1
        )[:, :L]
        vals[::2] = rep[::2].astype(np.int16)
        a = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
        b = jax.jit(rle_packed16_butterfly)(jnp.asarray(vals))
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        print(f"butterfly == sort-diff on {trial} random blocks (L={L})",
              flush=True)

    def make_fwd(rle_fn):
        def fwd_one(rgb):
            lum, r, b = pipeline._split_impl(rgb)
            out = {}
            for name, tiles in (("lum", lum), ("r", r), ("b", b)):
                zz = forward_channel(
                    tiles, name, pipeline._tables, jnp.float32, True
                )
                p_, l = rle_fn(zz.astype(jnp.int16))
                out[name] = (p_, l.astype(jnp.int32))
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

    small = imgs[:2, :256, :256, :]
    ref = jax.jit(make_fwd(rle_encode_packed16))(small)
    got = jax.jit(make_fwd(rle_packed16_butterfly))(small)
    for c in CHANNELS:
        np.testing.assert_array_equal(np.asarray(ref[c][0]), np.asarray(got[c][0]))
        np.testing.assert_array_equal(np.asarray(ref[c][1]), np.asarray(got[c][1]))
    print("butterfly pipeline output bit-identical to production", flush=True)

    bench(make_fwd(rle_encode_packed16), "sort-diff (production)")
    bench(make_fwd(rle_packed16_butterfly), "inverse butterfly     ")


if __name__ == "__main__":
    main()
