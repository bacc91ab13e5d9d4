"""Bare-sort ceiling at the production RLE shapes (VERDICT r2 item 1).

The committed roofline charges the RLE stage only its I/O bytes (12·npix)
and reports 5.1% of HBM speed-of-light — but the stage is built on
``lax.sort``, whose bitonic network is the real primitive.  This script
measures what a BARE sort sustains at the exact production shapes, fully
fenced, so the stage can be judged against an *achievable* ceiling:

* lum:    (2·2^20, 64) — 2048²×b32 gives 2,097,152 8×8 MCU rows
* chroma: (2·2^20, 32) ×2 channels — same rows at 8×4 blocks

Variants per shape:
* ``sort1_i32``    — one int32 operand (the packed key|value layout the
  production ``_rle_runs`` uses for int16 inputs);
* ``sort2_i32``    — two-operand (key, payload) sort (the fallback path);
* ``rle_pack16``   — the full production ``rle_encode_packed16`` from an
  int16 input (sort + boundary compares + diff + pack);
* ``rle_from_f32`` — the same from f32 (adds the astype the pipeline pays).

Fencing: every timed chain reduces the FULL output (r2 fence-audit rule),
with the carry xor-perturbing the input so iterations can't be CSE'd.

Result feeds ``bench/roofline.py``'s ``sort_ceiling`` entry and
``results/roofline_jpeg_forward.json``.
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

    from lz4jpeg_tpu.ops.rle import rle_encode_packed16

    chain = 8
    rng = np.random.default_rng(0)

    def bench(fn, x, label, bytes_moved):
        def chained(x, c0):
            def step(_, carry):
                c, s = carry
                out = fn(x ^ c)
                if not isinstance(out, tuple):
                    out = (out,)
                s = s + sum(jnp.sum(o.astype(jnp.float32)) for o in out)
                return (s % 2).astype(x.dtype), s

            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s

        f = jax.jit(chained)
        float(f(x, x.dtype.type(0)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(x, x.dtype.type(0)))
            best = min(best, time.perf_counter() - t0)
        per = best / chain
        print(
            f"{label:34s} {per*1e3:8.2f} ms  "
            f"{bytes_moved/per/1e9:7.1f} GB/s io",
            flush=True,
        )
        return per

    results = {}
    for rows, length, tag in ((1 << 21, 64, "lum"), (1 << 21, 32, "chroma")):
        x16 = jnp.asarray(
            rng.integers(-511, 512, size=(rows, length)).astype(np.int16)
        )
        x32 = x16.astype(jnp.int32)
        xf = x16.astype(jnp.float32)
        elems = rows * length
        io1 = 8 * elems  # 4B in + 4B out

        r = {}
        r["sort1_i32"] = bench(
            lambda v: jax.lax.sort((v,), dimension=1, num_keys=1),
            x32, f"{tag} sort 1-op i32 ({rows}x{length})", io1,
        )
        r["sort2_i32"] = bench(
            lambda v: jax.lax.sort((v, v ^ 1), dimension=1, num_keys=1),
            x32, f"{tag} sort 2-op i32", 2 * io1,
        )
        r["rle_pack16_i16"] = bench(
            lambda v: rle_encode_packed16(v.astype(jnp.int16)),
            x32, f"{tag} rle_encode_packed16 (i16 in)",
            2 * elems + 2 * elems,
        )
        r["rle_from_f32"] = bench(
            lambda v: rle_encode_packed16(v.astype(jnp.int16)),
            xf.astype(jnp.int32), f"{tag} rle pack16 from i32 cast",
            4 * elems + 2 * elems,
        )
        results[tag] = r

    # Production stage = lum + 2x chroma; the sort ceiling is the best
    # bare-sort time at each shape.
    lum_s = results["lum"]["sort1_i32"]
    chroma_s = results["chroma"]["sort1_i32"]
    ceiling = lum_s + 2 * chroma_s
    stage = results["lum"]["rle_pack16_i16"] + 2 * results["chroma"]["rle_pack16_i16"]
    print(f"\nbare-sort ceiling (lum + 2*chroma): {ceiling*1e3:.2f} ms")
    print(f"full rle (i16, same shapes):        {stage*1e3:.2f} ms")
    print(f"stage at {ceiling/stage*100:.0f}% of bare-sort ceiling")


if __name__ == "__main__":
    main()
