"""A/B: wide lane-resident decode kernel vs the KT (transposed) kernels at
production shapes, honestly fenced (full-output sum, xor perturbation) —
same methodology as profile_pallas_rle_decode_r3."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp

    from lz4jpeg_tpu.ops.rle import rle_encode_packed16
    from lz4jpeg_tpu.ops.pallas_rle import (
        rle_decode_packed16_pallas,
        rle_decode_packed16_pallas_plane,
        rle_decode_packed16_pallas_wide,
    )

    chain = 8
    rng = np.random.default_rng(0)

    def bench(fn, args, label):
        def chained(p, c0):
            def step(_, carry):
                c, s = carry
                out = fn(p ^ c.astype(p.dtype))
                s = s + jnp.sum(out.astype(jnp.float32))
                return (s.astype(jnp.int32) % 2).astype(p.dtype), s
            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s
        f = jax.jit(chained)
        float(f(*args, jnp.zeros((), args[0].dtype)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args, jnp.zeros((), args[0].dtype)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:52s} {best/chain*1e3:8.2f} ms/iter", flush=True)
        return best / chain * 1e3

    results = {}
    # fence floor: xor+sum with no kernel, to place the marginal costs
    for K, bw, frames, tag in ((64, 256, 16, "lum"), (32, 256, 16, "chr")):
        rows = frames * 256 * 256  # one pair row per luma block position
        vals = rng.integers(-511, 512, size=(rows, K)).astype(np.int16)
        rep = np.repeat(
            rng.integers(-511, 512, size=(rows, (K + 7) // 8)), 8, axis=1
        )[:, :K]
        vals[::2] = rep[::2].astype(np.int16)
        packed, lengths = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
        a = np.asarray(jax.jit(
            lambda p, l, K=K: rle_decode_packed16_pallas(p, l, K)
        )(packed, lengths))
        b = np.asarray(jax.jit(rle_decode_packed16_pallas_wide)(packed))
        np.testing.assert_array_equal(a, b)
        print(f"{tag}: wide on-chip bit-identical to KT", flush=True)
        r = {"rows": rows, "K": K}
        r["floor_ms"] = bench(
            lambda p: p, (packed,), f"{tag} fence floor (xor+sum only)")
        r["kt_rowmajor_ms"] = bench(
            lambda p, K=K: rle_decode_packed16_pallas(
                p, None, K), (packed,), f"{tag} KT kernel (row-major out)")
        r["kt_plane_ms"] = bench(
            lambda p, bw=bw: rle_decode_packed16_pallas_plane(p, bw),
            (packed,), f"{tag} KT plane kernel (slab out)")
        r["wide_ms"] = bench(
            rle_decode_packed16_pallas_wide, (packed,),
            f"{tag} WIDE kernel (row-major out)")
        results[tag] = r
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
