"""A/B on TPU: production XLA sort-diff pack16 vs the round-3 Pallas
inverse-butterfly pack16 (``ops/pallas_rle.py``), honestly fenced.

Run with PYTHONPATH=/root/repo:/root/.axon_site.  Results feed
``results/pallas_ab.json`` (rle_encode_pack16_round3 entry) and — if the
Pallas kernel wins — the production pipeline switch in ``models/jpeg.py``.
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

    from lz4jpeg_tpu.ops.pallas_rle import rle_encode_packed16_pallas
    from lz4jpeg_tpu.ops.rle import rle_encode_packed16

    chain = 8
    rng = np.random.default_rng(0)

    def bench(fn, x, label):
        def chained(x, c0):
            def step(_, carry):
                c, s = carry
                p, l = fn(x ^ c)
                s = (
                    s
                    + jnp.sum(p.astype(jnp.float32))
                    + jnp.sum(l.astype(jnp.float32))
                )
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
        print(f"{label:44s} {per*1e3:8.2f} ms/iter", flush=True)
        return per

    # Bit-identity on-chip first.
    for L in (64, 32):
        v = rng.integers(-511, 512, size=(4096, L)).astype(np.int16)
        rep = np.repeat(
            rng.integers(-511, 512, size=(4096, (L + 7) // 8)), 8, axis=1
        )[:, :L]
        v[::2] = rep[::2].astype(np.int16)
        a = jax.jit(rle_encode_packed16)(jnp.asarray(v))
        b = jax.jit(rle_encode_packed16_pallas)(jnp.asarray(v))
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        print(f"on-chip bit-identical at L={L}", flush=True)

    results = {}
    for rows, length, tag in ((1 << 21, 64, "lum"), (1 << 21, 32, "chroma")):
        x = jnp.asarray(
            rng.integers(-511, 512, size=(rows, length)).astype(np.int16)
        ).astype(jnp.int32)
        xi16 = x.astype(jnp.int16)
        r = {}
        r["xla_sort_ms"] = 1e3 * bench(
            lambda v: rle_encode_packed16(v.astype(jnp.int16)),
            x, f"{tag} ({rows}x{length}) XLA sort-diff pack16",
        )
        r["pallas_butterfly_ms"] = 1e3 * bench(
            lambda v: rle_encode_packed16_pallas(v.astype(jnp.int16)),
            x, f"{tag} Pallas butterfly pack16",
        )
        results[tag] = r

    import json

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
