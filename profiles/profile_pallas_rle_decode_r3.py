"""A/B: membership-einsum RLE decode vs the round-3 expansion-butterfly
Pallas kernel, honestly fenced at the production shapes."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp

    from lz4jpeg_tpu.ops.rle import rle_encode_packed16, rle_decode_packed16
    from lz4jpeg_tpu.ops.pallas_rle import rle_decode_packed16_pallas

    chain = 8
    rng = np.random.default_rng(0)

    def bench(fn, args, label):
        def chained(p, l, c0):
            def step(_, carry):
                c, s = carry
                out = fn(p ^ c.astype(p.dtype), l)
                s = s + jnp.sum(out.astype(jnp.float32))
                return (s % 2).astype(jnp.int32), s

            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s

        f = jax.jit(chained)
        float(f(*args, jnp.int32(0)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args, jnp.int32(0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:46s} {best/chain*1e3:8.2f} ms/iter", flush=True)
        return best / chain

    results = {}
    for rows, K, tag in ((1 << 21, 64, "lum"), (1 << 21, 32, "chroma")):
        vals = rng.integers(-511, 512, size=(rows, K)).astype(np.int16)
        rep = np.repeat(
            rng.integers(-511, 512, size=(rows, (K + 7) // 8)), 8, axis=1
        )[:, :K]
        vals[::2] = rep[::2].astype(np.int16)
        packed, lengths = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
        # on-chip identity first (xor-perturbation off)
        a = jax.jit(lambda p, l, K=K: rle_decode_packed16(p, l, K))(
            packed, lengths)
        b = jax.jit(lambda p, l, K=K: rle_decode_packed16_pallas(p, l, K))(
            packed, lengths)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print(f"{tag}: on-chip bit-identical", flush=True)
        r = {}
        # NOTE: the xor perturbation makes some packed words invalid-ish;
        # both decoders see the same bytes so the comparison stays fair.
        r["einsum_ms"] = 1e3 * bench(
            lambda p, l, K=K: rle_decode_packed16(p, l, K),
            (packed, lengths), f"{tag} ({rows}x{K}) membership einsum")
        r["butterfly_ms"] = 1e3 * bench(
            lambda p, l, K=K: rle_decode_packed16_pallas(p, l, K),
            (packed, lengths), f"{tag} expansion butterfly")
        results[tag] = r
    import json
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
