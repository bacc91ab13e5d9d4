"""Probe: does Mosaic lower a SUBLANE-axis inverse butterfly?

If pltpu.roll(axis=0) + a sublane-contracting MXU matmul lower, the RLE
butterfly can run on (64, B) tiles — the transposed layout the plane-view
einsum emits — skipping the tile relayout entirely.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SEG = 64     # compaction axis length (sublanes)
    LANES = 128  # blocks per tile (lanes)
    POS_SH, VAL_SH, VALID = 6, 13, 1 << 23

    def kernel(x_ref, lt_ref, packed_ref, runs_ref):
        x = x_ref[:].astype(jnp.int32)           # (SEG, LANES)
        m = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
        prev = pltpu.roll(x, shift=1, axis=0)
        starts = (m == 0) | (x != prev)
        # rank via sublane-contraction matmul: c[s,b] = sum_{j<=s} starts[j,b]
        c = jnp.dot(lt_ref[:], starts.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
        rank = c - 1
        word = jnp.where(
            starts, (m - rank) | (m << POS_SH) | ((x + 511) << VAL_SH) | VALID, 0
        )
        nbits = 6
        for b in range(nbits):
            step = 1 << b
            incoming = pltpu.roll(word, shift=SEG - step, axis=0)
            ok = m < (SEG - step)
            arrive = ok & ((incoming & VALID) != 0) & ((incoming & step) != 0)
            depart = ((word & VALID) != 0) & ((word & step) != 0)
            word = jnp.where(arrive, incoming - step, jnp.where(depart, 0, word))
        valid = (word & VALID) != 0
        key = jnp.where(valid, (word >> POS_SH) & 127, SEG)
        val = ((word >> VAL_SH) & 0x3FF) - 511
        nxt = jnp.where(m == SEG - 1, SEG, pltpu.roll(key, shift=SEG - 1, axis=0))
        counts = jnp.where(valid, nxt - key, 0)
        packed = (jnp.maximum(counts - 1, 0) << 10) | (val + 512)
        packed_ref[:] = jnp.where(counts > 0, packed, 0).astype(jnp.int16)
        runs_ref[:] = jnp.sum(starts.astype(jnp.int32), axis=0, keepdims=True)

    rows = 1 << 14  # tiles along grid
    j = jnp.arange(SEG)[:, None]
    s_ = jnp.arange(SEG)[None, :]
    lt = (s_ <= j).astype(jnp.bfloat16)  # lt[s, j] = j <= s (contract j)

    @jax.jit
    def run(x):
        grid = (x.shape[1] // LANES,)
        spec = pl.BlockSpec((SEG, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
        lt_spec = pl.BlockSpec((SEG, SEG), lambda i: (0, 0), memory_space=pltpu.VMEM)
        runs_spec = pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, lt_spec],
            out_specs=(spec, runs_spec),
            out_shape=(
                jax.ShapeDtypeStruct((SEG, x.shape[1]), jnp.int16),
                jax.ShapeDtypeStruct((1, x.shape[1]), jnp.int32),
            ),
        )(x, lt)

    rng = np.random.default_rng(0)
    xs = rng.integers(-511, 512, size=(SEG, 4 * LANES)).astype(np.int32)
    xs[:, ::2] = np.repeat(xs[::8, ::2], 8, axis=0)  # runs
    try:
        packed, runs = run(jnp.asarray(xs))
        packed = np.asarray(packed)
    except Exception as e:
        print("LOWERING FAILED:", type(e).__name__, str(e)[:500])
        return
    # reference via the shipped XLA path on transposed data
    from lz4jpeg_tpu.ops.rle import rle_encode_packed16
    ref_p, ref_l = jax.jit(rle_encode_packed16)(jnp.asarray(xs.T.astype(np.int16)))
    np.testing.assert_array_equal(np.asarray(ref_p).T.astype(np.int16), packed)
    np.testing.assert_array_equal(np.asarray(ref_l) // 2, np.asarray(runs)[0])
    print("sublane butterfly lowers AND is bit-identical")

    # quick perf check at production-ish volume: (64, 2M) vs (2M, 64)
    big = jnp.asarray(rng.integers(-511, 512, size=(SEG, 1 << 21)).astype(np.int32))

    def bench(f, x, label):
        def chained(x, c0):
            def step(_, carry):
                c, s = carry
                outs = f(x ^ c)
                s = s + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return (s % 2).astype(jnp.int32), s
            _, s = jax.lax.fori_loop(0, 8, step, (c0, jnp.float32(0)))
            return s
        g = jax.jit(chained)
        float(g(x, jnp.int32(0)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); float(g(x, jnp.int32(0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best/8*1e3:.2f} ms/iter", flush=True)

    bench(run, big, "sublane butterfly (64 x 2M)")


if __name__ == "__main__":
    main()
