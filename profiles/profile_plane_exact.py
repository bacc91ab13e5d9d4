"""Probe 2: (a) is the plane-view fused einsum bit-identical to the tile
matmul on TPU? (b) how fast is the sublane butterfly at the chroma shape?"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import JPEGPipeline, forward_channel, _CHANNEL_SHAPES
    from lz4jpeg_tpu.ops.fused import forward_basis, _table_key
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    pipe = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    rng = np.random.default_rng(0)

    def plane_einsum(plane, name, snap_eps=1e-5):
        h_, w_ = _CHANNEL_SHAPES[name]   # (8, tw)
        tw = w_
        hp, wp = plane.shape
        bh, bw = hp // 8, wp // tw
        m, off = forward_basis(tw, 8, _table_key(pipe._tables[name]))
        x = plane.reshape(bh, 8, bw, tw).astype(jnp.float32)
        mt = jnp.asarray(m.reshape(8 * tw, 8, tw), jnp.float32)
        ratio = jnp.einsum("krc,arbc->akb", mt, x, precision="highest") \
            - jnp.asarray(off, jnp.float32)[None, :, None]
        nearest = jnp.round(ratio)
        ratio = jnp.where(jnp.abs(ratio - nearest) <= snap_eps, nearest, ratio)
        return jnp.trunc(ratio)  # (bh, 8*tw, bw)

    total_mismatch = 0
    for size in (256, 512):
        img = generate_noise_image(size, size, rng)
        from lz4jpeg_tpu.ops.color import rgb_to_ycbcr, chroma_subsample_422, split_mcus
        y, cr, cb = rgb_to_ycbcr(jnp.asarray(img), jnp.float32)
        crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
        lum_t, r_t, b_t = split_mcus(y, crs, cbs)
        for name, tiles, plane in (("lum", lum_t, y), ("r", r_t, crs), ("b", b_t, cbs)):
            zz_tile = jax.jit(lambda t, n=name: forward_channel(
                t, n, pipe._tables, jnp.float32, True))(tiles)
            zz_plane = jax.jit(lambda p, n=name: plane_einsum(p, n))(plane)
            bh, K, bw = zz_plane.shape
            zz_plane_nk = np.asarray(zz_plane).transpose(0, 2, 1).reshape(-1, K)
            mism = int((np.asarray(zz_tile) != zz_plane_nk).sum())
            total_mismatch += mism
            print(f"{size}² {name}: mismatches {mism}/{zz_plane_nk.size}", flush=True)
    print("TOTAL mismatches:", total_mismatch, flush=True)

    # (b) chroma-shape sublane butterfly vs sort
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lz4jpeg_tpu.ops.rle import rle_encode_packed16

    def make_kernel(SEG):
        POS_SH, VAL_SH, VALID = 6, 13, 1 << 23
        nbits = SEG.bit_length() - 1

        def kernel(x_ref, lt_ref, packed_ref, runs_ref):
            x = x_ref[:].astype(jnp.int32)
            m = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
            prev = pltpu.roll(x, shift=1, axis=0)
            starts = (m == 0) | (x != prev)
            c = jnp.dot(lt_ref[:], starts.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32).astype(jnp.int32)
            rank = c - 1
            word = jnp.where(
                starts,
                (m - rank) | (m << POS_SH) | ((x + 511) << VAL_SH) | VALID, 0)
            for b in range(nbits):
                step = 1 << b
                incoming = pltpu.roll(word, shift=SEG - step, axis=0)
                ok = m < (SEG - step)
                arrive = ok & ((incoming & VALID) != 0) & ((incoming & step) != 0)
                depart = ((word & VALID) != 0) & ((word & step) != 0)
                word = jnp.where(arrive, incoming - step,
                                 jnp.where(depart, 0, word))
            valid = (word & VALID) != 0
            key = jnp.where(valid, (word >> POS_SH) & 127, SEG)
            val = ((word >> VAL_SH) & 0x3FF) - 511
            nxt = jnp.where(m == SEG - 1, SEG,
                            pltpu.roll(key, shift=SEG - 1, axis=0))
            counts = jnp.where(valid, nxt - key, 0)
            packed = (jnp.maximum(counts - 1, 0) << 10) | (val + 512)
            packed_ref[:] = jnp.where(counts > 0, packed, 0).astype(jnp.int16)
            runs_ref[:] = jnp.sum(starts.astype(jnp.int32), axis=0,
                                  keepdims=True)
        return kernel

    for SEG in (32, 64):
        LANES = 128
        jj = jnp.arange(SEG)[:, None]
        ss = jnp.arange(SEG)[None, :]
        lt = (ss <= jj).astype(jnp.bfloat16)
        kern = make_kernel(SEG)

        @jax.jit
        def run(x):
            grid = (x.shape[1] // LANES,)
            spec = pl.BlockSpec((SEG, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
            lt_spec = pl.BlockSpec((SEG, SEG), lambda i: (0, 0), memory_space=pltpu.VMEM)
            runs_spec = pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
            return pl.pallas_call(kern, grid=grid, in_specs=[spec, lt_spec],
                out_specs=(spec, runs_spec),
                out_shape=(jax.ShapeDtypeStruct((SEG, x.shape[1]), jnp.int16),
                           jax.ShapeDtypeStruct((1, x.shape[1]), jnp.int32)),
            )(x, lt)

        xs = rng.integers(-511, 512, size=(SEG, 2 * 128)).astype(np.int32)
        xs[:, ::2] = np.repeat(xs[:: (SEG // 8), ::2], SEG // 8, axis=0)[:SEG]
        packed, runs = run(jnp.asarray(xs))
        ref_p, ref_l = jax.jit(rle_encode_packed16)(jnp.asarray(xs.T.astype(np.int16)))
        np.testing.assert_array_equal(np.asarray(ref_p).T.astype(np.int16), np.asarray(packed))
        print(f"SEG={SEG} sublane bit-identical", flush=True)

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

        bench(run, big, f"sublane butterfly (SEG={SEG}, 2M blocks... cols)")


if __name__ == "__main__":
    main()
