"""Megakernel v2: combined (C, 128) output (64 lum + 32 cr + 32 cb lanes
per block row) — full write lanes, one transpose, one output DMA stream.
Plus chunk-size and input-layout variants, and the full kernel with
color + HIGHEST dots + sparse epilogue."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lz4jpeg_tpu.ops.fused import forward_basis, _table_key
    from lz4jpeg_tpu.ops.quantize import (
        CHROMINANCE_QUANTIZATION_TABLE,
        LUMINANCE_QUANTIZATION_TABLE,
    )

    chain = 8
    rng = np.random.default_rng(0)

    def bench(fn, args, label):
        def chained(p, c0):
            def step(_, carry):
                c, s = carry
                out = fn(p + c.astype(p.dtype))
                s = s + sum(jnp.sum(o.astype(jnp.float32))
                            for o in jax.tree.leaves(out))
                return (s.astype(jnp.int32) % 2).astype(p.dtype), s
            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s
        f = jax.jit(chained)
        try:
            float(f(*args, jnp.zeros((), args[0].dtype)))
        except Exception as e:  # noqa: BLE001
            print(f"{label:60s}   FAILED: {str(e)[:110]}", flush=True)
            return None
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args, jnp.zeros((), args[0].dtype)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:60s} {best/chain*1e3:8.2f} ms/iter", flush=True)
        return best / chain * 1e3

    BIAS = 1024
    F = 32
    N = F * 256 * 256
    lum_t = LUMINANCE_QUANTIZATION_TABLE
    chr_t = CHROMINANCE_QUANTIZATION_TABLE
    my, offy = forward_basis(8, 8, _table_key(lum_t))
    mc, offc = forward_basis(4, 8, _table_key(chr_t))
    mc64 = np.zeros((32, 64))
    for k in range(32):
        for r in range(8):
            for cp in range(4):
                mc64[k, r * 8 + (2 * cp + 1)] = mc[k, r * 4 + cp]
    my_j = jnp.asarray(my, jnp.float32)
    mc64p = np.zeros((64, 64), np.float32)
    mc64p[:32] = mc64
    mc64p_j = jnp.asarray(mc64p)
    # offsets stacked as (128, 1): lum 0..63, cr 64..95, cb 96..127
    offs = np.concatenate([offy, offc, offc])[:, None].astype(np.float32)
    offs_j = jnp.asarray(offs)

    rgb_flat = rng.integers(0, 256, size=(3, 64, N)).astype(np.uint8)

    H = jax.lax.Precision.HIGHEST

    def snap_trunc(x, eps):
        nearest = jnp.round(x)
        return jnp.trunc(jnp.where(jnp.abs(x - nearest) <= eps, nearest, x))

    def make(C, mode, n_blocks=N):
        G = n_blocks // C

        def kernel(x_ref, my_ref, mc_ref, off_ref, out_ref):
            x = x_ref[0]
            if mode == "copy":
                w = jnp.concatenate(
                    [x[0], x[1][:32], x[2][:32]], axis=0).astype(jnp.int16)
                out_ref[:] = w.T
                return
            r = x[0].astype(jnp.int32).astype(jnp.float32)
            g = x[1].astype(jnp.int32).astype(jnp.float32)
            b = x[2].astype(jnp.int32).astype(jnp.float32)
            y = snap_trunc(0.299 * r + 0.587 * g + 0.114 * b, 1e-4)
            cr = jnp.clip(snap_trunc(
                0.439 * r - 0.368 * g - 0.071 * b + 128.0, 1e-4), 0., 255.)
            cb = jnp.clip(snap_trunc(
                -0.148 * r - 0.291 * g + 0.439 * b + 128.0, 1e-4), 0., 255.)

            def d(m_, v):
                return jax.lax.dot_general(
                    m_, v, (((1,), (0,)), ((), ())),
                    precision=H, preferred_element_type=jnp.float32)

            zz = jnp.concatenate(
                [d(my_ref[:], y), d(mc_ref[:], cr)[:32],
                 d(mc_ref[:], cb)[:32]], axis=0) - off_ref[:]
            xq = snap_trunc(zz, 1e-5).astype(jnp.int32)  # (128, C)
            if mode == "dct":
                out_ref[:] = xq.T.astype(jnp.int16)
                return
            # sparse epilogue per channel segment: position-in-segment
            # iota and segment-local roll guards
            m = jax.lax.broadcasted_iota(jnp.int32, xq.shape, 0)
            seg_pos = jnp.where(m < 64, m, jnp.where(m < 96, m - 64, m - 96))
            prev = pltpu.roll(xq, shift=1, axis=0)
            first = seg_pos == 0
            starts = first | (xq != prev)
            w = jnp.where(starts, xq - jnp.where(first, 0, prev) + BIAS, 0)
            out_ref[:] = w.T.astype(jnp.int16)

        @jax.jit
        def run(x):
            xc = x.reshape(3, 64, G, C).transpose(2, 0, 1, 3)
            return pl.pallas_call(
                kernel, grid=(G,),
                in_specs=[
                    pl.BlockSpec((1, 3, 64, C), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_blocks, 128), jnp.int16),
            )(xc, my_j, mc64p_j, offs_j)
        return run

    # pre-chunked device input to keep the XLA transpose out of the numbers
    rgb_lane = jnp.asarray(rgb_flat)

    print(f"== megakernel v2 (combined (C,128) out), N={N} ==")
    for C in (1024, 2048, 4096):
        bench(make(C, "copy"), (rgb_lane,), f"copy+transpose only, C={C}")
    for C in (1024, 2048, 4096):
        bench(make(C, "full"), (rgb_lane,), f"FULL color+dct+sparse, C={C}")
    bench(make(2048, "dct"), (rgb_lane,), "color+dct only (no sparse), C=2048")

    # correctness vs the XLA chain on a small case
    from lz4jpeg_tpu.ops.color import rgb_to_ycbcr, chroma_subsample_422
    from lz4jpeg_tpu.ops.fused import fused_forward_plane_jnp

    F2, HH, WW = 2, 512, 512
    n2 = F2 * (HH // 8) * (WW // 8)
    rgb_small = rng.integers(0, 256, size=(F2, HH, WW, 3)).astype(np.uint8)
    kt_small = np.transpose(
        rgb_small.reshape(F2, HH // 8, 8, WW // 8, 8, 3), (5, 2, 4, 0, 1, 3)
    ).reshape(3, 64, n2)

    def xla_ref(x):
        def one(frame):
            y, cr, cb = rgb_to_ycbcr(frame, jnp.float32)
            crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
            outs = []
            for pl_, t, w_ in ((y, lum_t, 8), (crs, chr_t, 4), (cbs, chr_t, 4)):
                zz = fused_forward_plane_jnp(pl_, t, w_)
                x_ = zz.astype(jnp.int32)
                prev = jnp.pad(x_, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
                first = jnp.arange(x_.shape[1])[None, :, None] == 0
                starts = first | (x_ != prev)
                outs.append(jnp.where(
                    starts, x_ - jnp.where(first, 0, prev) + BIAS, 0))
            return tuple(outs)
        return jax.vmap(one)(x)

    run2 = make(1024, "full", n_blocks=n2)
    got = np.asarray(jax.jit(run2)(jnp.asarray(kt_small)))
    ry, rcr, rcb = jax.jit(xla_ref)(jnp.asarray(rgb_small))
    def rm(a, k):
        return np.transpose(np.asarray(a), (0, 1, 3, 2)).reshape(-1, k)
    ref_comb = np.concatenate([rm(ry, 64), rm(rcr, 32), rm(rcb, 32)], axis=1)
    mism = int((got.astype(np.uint16) != ref_comb.astype(np.uint16)).sum())
    print(f"   combined-output mismatches vs XLA chain: {mism}/{ref_comb.size}")


if __name__ == "__main__":
    main()
