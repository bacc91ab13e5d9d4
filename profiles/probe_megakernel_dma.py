"""Ablate the bare megakernel cost: DMA vs conversions vs dots.
(Bases passed as kernel inputs — Pallas kernels cannot capture arrays.)"""
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
            print(f"{label:60s}   FAILED: {str(e)[:120]}", flush=True)
            return None
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args, jnp.zeros((), args[0].dtype)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:60s} {best/chain*1e3:8.2f} ms/iter", flush=True)
        return best / chain * 1e3

    F = 32
    N = F * 256 * 256
    C = 2048
    G = N // C
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
    mc64p = np.zeros((64, 64), np.float32)  # padded to square for tile ease
    mc64p[:32] = mc64
    mc64p_j = jnp.asarray(mc64p)

    rgb_flat = rng.integers(0, 256, size=(3, 64, N)).astype(np.uint8)
    rgb_chunk = jnp.asarray(
        rgb_flat.reshape(3, 64, G, C).transpose(2, 0, 1, 3).copy())

    H = jax.lax.Precision.HIGHEST
    D = jax.lax.Precision.DEFAULT

    def make(mode, precision=D, transpose_out=False):
        def kernel(x_ref, my_ref, mc_ref, y1, y2, y3):
            x = x_ref[0]
            if mode == "u8copy":
                o1, o2, o3 = x[0], x[1][:32], x[2][:32]
                y1[0], y2[0], y3[0] = o1, o2, o3
                return
            if mode == "i16":
                o1 = x[0].astype(jnp.int16)
                o2 = x[1][:32].astype(jnp.int16)
                o3 = x[2][:32].astype(jnp.int16)
            elif mode == "f32":
                o1 = x[0].astype(jnp.int32).astype(jnp.float32)
                o2 = (x[1].astype(jnp.int32).astype(jnp.float32)[:32]
                      + x[2].astype(jnp.int32).astype(jnp.float32)[:32])
                o3 = x[2][:32].astype(jnp.int32).astype(jnp.float32)
            elif mode == "dot":
                r = x[0].astype(jnp.int32).astype(jnp.float32)
                g = x[1].astype(jnp.int32).astype(jnp.float32)
                b = x[2].astype(jnp.int32).astype(jnp.float32)
                o1 = jax.lax.dot_general(
                    my_ref[:], r, (((1,), (0,)), ((), ())),
                    precision=precision, preferred_element_type=jnp.float32)
                o2 = jax.lax.dot_general(
                    mc_ref[:], g, (((1,), (0,)), ((), ())),
                    precision=precision, preferred_element_type=jnp.float32)[:32]
                o3 = jax.lax.dot_general(
                    mc_ref[:], b, (((1,), (0,)), ((), ())),
                    precision=precision, preferred_element_type=jnp.float32)[:32]
            elif mode == "dot_bf16":
                # u8 values are exact in bf16; split the f32 basis into
                # 3 bf16 terms -> 3 one-pass dots, f32 accumulate
                r = x[0].astype(jnp.int16).astype(jnp.bfloat16)
                g = x[1].astype(jnp.int16).astype(jnp.bfloat16)
                b = x[2].astype(jnp.int16).astype(jnp.bfloat16)
                def d(m_, v):
                    return jax.lax.dot_general(
                        m_, v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                o1 = d(my_ref[:].astype(jnp.bfloat16), r)
                o2 = d(mc_ref[:].astype(jnp.bfloat16), g)[:32]
                o3 = d(mc_ref[:].astype(jnp.bfloat16), b)[:32]
            if transpose_out:
                y1[:] = o1.T.astype(jnp.int16)
                y2[:] = o2.T.astype(jnp.int16)
                y3[:] = o3.T.astype(jnp.int16)
            else:
                y1[0] = o1.astype(jnp.int16)
                y2[0] = o2.astype(jnp.int16)
                y3[0] = o3.astype(jnp.int16)

        out_dt = jnp.uint8 if mode == "u8copy" else jnp.int16

        @jax.jit
        def run(x):
            if transpose_out:
                out_specs = (
                    pl.BlockSpec((C, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
                )
                out_shape = (
                    jax.ShapeDtypeStruct((N, 64), out_dt),
                    jax.ShapeDtypeStruct((N, 32), out_dt),
                    jax.ShapeDtypeStruct((N, 32), out_dt),
                )
            else:
                out_specs = (
                    pl.BlockSpec((1, 64, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 32, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 32, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                )
                out_shape = (
                    jax.ShapeDtypeStruct((G, 64, C), out_dt),
                    jax.ShapeDtypeStruct((G, 32, C), out_dt),
                    jax.ShapeDtypeStruct((G, 32, C), out_dt),
                )
            return pl.pallas_call(
                kernel, grid=(G,),
                in_specs=[
                    pl.BlockSpec((1, 3, 64, C), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=out_specs, out_shape=out_shape,
            )(x, my_j, mc64p_j)
        return run

    print(f"== DMA/conversion ablation, N={N} ==")
    bench(make("u8copy"), (rgb_chunk,), "u8 passthrough copy (pure DMA)")
    bench(make("i16"), (rgb_chunk,), "u8 -> i16 out (one cast)")
    bench(make("f32"), (rgb_chunk,), "u8 -> f32 -> i16 out")
    bench(make("dot", D), (rgb_chunk,), "+ DEFAULT dots")
    bench(make("dot", H), (rgb_chunk,), "+ HIGHEST dots")
    bench(make("dot_bf16"), (rgb_chunk,), "+ bf16 one-pass dots (u8-exact operands)")
    bench(make("dot", H, transpose_out=True), (rgb_chunk,), "+ HIGHEST dots, transposed out")
    bench(make("dot_bf16", transpose_out=True), (rgb_chunk,), "+ bf16 dots, transposed out")


if __name__ == "__main__":
    main()
