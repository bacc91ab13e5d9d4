"""Probe 2: decompose the forward side — where do the ~21 ms go?

probe_sparse16.py measured einsum+epilogue at ~20.8 ms for a luma-only
134 MPix plane, yet the roofline artifact has mcu_matmul at 13 ms for
BOTH channel sets.  Suspects: (a) the single tall plane (bh=8192) maps
worse than the headline's vmapped (32, 2048, 2048) batch; (b) XLA fuses
the epilogue into the einsum and pessimizes it (the inverse chain needed
an optimization_barrier for exactly this); (c) the f32 zz
materialization between einsum and consumer.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp

    from lz4jpeg_tpu.ops.fused import fused_forward_plane_jnp
    from lz4jpeg_tpu.ops.quantize import LUMINANCE_QUANTIZATION_TABLE
    from lz4jpeg_tpu.ops.pallas_rle import rle_encode_packed16_pallas_kt

    chain = 8
    rng = np.random.default_rng(0)
    table = LUMINANCE_QUANTIZATION_TABLE

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
        float(f(*args, jnp.zeros((), args[0].dtype)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args, jnp.zeros((), args[0].dtype)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:58s} {best/chain*1e3:8.2f} ms/iter", flush=True)
        return best / chain * 1e3

    BIAS = 1024

    def sparse_epilogue_kt(zz_kt):
        x = zz_kt.astype(jnp.int32)
        prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        first = jnp.arange(x.shape[1])[None, :, None] == 0
        starts = first | (x != prev)
        w = jnp.where(starts, x - jnp.where(first, 0, prev) + BIAS, 0)
        return w.astype(jnp.uint16), jnp.sum(starts, axis=1, dtype=jnp.int32)

    F = 32
    H, W = 2048 * F, 2048
    plane = rng.integers(0, 256, size=(H, W)).astype(np.uint8)
    plane[:, ::2] = plane[:, 1::2]
    plane_j = jnp.asarray(plane)
    plane_b = jnp.asarray(plane.reshape(F, 2048, W))  # batched view

    print(f"== forward decomposition, luma {H}x{W} ==")
    bench(lambda p: fused_forward_plane_jnp(p, table, 8),
          (plane_j,), "einsum alone (tall plane, f32 out)")
    bench(lambda p: fused_forward_plane_jnp(p, table, 8).astype(jnp.int16),
          (plane_j,), "einsum alone -> i16")
    bench(lambda p: jax.vmap(
        lambda q: fused_forward_plane_jnp(q, table, 8))(p).astype(jnp.int16),
        (plane_b,), "einsum vmapped (32, 2048, 2048) -> i16")

    def barriered_sparse(p):
        zz = fused_forward_plane_jnp(p, table, 8)
        (zz,) = jax.lax.optimization_barrier((zz,))
        return sparse_epilogue_kt(zz)

    bench(barriered_sparse, (plane_j,), "einsum + BARRIER + sparse epilogue")

    def sparse_nobarrier(p):
        zz = fused_forward_plane_jnp(p, table, 8)
        return sparse_epilogue_kt(zz)

    bench(sparse_nobarrier, (plane_j,), "einsum + sparse epilogue (fused)")

    def kt_kernel(p):
        zz = fused_forward_plane_jnp(p, table, 8)
        return rle_encode_packed16_pallas_kt(zz.astype(jnp.int16))

    bench(kt_kernel, (plane_j,), "einsum + packed16 kt kernel (production)")

    def vmapped_sparse(p):
        def one(q):
            zz = fused_forward_plane_jnp(q, table, 8)
            return sparse_epilogue_kt(zz)
        return jax.vmap(one)(p)

    bench(vmapped_sparse, (plane_b,), "vmapped einsum + sparse epilogue")

    # the kt kernel fed by the vmapped einsum (production headline shape)
    def vmapped_kt(p):
        def one(q):
            zz = fused_forward_plane_jnp(q, table, 8)
            return rle_encode_packed16_pallas_kt(zz.astype(jnp.int16))
        return jax.vmap(one)(p)

    bench(vmapped_kt, (plane_b,), "vmapped einsum + packed16 kt kernel")


if __name__ == "__main__":
    main()
