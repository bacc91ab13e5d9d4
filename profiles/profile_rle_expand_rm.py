"""Follow-up to profile_rle_expand_ablate: (a) split the copyT cost into
transpose vs slab-store vs pure row-major copy; (b) A/B the plane inverse
einsum with the zigzag operand in KT (a k b — what the plane kernel emits
today) vs ROW-MAJOR (a b k — what a transpose-free decode kernel would
emit).  If (b) is ~free, the decode butterfly can drop its transpose and
run in the encode kernel's (rows, 128) multi-segment orientation.
"""
import functools
import json
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

    chain = 8
    rng = np.random.default_rng(0)
    results = {}

    def timeit(f, args, label, iters=chain):
        float(f(*args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        print(f"{label:44s} {ms:8.2f} ms", flush=True)
        return ms

    # ---- (a) copy variants at the luma shape -----------------------------
    K, bw, frames = 64, 256, 16
    rows = frames * 256 * 256
    p16 = jnp.asarray(
        rng.integers(1, 1 << 15, size=(rows, K)).astype(np.int16))
    bh = rows // bw
    slabs = max(1, (1 << 18) // (bw * K))
    while bh % slabs:
        slabs -= 1

    def copy_rm_kernel(p_ref, o_ref):
        o_ref[:] = p_ref[:]

    def copy_t_contig_kernel(p_ref, o_ref):
        o_ref[:] = p_ref[:].T

    def copy_t_slab_kernel(p_ref, o_ref, *, bw, slabs):
        xt = p_ref[:].T
        for i in range(slabs):
            o_ref[i, :, :] = xt[:, i * bw: (i + 1) * bw]

    r_blk = slabs * bw
    spec = pl.BlockSpec((r_blk, K), lambda r: (r, 0),
                        memory_space=pltpu.VMEM)
    rm = pl.pallas_call(
        copy_rm_kernel, grid=(rows // r_blk,), in_specs=[spec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((rows, K), jnp.int16))
    tc = pl.pallas_call(
        copy_t_contig_kernel, grid=(rows // r_blk,), in_specs=[spec],
        out_specs=pl.BlockSpec((K, r_blk), lambda r: (0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, rows), jnp.int16))
    ts = pl.pallas_call(
        functools.partial(copy_t_slab_kernel, bw=bw, slabs=slabs),
        grid=(bh // slabs,), in_specs=[spec],
        out_specs=pl.BlockSpec((slabs, K, bw), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, K, bw), jnp.int16))

    def chained(fn):
        def g(p):
            def step(_, carry):
                c, s = carry
                out = fn(p ^ c)
                s = s + jnp.sum(out.astype(jnp.float32))
                return (s.astype(jnp.int32) % 2).astype(jnp.int16), s
            _, s = jax.lax.fori_loop(0, chain, step,
                                     (jnp.int16(0), jnp.float32(0)))
            return s
        return jax.jit(g)

    # Wide view: the same bytes as (rows/2, 128) — two 64-pair blocks per
    # lane row, the full-register orientation.
    wspec = pl.BlockSpec((r_blk // 2, 128), lambda r: (r, 0),
                         memory_space=pltpu.VMEM)
    wide = pl.pallas_call(
        copy_rm_kernel, grid=(rows // r_blk,), in_specs=[wspec],
        out_specs=wspec,
        out_shape=jax.ShapeDtypeStruct((rows // 2, 128), jnp.int16))
    p16w = p16.reshape(rows // 2, 128)

    ca = {}
    ca["copy_rm_ms"] = timeit(chained(rm), (p16,), "copy row-major")
    ca["copy_wide_ms"] = timeit(chained(wide), (p16w,),
                                "copy row-major WIDE (N/2,128) view")
    ca["copy_T_contig_ms"] = timeit(chained(tc), (p16,), "copy transposed contiguous")
    ca["copy_T_slab_ms"] = timeit(chained(ts), (p16,), "copy transposed slab stores (prod layout)")
    results["copy_variants_lum"] = ca

    # ---- (b) inverse einsum orientation A/B ------------------------------
    from lz4jpeg_tpu.ops.fused import inverse_basis, _table_key
    from lz4jpeg_tpu.oracle.jpeg_oracle import LUMINANCE_QUANTIZATION_TABLE

    minv = inverse_basis(
        8, 8, _table_key(np.asarray(LUMINANCE_QUANTIZATION_TABLE)))
    mi = jnp.asarray(minv.T.reshape(64, 8, 8), jnp.float32)
    zz_kt = jnp.asarray(
        rng.integers(-40, 40, size=(bh, 64, bw)).astype(np.float32))
    zz_rm = jnp.transpose(zz_kt, (0, 2, 1))

    def inv_kt(z):
        pix = jnp.einsum("akb,kuv->aubv", z, mi,
                         precision="highest") + 128.0
        r = jnp.sign(pix) * jnp.floor(jnp.abs(pix) + 0.5)
        return jnp.clip(r, 0, 255).astype(jnp.uint8).reshape(8 * bh, 8 * bw)

    def inv_rm(z):
        pix = jnp.einsum("abk,kuv->aubv", z, mi,
                         precision="highest") + 128.0
        r = jnp.sign(pix) * jnp.floor(jnp.abs(pix) + 0.5)
        return jnp.clip(r, 0, 255).astype(jnp.uint8).reshape(8 * bh, 8 * bw)

    def chainedf(fn):
        def g(z):
            def step(_, carry):
                c, s = carry
                out = fn(z + c)
                s = s + jnp.sum(out.astype(jnp.float32))
                return s % 2, s
            _, s = jax.lax.fori_loop(0, chain, step,
                                     (jnp.float32(0), jnp.float32(0)))
            return s
        return jax.jit(g)

    a = np.asarray(jax.jit(inv_kt)(zz_kt))
    b = np.asarray(jax.jit(inv_rm)(zz_rm))
    print("einsum orientations agree:", bool((a == b).all()), flush=True)
    eb = {}
    eb["einsum_kt_ms"] = timeit(chainedf(inv_kt), (zz_kt,), "inverse einsum akb (KT, production)")
    eb["einsum_rm_ms"] = timeit(chainedf(inv_rm), (zz_rm,), "inverse einsum abk (row-major)")
    results["einsum_orientation_lum"] = eb
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
