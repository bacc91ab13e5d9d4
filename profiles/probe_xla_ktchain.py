"""Probe: the kt-matmul forward chain in PURE XLA.

probe_pallas_copy_ceiling.py showed Pallas VMEM copies cap at ~155 GB/s
on this chip while XLA elementwise streams run 270-300 GB/s — so the
memory-bound forward chain belongs in XLA, in the megakernel's
FORMULATION: transpose RGB to the kt block layout once, then color
(elementwise, layout-agnostic), DCT+quant+zigzag as ONE (64,64)@(64,N)
matmul per channel (4:2:2 subsample folded into a (32,64) chroma basis),
sparse-delta epilogue.  No plane einsum, no per-MCU relayout, no sort.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp

    from lz4jpeg_tpu.ops.color import rgb_to_ycbcr, chroma_subsample_422
    from lz4jpeg_tpu.ops.fused import (
        forward_basis,
        fused_forward_plane_jnp,
        _table_key,
    )
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
        float(f(*args, jnp.zeros((), args[0].dtype)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args, jnp.zeros((), args[0].dtype)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:62s} {best/chain*1e3:8.2f} ms/iter", flush=True)
        return best / chain * 1e3

    BIAS = 1024
    F, HH, WW = 32, 2048, 2048
    bh, bw = HH // 8, WW // 8
    N = F * bh * bw
    mpix = F * HH * WW / 1e6

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
    mc64_j = jnp.asarray(mc64, jnp.float32)
    offy_j = jnp.asarray(offy, jnp.float32)
    offc_j = jnp.asarray(offc, jnp.float32)

    rgb = rng.integers(0, 256, size=(F, HH, WW, 3)).astype(np.uint8)
    rgb[:, :, ::2] = rgb[:, :, 1::2]
    rgb_j = jnp.asarray(rgb)

    def stage_a(x):
        t = x.reshape(F, bh, 8, bw, 8, 3).transpose(5, 2, 4, 0, 1, 3)
        return t.reshape(3, 64, N)

    def snap_trunc(x, eps):
        nearest = jnp.round(x)
        return jnp.trunc(jnp.where(jnp.abs(x - nearest) <= eps, nearest, x))

    def color_kt(kt):
        r = kt[0].astype(jnp.float32)
        g = kt[1].astype(jnp.float32)
        b = kt[2].astype(jnp.float32)
        y = snap_trunc(0.299 * r + 0.587 * g + 0.114 * b, 1e-4)
        cr = jnp.clip(snap_trunc(
            0.439 * r - 0.368 * g - 0.071 * b + 128.0, 1e-4), 0., 255.)
        cb = jnp.clip(snap_trunc(
            -0.148 * r - 0.291 * g + 0.439 * b + 128.0, 1e-4), 0., 255.)
        return y, cr, cb

    def sparse_rm(zz):  # (N, K) f32 quantized -> (N, K) u16 sparse deltas
        x = zz.astype(jnp.int32)
        prev = jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
        first = jnp.arange(x.shape[1])[None, :] == 0
        starts = first | (x != prev)
        return jnp.where(
            starts, x - jnp.where(first, 0, prev) + BIAS, 0
        ).astype(jnp.uint16)

    def dct_nk(m, v, off):  # (K,64) basis, (64,N) plane -> (N,K)
        ratio = jnp.einsum(
            "kj,jn->nk", m, v, precision="highest"
        ) - off[None, :]
        return snap_trunc(ratio, 1e-5)

    def x1(x):  # separate outputs
        y, cr, cb = color_kt(stage_a(x))
        return (
            sparse_rm(dct_nk(my_j, y, offy_j)),
            sparse_rm(dct_nk(mc64_j, cr, offc_j)),
            sparse_rm(dct_nk(mc64_j, cb, offc_j)),
        )

    def x2(x):  # combined (N, 128)
        y, cr, cb = color_kt(stage_a(x))
        return jnp.concatenate([
            sparse_rm(dct_nk(my_j, y, offy_j)),
            sparse_rm(dct_nk(mc64_j, cr, offc_j)),
            sparse_rm(dct_nk(mc64_j, cb, offc_j)),
        ], axis=1)

    def x3(x):  # KT-layout outputs (no transpose anywhere)
        y, cr, cb = color_kt(stage_a(x))
        outs = []
        for m, v, off in ((my_j, y, offy_j), (mc64_j, cr, offc_j),
                          (mc64_j, cb, offc_j)):
            zz = jnp.einsum("kj,jn->kn", m, v, precision="highest") \
                - off[:, None]
            zq = snap_trunc(zz, 1e-5).astype(jnp.int32)
            prev = jnp.pad(zq, ((1, 0), (0, 0)))[:-1, :]
            first = jnp.arange(zq.shape[0])[:, None] == 0
            starts = first | (zq != prev)
            outs.append(jnp.where(
                starts, zq - jnp.where(first, 0, prev) + BIAS, 0
            ).astype(jnp.uint16))
        return tuple(outs)

    print(f"== XLA kt-matmul chain, {mpix:.0f} MPix ==")
    t_a = bench(stage_a, (rgb_j,), "Stage A alone")
    t1 = bench(x1, (rgb_j,), "X1: StageA+color+kt matmuls+sparse, (N,K) x3")
    t2 = bench(x2, (rgb_j,), "X2: combined (N, 128) out")
    t3 = bench(x3, (rgb_j,), "X3: KT (K, N) outs (no transpose)")

    # current production chain for comparison
    def prod(x):
        def one(frame):
            y, cr, cb = rgb_to_ycbcr(frame, jnp.float32)
            crs, cbs = chroma_subsample_422(cr), chroma_subsample_422(cb)
            outs = []
            for pl_, t, w in ((y, lum_t, 8), (crs, chr_t, 4), (cbs, chr_t, 4)):
                zz = fused_forward_plane_jnp(pl_, t, w)
                x_ = zz.astype(jnp.int32)
                prev = jnp.pad(x_, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
                first = jnp.arange(x_.shape[1])[None, :, None] == 0
                starts = first | (x_ != prev)
                outs.append(jnp.where(
                    starts, x_ - jnp.where(first, 0, prev) + BIAS, 0
                ).astype(jnp.uint16))
            return tuple(outs)
        return jax.vmap(one)(x)

    tp = bench(prod, (rgb_j,), "production-shaped: color + plane einsums + sparse")

    # correctness: X1 vs production
    ry, rcr, rcb = jax.jit(prod)(rgb_j)
    g1, g2, g3 = jax.jit(x1)(rgb_j)
    def rm(a, k):
        return np.transpose(np.asarray(a), (0, 1, 3, 2)).reshape(-1, k)
    mism = [int((rm(r, k) != np.asarray(g)).sum()) for r, g, k in
            ((ry, g1, 64), (rcr, g2, 32), (rcb, g3, 32))]
    print(f"   X1 mismatches vs production: {mism}")
    print(json.dumps({"stage_a": t_a, "x1": t1, "x2": t2, "x3": t3,
                      "prod": tp, "mpix_s_x1": mpix / t1 * 1e3}))


if __name__ == "__main__":
    main()
