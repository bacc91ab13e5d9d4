"""Probe: sparse-delta RLE interchange (sparse16) vs the packed16 pair
layout at production shapes, honestly fenced (xor-perturb chained
dispatches, full-output checksums) — methodology of
profile_rle_decode_wide.py.

The hypothesis (round 5, VERDICT items 1/5): the pair layout forces a
concentration butterfly on encode and a distribute butterfly + prefix
fill on decode.  Storing each run's VALUE DELTA at its start position
instead (zero elsewhere) makes
  * encode = starts mask + one roll + select (no compaction at all:
    slots stay at their original positions), and
  * decode = one inclusive-prefix contraction, which FOLDS into the
    inverse einsum: pixels = delta @ suffix_sum(Minv) — the expansion
    stage disappears from the chain entirely.
Same bytes per block either way (K uint16).

Layouts probed:
  fwd baseline : fused_forward_plane_jnp -> rle_encode_packed16_pallas_kt
  fwd A1       : fused_forward_plane_jnp -> XLA sparse epilogue, KT out
  fwd A2       : A1 + XLA transpose to block-row-major (N, K)
  inv baseline : rle_decode_packed16_pallas_plane -> fused_inverse_plane_jnp
  inv B1       : sparse KT input -> folded suffix-basis einsum
  inv B2       : sparse (N, K) input -> XLA transpose -> folded einsum
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

    from lz4jpeg_tpu.ops.fused import (
        fused_forward_plane_jnp,
        fused_inverse_plane_jnp,
        inverse_basis,
        _table_key,
    )
    from lz4jpeg_tpu.ops.quantize import LUMINANCE_QUANTIZATION_TABLE
    from lz4jpeg_tpu.ops.pallas_rle import (
        rle_encode_packed16_pallas_kt,
        rle_decode_packed16_pallas_plane,
    )
    from lz4jpeg_tpu.ops.rle import rle_encode_packed16

    chain = 8
    rng = np.random.default_rng(0)
    table = LUMINANCE_QUANTIZATION_TABLE

    def bench(fn, args, label):
        def chained(p, c0):
            def step(_, carry):
                c, s = carry
                out = fn(p ^ c.astype(p.dtype)) if p.dtype != jnp.uint8 \
                    else fn(p + c.astype(p.dtype))
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
        """(bh, K, bw) f32 zigzag -> (bh, K, bw) uint16 sparse deltas +
        (bh, bw) run counts.  Pure elementwise + one K-axis shift."""
        x = zz_kt.astype(jnp.int32)
        prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        first = jnp.arange(x.shape[1])[None, :, None] == 0
        starts = first | (x != prev)
        w = jnp.where(starts, x - jnp.where(first, 0, prev) + BIAS, 0)
        return w.astype(jnp.uint16), jnp.sum(
            starts, axis=1, dtype=jnp.int32
        )

    # ---- forward probes (luma, 2048^2 x F frames stacked vertically) ----
    F = 32
    H, W = 2048 * F, 2048
    bh, bw, K = H // 8, W // 8, 64
    mpix = H * W / 1e6
    plane = rng.integers(0, 256, size=(H, W)).astype(np.uint8)
    # blocky content so runs exist (like the wide-decode profile)
    plane[:, ::2] = plane[:, 1::2]
    plane_j = jnp.asarray(plane)

    print(f"== forward: luma plane {H}x{W} ({mpix:.0f} MPix) ==")

    def fwd_base(p):
        zz = fused_forward_plane_jnp(p, table, 8)
        return rle_encode_packed16_pallas_kt(zz.astype(jnp.int16))

    def fwd_a1(p):
        zz = fused_forward_plane_jnp(p, table, 8)
        return sparse_epilogue_kt(zz)

    def fwd_a2(p):
        w, runs = fwd_a1(p)
        return (
            jnp.transpose(w, (0, 2, 1)).reshape(-1, K),
            runs.reshape(-1),
        )

    t_base = bench(fwd_base, (plane_j,), "fwd: einsum + packed16 kt kernel (production)")
    t_a1 = bench(fwd_a1, (plane_j,), "fwd A1: einsum + XLA sparse epilogue (KT out)")
    t_a2 = bench(fwd_a2, (plane_j,), "fwd A2: A1 + XLA transpose to (N, K)")

    # correctness: sparse -> pairs must equal the packed16 production output
    packed_ref, len_ref = jax.jit(fwd_base)(plane_j)
    w_kt, runs_kt = jax.jit(fwd_a1)(plane_j)
    w_rm = np.asarray(
        jnp.transpose(w_kt, (0, 2, 1)).reshape(-1, K)
    ).astype(np.int64)
    # reconstruct zz from sparse, re-encode with the pair spec
    d = np.where(w_rm != 0, w_rm - BIAS, 0)
    zz_rec = np.cumsum(d, axis=1)
    pk2, len2 = jax.jit(rle_encode_packed16)(jnp.asarray(zz_rec.astype(np.int16)))
    same = np.array_equal(np.asarray(packed_ref), np.asarray(pk2))
    same_len = np.array_equal(np.asarray(len_ref), np.asarray(len2))
    runs_match = np.array_equal(
        2 * np.asarray(runs_kt).reshape(-1), np.asarray(len_ref)
    )
    print(f"   sparse->pairs bijection: packed {same}, lengths {same_len}, "
          f"runs {runs_match}")

    # ---- inverse probes ----
    print(f"== inverse: same shape ==")
    zz = np.asarray(jax.jit(
        lambda p: fused_forward_plane_jnp(p, table, 8)
    )(plane_j)).astype(np.int16)  # (bh, K, bw)
    zz_rm = np.transpose(zz, (0, 2, 1)).reshape(-1, K)
    packed_rm, _ = jax.jit(rle_encode_packed16)(jnp.asarray(zz_rm))
    packed_rm = jnp.asarray(np.asarray(packed_rm))
    w_kt_j = jnp.asarray(np.asarray(w_kt))
    w_rm_j = jnp.asarray(w_rm.astype(np.uint16))

    def inv_base(pk):
        zz_kt = rle_decode_packed16_pallas_plane(pk, bw)
        return fused_inverse_plane_jnp(zz_kt, table, 8)

    # folded suffix basis: pixels = delta @ suffix_sum(Minv over k)
    minv = inverse_basis(8, 8, _table_key(table))  # (64 pix, 64 k)
    m2 = np.cumsum(minv[:, ::-1], axis=1)[:, ::-1]  # f64 suffix sums

    def folded_inverse_kt(d_kt, mi_np):
        mi = jnp.asarray(mi_np.T.reshape(K, 8, 8), jnp.float32)
        pix = jnp.einsum(
            "akb,kuv->aubv", d_kt.astype(jnp.float32), mi,
            precision="highest",
        ) + 128.0
        r = jnp.sign(pix) * jnp.floor(jnp.abs(pix) + 0.5)
        return jnp.clip(r, 0, 255).astype(jnp.uint8).reshape(H, W)

    def inv_b1(w):
        x = w.astype(jnp.int32)
        d = jnp.where(x != 0, x - BIAS, 0)
        return folded_inverse_kt(d, m2)

    def inv_b2(w_rm_in):
        x = w_rm_in.reshape(bh, bw, K).astype(jnp.int32)
        d = jnp.where(x != 0, x - BIAS, 0)
        return folded_inverse_kt(jnp.transpose(d, (0, 2, 1)), m2)

    t_ibase = bench(inv_base, (packed_rm,), "inv: plane decode kernel + inverse einsum (production)")
    t_b1 = bench(inv_b1, (w_kt_j,), "inv B1: sparse KT + folded suffix einsum")
    t_b2 = bench(inv_b2, (w_rm_j,), "inv B2: sparse (N,K) + transpose + folded einsum")

    ref_px = np.asarray(jax.jit(inv_base)(packed_rm))
    b1_px = np.asarray(jax.jit(inv_b1)(w_kt_j))
    mm = int((ref_px != b1_px).sum())
    mx = int(np.abs(ref_px.astype(np.int32) - b1_px.astype(np.int32)).max()) if mm else 0
    print(f"   folded-vs-production pixels: {mm}/{ref_px.size} differ "
          f"(max |diff| {mx})")

    out = {
        "shape": {"H": H, "W": W, "frames": F, "mpix": mpix},
        "forward_ms": {"production_packed16": t_base, "sparse_kt": t_a1,
                       "sparse_rm": t_a2},
        "inverse_ms": {"production_packed16": t_ibase, "sparse_kt": t_b1,
                       "sparse_rm": t_b2},
        "bijection_ok": bool(same and same_len and runs_match),
        "folded_pixel_mismatits": [mm, mx],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
