"""Probe: LZ4T copy-resolve as a square-decomposed one-hot MXU gather.

The round-4 sort-join negative bounded the gather-free resolve at
~181 MB/s (bitonic rate); round-5 distance stats kill banded ideas
(median root distance is ~23 Ki of the 64 Ki block).  This formulation
is the MXU answer VERDICT item 2 asked for:

    r[i] = 128*hi[i] + lo[i]
    rows[i, :]  = H[i, :] @ lit2          (H one-hot over hi — EXACT:
                                           one 1 per row, u8 operands)
    out[i]      = sum_l L[i, l] * rows[i, l]   (lane one-hot dot)

Cost is 2*P^2 FLOPs per P-byte block (8.6 GFLOP per 64 KiB) regardless
of the split — an MXU-ceiling of ~1.5 GB/s in bf16, ~3 GB/s if int8
matmuls lower.  Compared against take_along_axis (70-86 Melem/s) and
the host C++ decoder (~150 MB/s throttled).
"""
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

    from lz4jpeg_tpu.config import LZ4Config
    from lz4jpeg_tpu.models.lz4 import LZ4Codec
    from lz4jpeg_tpu.ops.lz4t_decode import (
        build_copy_program_fast,
        resolve_blocks,
        depth_to_steps,
    )

    corpus = open(
        "/root/reference/Output-Input/input/Metamorphosis.txt", "rb"
    ).read()
    mb = 4
    data = (corpus * (-(-mb * 1 << 20) // len(corpus) + 1))[: mb << 20]
    codec = LZ4Codec(LZ4Config(mode="fast"))
    frame = codec.encode(data, engine="native")
    lit, src, sizes, p, depth = build_copy_program_fast(frame, depth_cap=1)
    B = lit.shape[0]
    idx = np.arange(p, dtype=np.int32)[None, :]
    root = np.where(src < 0, idx, src).astype(np.int32)
    print(f"{B} blocks of {p}; max_depth={depth}")

    lit_j = jnp.asarray(lit)
    root_j = jnp.asarray(root)
    ref = np.asarray(
        jax.jit(lambda l, r: jnp.take_along_axis(l, r, axis=1))(lit_j, root_j)
    )

    # ---- Pallas kernel ----
    T = 2048           # outputs per grid step
    CHUNK = 128        # lo range == lane width
    C = p // CHUNK     # hi range (512)
    G = p // T

    def kernel3(root_ref, lit2_ref, out_ref):
        r2 = root_ref[0]                    # (T//128, 128) int32
        rt = r2.T                           # (128, T//128) outputs on sublanes
        sub = rt.shape[1]
        outs = []
        for g in range(sub):                # T//128 sub-chunks
            rcol = rt[:, g:g + 1]           # (128, 1) roots of chunk g
            hi = rcol >> 7                  # (128, 1)
            lo = rcol & 127
            # H (128, C) one-hot over hi
            cio = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1)
            h = (cio == hi).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                h, lit2_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                               # (128, 128) gathered chunk rows
            lio = jax.lax.broadcasted_iota(jnp.int32, (128, CHUNK), 1)
            lsel = (lio == lo)
            byte = jnp.sum(
                jnp.where(lsel, rows.astype(jnp.int32), 0), axis=1,
                keepdims=True,
            )                               # (128, 1)
            outs.append(byte)
        out = jnp.concatenate(outs, axis=1)  # (128, T//128)
        out_ref[0] = out.T.astype(jnp.uint8)

    @jax.jit
    def mxu_gather(root_in, lit_in):
        root3 = root_in.reshape(B * G, T // 128, 128)
        lit2 = lit_in.reshape(B, C, CHUNK).astype(jnp.bfloat16)
        # grid step i handles block i // G, out-chunk i % G
        return pl.pallas_call(
            kernel3,
            grid=(B * G,),
            in_specs=[
                pl.BlockSpec((1, T // 128, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, CHUNK), lambda i: (i // G, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T // 128, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * G, T // 128, 128), jnp.uint8),
        )(root3, lit2)

    got = np.asarray(jax.jit(mxu_gather)(root_j, lit_j)).reshape(B, p)
    ok = np.array_equal(got, ref)
    print("mxu gather correct:", ok)
    if not ok:
        bad = np.nonzero(got != ref)
        print("first mismatches:", bad[0][:5], bad[1][:5])
        return

    # ---- timing ----
    def bench(fn, args, label, nbytes):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best*1e3:8.2f} ms  {nbytes/best/1e6:8.1f} MB/s",
              flush=True)
        return best

    nbytes = B * p
    bench(lambda r, l: jnp.sum(mxu_gather(r, l).astype(jnp.float32)),
          (root_j, lit_j), "MXU one-hot gather (fenced)", nbytes)
    bench(lambda l, r: jnp.sum(
        jnp.take_along_axis(l, r, axis=1).astype(jnp.float32)),
        (lit_j, root_j), "take_along_axis (fenced)", nbytes)
    # production doubling path at cap=4 for reference
    lit4, src4, _, _, d4 = build_copy_program_fast(frame, depth_cap=4)
    steps = depth_to_steps(d4)
    bench(lambda l, s: jnp.sum(
        resolve_blocks(l, s, steps).astype(jnp.float32)),
        (jnp.asarray(lit4), jnp.asarray(src4)),
        f"pointer doubling cap=4 ({steps} steps, fenced)", nbytes)


if __name__ == "__main__":
    main()
