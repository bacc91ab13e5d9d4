"""MXU gather v4: outputs dense on lanes end to end.

Per 128-output tile: build the TRANSPOSED one-hot H~ (C, 128) by a
sublane-iota compare against the tile's hi row broadcast along sublanes
(free), then rowsT = lit2T (128, C) @ H~ (C, 128) on the MXU — chunk
contents per output land on sublanes — and the byte extract is a
sublane-iota compare + sublane reduce.  No narrow DMA anywhere."""
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
    from lz4jpeg_tpu.ops.lz4t_decode import build_copy_program_fast

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

    lit_j = jnp.asarray(lit)
    root_j = jnp.asarray(root)
    ref = np.asarray(
        jax.jit(lambda l, r: jnp.take_along_axis(l, r, axis=1))(lit_j, root_j)
    )

    CHUNK = 128
    C = p // CHUNK

    def make(rows_per_step, dtype_mode="bf16"):
        use_i8 = dtype_mode == "i8"
        R = rows_per_step            # 128-output rows per grid step
        G = p // (128 * R)

        def kernel(root_ref, lit2t_ref, out_ref):
            r2 = root_ref[0]          # (R, 128) i32 — outputs dense
            hi = r2 >> 7
            lo = r2 & 127
            sio = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
            bio = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 0)
            outs = []
            for r in range(R):
                hrow = hi[r:r + 1, :]              # (1, 128)
                if use_i8:
                    # int8 MXU at 2x the bf16 rate: bytes ride as v-128
                    # (one 1 per one-hot column keeps sums exact in i32)
                    ht = (sio == hrow).astype(jnp.int8)
                    rows_t = jax.lax.dot_general(
                        lit2t_ref[0], ht, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ) + 128
                else:
                    ht = (sio == hrow).astype(jnp.bfloat16)   # (C, 128)
                    rows_t = jax.lax.dot_general(
                        lit2t_ref[0], ht, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                              # (128, 128): byte x output
                lrow = lo[r:r + 1, :]
                sel = bio == lrow                  # (128, 128)
                outs.append(jnp.sum(
                    jnp.where(sel, rows_t.astype(jnp.int32), 0),
                    axis=0, keepdims=True,
                ))                                 # (1, 128)
            out_ref[0] = jnp.concatenate(outs, axis=0)  # (R, 128)

        @jax.jit
        def run(root_in, lit_in):
            root3 = root_in.reshape(B * G, R, 128)
            # lit2t: (B, 128 bytes-in-chunk, C chunks)
            l3 = jnp.transpose(lit_in.reshape(B, C, CHUNK), (0, 2, 1))
            lit2t = (
                (l3.astype(jnp.int32) - 128).astype(jnp.int8)
                if use_i8 else l3.astype(jnp.bfloat16)
            )
            out = pl.pallas_call(
                kernel,
                grid=(B * G,),
                in_specs=[
                    pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK, C), lambda i, G=G: (i // G, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B * G, R, 128), jnp.int32),
            )(root3, lit2t)
            return out.reshape(B, p).astype(jnp.uint8)
        return run

    def bench(fn, args, label, nbytes):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:46s} {best*1e3:8.2f} ms  {nbytes/best/1e6:8.1f} MB/s",
              flush=True)
        return best

    nbytes = B * p
    for R, dm in ((32, "bf16"), (32, "i8"), (16, "i8")):
        try:
            r = make(R, dm)
            got = np.asarray(jax.jit(r)(root_j, lit_j))
            ok = np.array_equal(got, ref)
            print(f"R={R} {dm} correct: {ok}")
            if ok:
                bench(lambda a, b, r=r: jnp.sum(r(a, b).astype(jnp.float32)),
                      (root_j, lit_j), f"v4 dense-lanes R={R} {dm}", nbytes)
        except Exception as e:  # noqa: BLE001
            print(f"R={R} {dm} FAILED: {str(e)[:140]}")


if __name__ == "__main__":
    main()
