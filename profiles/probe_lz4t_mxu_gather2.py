"""Ablate the MXU one-hot gather's 34.65 ms: transposes, H build,
matmul, byte extract — and the XLA-pre-transposed variant."""
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

    T = 2048
    CHUNK = 128
    C = p // CHUNK
    G = p // T
    SUB = T // 128

    def make(mode):
        def kernel(root_ref, lit2_ref, out_ref):
            rt = root_ref[0]                 # (128, SUB) pre-transposed
            outs = []
            for g in range(SUB):
                rcol = rt[:, g:g + 1]
                hi = rcol >> 7
                lo = rcol & 127
                if mode == "hbuild":
                    cio = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1)
                    h = (cio == hi).astype(jnp.bfloat16)
                    outs.append(
                        jnp.sum(h.astype(jnp.int32), axis=1, keepdims=True)
                        + lo
                    )
                    continue
                cio = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1)
                h = (cio == hi).astype(jnp.bfloat16)
                rows = jax.lax.dot_general(
                    h, lit2_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if mode == "nomask":
                    outs.append(
                        jnp.sum(rows.astype(jnp.int32), axis=1, keepdims=True)
                    )
                    continue
                lio = jax.lax.broadcasted_iota(jnp.int32, (128, CHUNK), 1)
                byte = jnp.sum(
                    jnp.where(lio == lo, rows.astype(jnp.int32), 0),
                    axis=1, keepdims=True,
                )
                outs.append(byte)
            out_ref[0] = jnp.concatenate(outs, axis=1).astype(jnp.int32)

        @jax.jit
        def run(root_in, lit_in):
            # XLA pre-transpose: outputs on sublanes, SUB chunk cols
            root_t = root_in.reshape(B * G, SUB, 128).transpose(0, 2, 1)
            lit2 = lit_in.reshape(B, C, CHUNK).astype(jnp.bfloat16)
            out_t = pl.pallas_call(
                kernel,
                grid=(B * G,),
                in_specs=[
                    pl.BlockSpec((1, 128, SUB), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, C, CHUNK), lambda i: (i // G, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 128, SUB), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (B * G, 128, SUB), jnp.int32),
            )(root_t, lit2)
            # XLA transposes back
            return out_t.transpose(0, 2, 1).reshape(B, p).astype(jnp.uint8)
        return run

    run_full = make("full")
    got = np.asarray(jax.jit(run_full)(root_j, lit_j))
    print("pre-transposed variant correct:", np.array_equal(got, ref))

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
    for mode in ("full", "nomask", "hbuild"):
        r = make(mode)
        bench(lambda a, b, r=r: jnp.sum(r(a, b).astype(jnp.float32)),
              (root_j, lit_j), f"pre-transposed mode={mode}", nbytes)


if __name__ == "__main__":
    main()
