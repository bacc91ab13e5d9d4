"""What does a bare Pallas VMEM copy sustain on this chip?  Sweep block
shape / dtype / bytes-per-step to find the kernel-side stream ceiling
(the XLA stream probes measured 311-386 GB/s)."""
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

    def bench_bytes(fn, args, nbytes, label):
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
            print(f"{label:56s}   FAILED: {str(e)[:100]}", flush=True)
            return None
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(*args, jnp.zeros((), args[0].dtype)))
            best = min(best, time.perf_counter() - t0)
        t = best / chain
        print(f"{label:56s} {t*1e3:8.2f} ms  {nbytes/t/1e9:7.1f} GB/s",
              flush=True)
        return t

    rng = np.random.default_rng(0)
    total = 512 * 1024 * 1024  # 512 MiB source

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def make_copy(rows, cols, dtype, r_blk):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                copy_kernel, grid=(rows // r_blk,),
                in_specs=[pl.BlockSpec((r_blk, cols), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((r_blk, cols), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
            )(x)
        return run

    for dtype, dname in ((jnp.uint8, "u8"), (jnp.int16, "i16"),
                         (jnp.float32, "f32")):
        isz = np.dtype(dname if dname != "f32" else "float32").itemsize \
            if dname != "i16" else 2
        isz = {"u8": 1, "i16": 2, "f32": 4}[dname]
        cols = 2048
        rows = total // (cols * isz)
        x = jnp.asarray(
            rng.integers(0, 100, size=(rows, cols)).astype(
                {"u8": np.uint8, "i16": np.int16, "f32": np.float32}[dname]))
        for r_blk in (256, 1024, 4096):
            if rows % r_blk:
                continue
            step_kb = r_blk * cols * isz // 1024
            bench_bytes(make_copy(rows, cols, dtype, r_blk), (x,),
                        2 * total,
                        f"copy {dname} ({rows}x{cols}) r_blk={r_blk} "
                        f"[{step_kb} KB/step]")

    # XLA reference copies of the same arrays
    for dname, npdt in (("u8", np.uint8), ("i16", np.int16),
                        ("f32", np.float32)):
        isz = {"u8": 1, "i16": 2, "f32": 4}[dname]
        cols = 2048
        rows = total // (cols * isz)
        x = jnp.asarray(rng.integers(0, 100, size=(rows, cols)).astype(npdt))
        bench_bytes(jax.jit(lambda a: a + jnp.ones((), a.dtype)), (x,),
                    2 * total, f"XLA elementwise copy {dname}")


if __name__ == "__main__":
    main()
