"""Probe 3: can a Pallas kernel do the fused DCT matmul EXACTLY (f32
multiplies, not bf16) and the (8, bw, tw) -> (8, tw, bw) minor-dims
transpose?  Gates for a fused plane->packed16 kernel."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lz4jpeg_tpu.ops.fused import forward_basis, _table_key
    from lz4jpeg_tpu.oracle.jpeg_oracle import LUMINANCE_QUANTIZATION_TABLE

    m, off = forward_basis(8, 8, _table_key(LUMINANCE_QUANTIZATION_TABLE))
    m32 = m.astype(np.float32)  # (64, 64)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(512, 64)).astype(np.float32)

    # --- 1. in-kernel f32 dot vs XLA precision="highest" ----------------
    def dot_kernel(x_ref, m_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], m_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    try:
        got = pl.pallas_call(
            dot_kernel,
            out_shape=jax.ShapeDtypeStruct((512, 64), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(x), jnp.asarray(m32))
        ref = jax.jit(lambda a, b: jnp.matmul(a, b.T, precision="highest"))(
            jnp.asarray(x), jnp.asarray(m32))
        diff = int((np.asarray(got) != np.asarray(ref)).sum())
        print(f"in-kernel HIGHEST dot vs XLA highest: {diff}/{ref.size} differ", flush=True)
    except Exception as e:
        print("DOT LOWERING FAILED:", type(e).__name__, str(e)[:300], flush=True)

    # --- 2. minor-dims transpose (8, bw, tw) -> (8, tw, bw) --------------
    def tr_kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (0, 2, 1))

    for bw, tw in ((256, 8), (128, 4)):
        xs = rng.integers(0, 256, size=(8, bw, tw)).astype(np.float32)
        try:
            got = pl.pallas_call(
                tr_kernel,
                out_shape=jax.ShapeDtypeStruct((8, tw, bw), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.asarray(xs))
            np.testing.assert_array_equal(
                np.asarray(got), xs.transpose(0, 2, 1))
            print(f"minor-dims transpose (8,{bw},{tw}) lowers + correct", flush=True)
        except Exception as e:
            print(f"TRANSPOSE (8,{bw},{tw}) FAILED:", type(e).__name__,
                  str(e)[:300], flush=True)

    # --- 3. lane-split reshape (8, W) -> (8, bw, tw) ---------------------
    def split_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(8, 256, 8)

    xs = rng.integers(0, 256, size=(8, 2048)).astype(np.float32)
    try:
        got = pl.pallas_call(
            split_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 256, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(xs))
        np.testing.assert_array_equal(np.asarray(got), xs.reshape(8, 256, 8))
        print("lane-split reshape (8,2048)->(8,256,8) lowers + correct", flush=True)
    except Exception as e:
        print("LANE-SPLIT FAILED:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
