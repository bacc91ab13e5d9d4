"""Probe 4: Pallas color kernel pieces — (R, W, 3) minor-dims transpose
for RGB deinterleave, and (R, W) -> odd-column subsample via lane split."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    R, W = 16, 2048

    # full color kernel candidate: RGB (R, W, 3) u8 -> y (R, W) u8,
    # cr_sub/cb_sub (R, W//2) u8, reproducing ops/color.py bit-for-bit.
    def color_kernel(x_ref, y_ref, cr_ref, cb_ref):
        x = x_ref[:].astype(jnp.int32).astype(jnp.float32)  # (R, W, 3); no direct u8->f32 in Mosaic
        xt = jnp.transpose(x, (0, 2, 1))          # (R, 3, W)
        r = xt[:, 0, :]
        g = xt[:, 1, :]
        b = xt[:, 2, :]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cr = 0.439 * r - 0.368 * g - 0.071 * b + 128.0
        cb = -0.148 * r - 0.291 * g + 0.439 * b + 128.0
        # i16 outputs: Mosaic has no f32->u8 store; trunc semantics via
        # f32->i32 match the reference's trunc-on-u8-assign for [0,256).
        y_ref[:] = y.astype(jnp.int32).astype(jnp.int16)
        crc = jnp.clip(cr, 0.0, 255.0)
        cbc = jnp.clip(cb, 0.0, 255.0)
        # 4:2:2 keeping ODD columns: lane split (W) -> (W//2, 2), take [1]
        cr2 = crc.reshape(R, W // 2, 2)[:, :, 1]
        cb2 = cbc.reshape(R, W // 2, 2)[:, :, 1]
        cr_ref[:] = cr2.astype(jnp.int32).astype(jnp.int16)
        cb_ref[:] = cb2.astype(jnp.int32).astype(jnp.int16)

    x = rng.integers(0, 256, size=(R, W, 3)).astype(np.uint8)
    try:
        y, crs, cbs = pl.pallas_call(
            color_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((R, W), jnp.int16),
                jax.ShapeDtypeStruct((R, W // 2), jnp.int16),
                jax.ShapeDtypeStruct((R, W // 2), jnp.int16),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)
            ),
        )(jnp.asarray(x))
    except Exception as e:
        print("COLOR KERNEL FAILED:", type(e).__name__, str(e)[:3000], flush=True)
        return

    from lz4jpeg_tpu.ops.color import rgb_to_ycbcr, chroma_subsample_422
    ry, rcr, rcb = rgb_to_ycbcr(jnp.asarray(x), jnp.float32)
    rcrs = chroma_subsample_422(rcr)
    rcbs = chroma_subsample_422(rcb)
    ok = True
    for name, a, b_ in (("y", y, ry), ("cr", crs, rcrs), ("cb", cbs, rcbs)):
        d = int((np.asarray(a) != np.asarray(b_).astype(np.int16)).sum())
        print(f"{name}: {d}/{np.asarray(a).size} differ", flush=True)
        ok &= d == 0
    print("COLOR KERNEL", "BIT-IDENTICAL" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
