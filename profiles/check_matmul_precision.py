# Does the production fused DCT matmul lose exactness on the real chip?
# TPU f32 matmuls default to bf16 multiplies (DEFAULT precision); the CPU
# test suite cannot see that. Compare on-chip fused_forward_jnp against the
# CPU f64 staged oracle path, with and without Precision.HIGHEST.
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.ops.fused import _table_key, forward_basis, fused_forward_jnp
from lz4jpeg_tpu.ops.quantize import LUMINANCE_QUANTIZATION_TABLE

rng = np.random.default_rng(0)
tiles = rng.integers(0, 256, size=(4096, 8, 8), dtype=np.uint8)

# f64 reference on host
m, off = forward_basis(8, 8, _table_key(LUMINANCE_QUANTIZATION_TABLE))
x = tiles.reshape(-1, 64).astype(np.float64)
ratio = x @ m.T - off
nearest = np.round(ratio)
ratio = np.where(np.abs(ratio - nearest) <= 1e-9, nearest, ratio)
want = np.trunc(ratio)

got = np.asarray(
    jax.jit(
        lambda t: fused_forward_jnp(
            t, LUMINANCE_QUANTIZATION_TABLE, 8, 8, jnp.float32
        )
    )(jnp.asarray(tiles))
)
mis = int((got != want).sum())
print(f"default precision: {mis} / {want.size} mismatches")


def fused_highest(t):
    mj = jnp.asarray(m.T, jnp.float32)
    offj = jnp.asarray(off, jnp.float32)
    r = (
        jax.lax.dot_general(
            t.reshape(-1, 64).astype(jnp.float32),
            mj,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        - offj
    )
    nearest = jnp.round(r)
    r = jnp.where(jnp.abs(r - nearest) <= 1e-5, nearest, r)
    return jnp.trunc(r)


got_h = np.asarray(jax.jit(fused_highest)(jnp.asarray(tiles)))
mis_h = int((got_h != want).sum())
print(f"HIGHEST precision: {mis_h} / {want.size} mismatches")
