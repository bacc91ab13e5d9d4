import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
for src, dst in ((jnp.int16, jnp.float32), (jnp.int32, jnp.float32),
                 (jnp.uint8, jnp.int32), (jnp.int8, jnp.int32),
                 (jnp.int16, jnp.int32), (jnp.uint8, jnp.int16),
                 (jnp.bfloat16, jnp.float32)):
    def kern(x_ref, o_ref, dst=dst):
        o_ref[:] = x_ref[:].astype(dst)
    x = rng.integers(0, 127, size=(64, 256)).astype(np.dtype(src.dtype.name) if hasattr(src, 'dtype') else src)
    try:
        got = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((64, 256), dst),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(x, src))
        ok = np.array_equal(np.asarray(got), np.asarray(x).astype(np.dtype(dst.dtype.name) if hasattr(dst,'dtype') else dst))
        print(f"{src.__name__:9s} -> {dst.__name__:9s}: OK identical={ok}", flush=True)
    except Exception as e:
        print(f"{src.__name__:9s} -> {dst.__name__:9s}: FAILED {str(e)[:80]}", flush=True)
