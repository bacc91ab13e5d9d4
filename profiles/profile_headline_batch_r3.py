import jax, numpy as np, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import JPEGPipeline
from lz4jpeg_tpu.utils.inputs import generate_noise_image
size = 2048
rng = np.random.default_rng(0)
pipe = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
for batch, chain in ((128, 4), (192, 3), (256, 2)):
    try:
        imgs = jnp.asarray(np.stack([generate_noise_image(size, size, rng) for _ in range(batch)]))
        def fwd(x, c):
            out = jax.vmap(pipe._forward_rle_impl)(x)
            return c + sum(jnp.sum(p.astype(jnp.float32)) + jnp.sum(l.astype(jnp.float32)) for p, l in out.values())
        f = jax.jit(fwd)
        def step():
            s = jnp.float32(0)
            for _ in range(chain):
                s = f(imgs, s)
            float(s)
        step()
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); step(); best = min(best, time.perf_counter() - t0)
        mpix = chain * batch * size * size / 1e6 / best
        print(f"b{batch} c{chain}: {mpix:.0f} MPix/s", flush=True)
        del imgs
    except Exception as e:
        print(f"b{batch}: FAILED {type(e).__name__} {str(e)[:200]}", flush=True)
