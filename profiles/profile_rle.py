import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lz4jpeg_tpu.ops.rle import rle_encode_batched

N, L = 32 * 65536, 64
rng = np.random.default_rng(0)
# noise-like quantized coeffs: many runs
x = jnp.asarray(rng.integers(-341, 342, size=(N, L)), jnp.int32)

def combined_encode(values):
    x = values.astype(jnp.int32)
    n, length = x.shape
    idx = jnp.arange(length, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones((n, 1), jnp.bool_), x[:, 1:] != x[:, :-1]], axis=1
    )
    key = jnp.where(starts, idx, length)
    combined = key * 65536 + (x + 32768)
    comb_sorted = jax.lax.sort(combined, dimension=1)
    key_sorted = comb_sorted >> 16
    val_sorted = (comb_sorted & 0xFFFF) - 32768
    nxt = jnp.concatenate(
        [key_sorted[:, 1:], jnp.full((n, 1), length, jnp.int32)], axis=1
    )
    valid_run = key_sorted < length
    counts = jnp.where(valid_run, nxt - key_sorted, 0)
    run_values = jnp.where(valid_run, val_sorted, 0)
    num_runs = jnp.sum(starts, axis=1, dtype=jnp.int32)
    pairs = jnp.stack([counts, run_values], axis=2).reshape(n, 2 * length)
    return pairs, 2 * num_runs

def timeit(name, fn, *a):
    f = jax.jit(fn)
    r = f(*a); jax.tree_util.tree_map(lambda t: t.block_until_ready(), r)
    best = 1e9
    for _ in range(4):
        t = time.time()
        p, l = f(*a)
        float(jnp.sum(p.astype(jnp.float32)) + jnp.sum(l))
        best = min(best, time.time() - t)
    print(f"{name:20s} {best*1000:8.1f} ms")
    return best

timeit("sort2 (current)", rle_encode_batched, x)
timeit("sort1 combined", combined_encode, x)
# correctness
p1, l1 = jax.jit(rle_encode_batched)(x)
p2, l2 = jax.jit(combined_encode)(x)
print("match:", bool(jnp.array_equal(p1, p2) & jnp.array_equal(l1, l2)))
