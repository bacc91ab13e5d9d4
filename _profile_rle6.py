import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lz4jpeg_tpu.ops.rle import rle_encode_batched

N, L = 32 * 65536, 64
rng = np.random.default_rng(0)
x32 = jnp.asarray(rng.integers(-341, 342, size=(N, L)), jnp.int32)
x16 = x32.astype(jnp.int16)

def fenced(fn):
    def g(a, carry):
        out = fn(a)
        return carry + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
    return jax.jit(g)

def timeit(name, fn, a, chain=4):
    f = fenced(fn)
    float(f(a, jnp.float32(0)))
    best = 1e9
    for _ in range(4):
        t = time.time()
        s = jnp.float32(0)
        for _ in range(chain):
            s = f(a, s)
        float(s)
        best = min(best, (time.time() - t) / chain)
    print(f"{name:28s} {best*1000:8.1f} ms/dispatch")
    return best

# bandwidth probe: 1GB f32 copy (read+write 2GB)
big = jnp.zeros((256, 1024, 1024), jnp.float32)
t = timeit("copy 1GB f32 (x+1)", lambda b: (b + 1,), big)
print(f"  -> approx HBM BW {(2*big.size*4/1e9)/t:.0f} GB/s")

def combined_encode_i16(values):
    x = values.astype(jnp.int32)
    n, length = x.shape
    idx = jnp.arange(length, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones((n, 1), jnp.bool_), x[:, 1:] != x[:, :-1]], axis=1
    )
    key = jnp.where(starts, idx, length)
    comb_sorted = jax.lax.sort(key * 65536 + (x + 32768), dimension=1)
    key_sorted = comb_sorted >> 16
    val_sorted = (comb_sorted & 0xFFFF) - 32768
    nxt = jnp.concatenate(
        [key_sorted[:, 1:], jnp.full((n, 1), length, jnp.int32)], axis=1
    )
    valid_run = key_sorted < length
    counts = jnp.where(valid_run, nxt - key_sorted, 0)
    run_values = jnp.where(valid_run, val_sorted, 0)
    num_runs = jnp.sum(starts, axis=1, dtype=jnp.int32)
    pairs = jnp.stack([counts, run_values], axis=2).reshape(n, 2 * length).astype(jnp.int16)
    return pairs, 2 * num_runs

def sort2_i16out(values):
    p, l = rle_encode_batched(values)
    return p.astype(jnp.int16), l

timeit("sort2 i32 out (current)", rle_encode_batched, x32)
timeit("sort2 i16 out", sort2_i16out, x32)
timeit("sort1 comb i16 out", combined_encode_i16, x32)
timeit("sort1 comb i16 in/out", combined_encode_i16, x16)
p1, l1 = jax.jit(rle_encode_batched)(x32[:512])
p2, l2 = jax.jit(combined_encode_i16)(x32[:512])
print("match:", bool(jnp.array_equal(p1.astype(jnp.int16), p2) & jnp.array_equal(l1, l2)))
