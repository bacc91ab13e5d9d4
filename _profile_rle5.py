import time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lz4jpeg_tpu.ops.rle import rle_encode_batched

N, L = 32 * 65536, 64
rng = np.random.default_rng(0)
x_noise = jnp.asarray(rng.integers(-341, 342, size=(N, L)), jnp.int32)

def make_boundaries(cummin_impl):
    def enc(values):
        x = values.astype(jnp.int32)
        n, length = x.shape
        idx = jnp.arange(length, dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.ones((n, 1), jnp.bool_), x[:, 1:] != x[:, :-1]], axis=1
        )
        start_idx = jnp.where(starts, idx, length)
        shifted = jnp.concatenate(
            [start_idx[:, 1:], jnp.full((n, 1), length, jnp.int32)], axis=1
        )
        nxt = cummin_impl(shifted)
        counts = jnp.where(starts, nxt - idx, 0)
        num_runs = jnp.sum(starts, axis=1, dtype=jnp.int32)
        return counts, x, 2 * num_runs
    return enc

def rev_cummin_lax(a):
    return jnp.flip(jax.lax.cummin(jnp.flip(a, axis=1), axis=1), axis=1)

def rev_cummin_lax_reverse(a):
    return jax.lax.cummin(a, axis=1, reverse=True)

def rev_cummin_shifts(a):
    n, length = a.shape
    s = 1
    while s < length:
        pad = jnp.full((n, s), 2**30, jnp.int32)
        a = jnp.minimum(a, jnp.concatenate([a[:, s:], pad], axis=1))
        s *= 2
    return a

def rev_cummin_ascan(a):
    return jax.lax.associative_scan(jnp.minimum, a, reverse=True, axis=1)

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
    print(f"{name:26s} {best*1000:8.1f} ms/dispatch")

timeit("sort2 (current)", rle_encode_batched, x_noise)
timeit("bnd lax.cummin rev", make_boundaries(rev_cummin_lax_reverse), x_noise)
timeit("bnd shift-min net", make_boundaries(rev_cummin_shifts), x_noise)
timeit("bnd associative_scan", make_boundaries(rev_cummin_ascan), x_noise)
# verify shift-net correctness
c1, v1, l1 = jax.jit(make_boundaries(rev_cummin_lax))(x_noise[:512])
c2, v2, l2 = jax.jit(make_boundaries(rev_cummin_shifts))(x_noise[:512])
print("shift-net match:", bool(jnp.array_equal(c1, c2) & jnp.array_equal(l1, l2)))
