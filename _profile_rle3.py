import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lz4jpeg_tpu.ops.rle import rle_encode_batched

N, L = 32 * 65536, 64
rng = np.random.default_rng(0)
x_noise = jnp.asarray(rng.integers(-341, 342, size=(N, L)), jnp.int32)

def boundaries_encode(values):
    x = values.astype(jnp.int32)
    n, length = x.shape
    idx = jnp.arange(length, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones((n, 1), jnp.bool_), x[:, 1:] != x[:, :-1]], axis=1
    )
    # next start strictly after i (length if none): reverse cummin of
    # (start? idx : length) shifted left by one.
    start_idx = jnp.where(starts, idx, length)
    shifted = jnp.concatenate(
        [start_idx[:, 1:], jnp.full((n, 1), length, jnp.int32)], axis=1
    )
    nxt = jnp.flip(
        jax.lax.cummin(jnp.flip(shifted, axis=1), axis=1), axis=1
    )
    counts = jnp.where(starts, nxt - idx, 0)
    num_runs = jnp.sum(starts, axis=1, dtype=jnp.int32)
    return counts, x, 2 * num_runs

def timeit(name, fn, *a):
    f = jax.jit(fn)
    r = f(*a); jax.tree_util.tree_map(lambda t: t.block_until_ready(), r)
    best = 1e9
    for _ in range(4):
        t = time.time()
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))
        best = min(best, time.time() - t)
    print(f"{name:22s} {best*1000:8.1f} ms")

timeit("sort2 (current)", rle_encode_batched, x_noise)
timeit("boundaries", boundaries_encode, x_noise)

# correctness vs compacted pairs, via numpy compaction
c, v, l2 = jax.jit(boundaries_encode)(x_noise)
c = np.asarray(c[:1000]); v = np.asarray(v[:1000]); l2 = np.asarray(l2[:1000])
p1, l1 = jax.jit(rle_encode_batched)(x_noise[:1000])
p1 = np.asarray(p1); l1 = np.asarray(l1)
ok = np.array_equal(l1, l2)
for i in range(1000):
    mask = c[i] > 0
    pairs = np.stack([c[i][mask], v[i][mask]], axis=1).reshape(-1)
    ok &= np.array_equal(pairs, p1[i, :len(pairs)]) and np.all(p1[i, len(pairs):] == 0)
print("match:", bool(ok))
