"""Does the tunnel overlap d2h transfers with device compute?  (VERDICT
r4 item 6: the e2e roundtrip is ~65% transfer; double-buffering only
helps if transfer and compute can proceed concurrently.)

Method: dispatch a long compute (async), then immediately device_get a
precomputed buffer.  If the get takes as long as it does on an idle
device, transfers ride alongside compute; if it takes compute+transfer,
the tunnel serializes them."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # ~64 MB buffer to fetch (a few seconds at the 20-40 MB/s tunnel d2h)
    buf = jnp.asarray(rng.integers(0, 255, size=(64 << 20,), dtype=np.uint8))
    jax.block_until_ready(buf)

    # a ~1-2 s device compute: chained big matmuls
    x = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))

    @jax.jit
    def crunch(a, iters=40):
        def body(_, c):
            return c @ a * 1e-4
        return jax.lax.fori_loop(0, iters, body, a)[0, 0]

    float(crunch(x))  # warm

    host = np.asarray(rng.integers(0, 255, size=(64 << 20,), dtype=np.uint8))
    # jax caches the host copy after a device_get — every timed get must
    # fetch a FRESH device array (the entropy-ab lesson).
    fresh1 = jax.block_until_ready(jax.device_put(host))
    t0 = time.perf_counter()
    jax.device_get(fresh1)
    idle_get = time.perf_counter() - t0
    print(f"d2h of 64 MB on idle device: {idle_get:.2f} s "
          f"({64 / idle_get:.1f} MB/s)", flush=True)

    fresh2 = jax.block_until_ready(jax.device_put(host))
    t0 = time.perf_counter()
    s = crunch(x)          # async dispatch
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(fresh2)  # transfer while compute runs?
    busy_get = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(s)
    compute_rest = time.perf_counter() - t0
    print(f"dispatch {t_dispatch*1e3:.0f} ms; d2h during compute: "
          f"{busy_get:.2f} s; compute remainder after get: "
          f"{compute_rest:.2f} s", flush=True)

    t0 = time.perf_counter()
    float(crunch(x))
    compute_alone = time.perf_counter() - t0
    print(f"compute alone: {compute_alone:.2f} s", flush=True)

    overlap = busy_get < idle_get + 0.5 * compute_alone
    print(f"verdict: transfers {'OVERLAP' if overlap else 'SERIALIZE'} "
          f"with compute on this tunnel", flush=True)


if __name__ == "__main__":
    main()
