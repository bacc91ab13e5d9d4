"""VERDICT r4 item 3: bucket-partition matcher — measured pass costs.

The charter sketch ("hash-table match finder") suggests radix-partition
anchors by bucket16 instead of the O(Pa·log²Pa) bitonic.  On this
hardware the partition's primitives are the SAME monotone-concentration
butterfly stages the RLE kernels use (roll + compare + selects), so the
question reduces to stage counts at a measured per-stage rate:

* stable binary split (one bucket bit) = TWO monotone concentrations
  (zeros forward, ones to the back half) = 2·log2(Pa) stages;
* 16 bucket bits → 32·log2(Pa) stages ≈ 448 at Pa = 16Ki — 4.3× the
  full bitonic sort's log²/2+log/2 ≈ 105 stages.  k-bit digits need
  2^k concentrations per pass: (16/k)·2^k·log2(Pa) ≥ 448 for all k.
* the MXU alternative (one-hot permutation matmuls) costs 2·Pa²·w MACs
  per pass — the same 2·P² invariant measured at ~167 MB/s in the
  round-5 LZ4T gather (probe_lz4t_mxu_gather4.py).

This probe grounds the per-stage rate: one concentration pass at the
matcher's tile shape, timed against one bitonic-equivalent
compare-exchange pass of the same data — they run at the same rate, so
the stage-count arithmetic IS the measurement.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, ROWS, LANES = 256, 128, 128  # matcher tile shape: (B, 128, 128)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 1 << 30, size=(B, ROWS, LANES)).astype(np.int32)
    )
    STAGES = 32  # identical stage count for both variants

    def conc_kernel(x_ref, o_ref):
        """STAGES monotone-concentration butterfly stages (the radix
        partition's primitive): roll + masked arrive/depart selects."""
        w = x_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        for b in range(STAGES):
            step = 1 << (b % 7)
            incoming = pltpu.roll(w, shift=LANES - step, axis=1)
            ok = col < (LANES - step)
            arrive = ok & ((incoming & 1) != 0) & ((incoming & step) != 0)
            depart = ((w & 1) != 0) & ((w & step) != 0)
            w = jnp.where(arrive, incoming - step, jnp.where(depart, 0, w))
        o_ref[0] = w

    def bitonic_kernel(x_ref, o_ref):
        """STAGES compare-exchange stages (the bitonic's primitive):
        partner roll + min/max selects."""
        w = x_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        for b in range(STAGES):
            d = 1 << (b % 7)
            sel = (col & d) == 0
            partner = jnp.where(
                sel, pltpu.roll(w, shift=LANES - d, axis=1),
                pltpu.roll(w, shift=d, axis=1),
            )
            keep_min = sel == ((col & (2 * d)) == 0)
            w = jnp.where(
                keep_min, jnp.minimum(w, partner), jnp.maximum(w, partner)
            )
        o_ref[0] = w

    def make(kernel):
        @jax.jit
        def run(v):
            return pl.pallas_call(
                kernel,
                grid=(B,),
                in_specs=[pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, ROWS, LANES), jnp.int32),
            )(v)
        return run

    def bench(fn, label):
        f = jax.jit(lambda v: jnp.sum(fn(v).astype(jnp.float32)))
        float(f(x))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        elems = B * ROWS * LANES
        ps = best / (STAGES * elems) * 1e12
        print(f"{label:40s} {best*1e3:8.2f} ms  {ps:6.2f} ps/stage-elem",
              flush=True)
        return ps

    print(f"== partition-vs-bitonic stage rate, {STAGES} stages on "
          f"({B},{ROWS},{LANES}) ==")
    c = bench(make(conc_kernel), "concentration stages (radix primitive)")
    s = bench(make(bitonic_kernel), "compare-exchange stages (bitonic)")
    pa = 16384
    import math
    log2pa = int(math.log2(pa))
    bitonic_stages = log2pa * (log2pa + 1) // 2
    radix_stages = 2 * 16 * log2pa
    print(f"stage-count arithmetic at Pa={pa}: bitonic {bitonic_stages}, "
          f"16-bit radix >= {radix_stages} "
          f"(x{radix_stages/bitonic_stages:.1f} more stages at "
          f"{c/s:.2f}x the per-stage cost)")


if __name__ == "__main__":
    main()
