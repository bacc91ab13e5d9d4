"""Attribute the inverse chain's limiting stage (`rle_expand`, 30 ms at
2048sq/b64 per results/roofline_jpeg_inverse.json) across the plane decode
kernel's internal phases, by cumulative ablation at the production shape.

Variants (each one keeps everything the previous had, so deltas attribute):
  copyT      load packed + in-VMEM transpose + store transposed back
  +unpack    ... + count/value unpack and validity masks
  +matmul    ... + the MXU inclusive-prefix-sum of counts
  +dist      ... + the 6 MSB-first distribute roll stages
  full       ... + the 6 fill-forward roll stages (= production kernel)

Each variant writes a value derived from every live intermediate so Mosaic
cannot dead-code-eliminate the ablated prefix.  Numbers are NOT valid
decodes for the ablated variants — they exist only to place the cost.
"""
import functools
import json
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

    from lz4jpeg_tpu.ops.rle import rle_encode_packed16
    from lz4jpeg_tpu.ops.pallas_rle import (
        PACK16_VALUE_BIAS, _VAL_SH, _VALID, LANES,
    )

    def kernel(p_ref, ltx_ref, zz_ref, *, seg, bw, slabs, phase):
        nbits = seg.bit_length() - 1
        x = p_ref[:].astype(jnp.int32) & 0xFFFF
        xt = x.T
        out = xt  # phase 0: copyT
        if phase >= 1:
            m = jax.lax.broadcasted_iota(jnp.int32, xt.shape, dimension=0)
            valid = xt != 0
            counts = jnp.where(valid, (xt >> 10) + 1, 0)
            vals = jnp.where(valid, (xt & 0x3FF) - PACK16_VALUE_BIAS, 0)
            out = counts + vals  # phase 1: +unpack
        if phase >= 2:
            incl = jnp.dot(
                ltx_ref[:], counts.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            starts = incl - counts
            total = jnp.max(incl, axis=0, keepdims=True)
            dist = jnp.where(valid, starts - m, 0)
            word = jnp.where(
                valid, dist | ((vals + 512) << _VAL_SH) | _VALID, 0
            )
            out = word  # phase 2: +matmul
        if phase >= 3:
            for b in range(nbits - 1, -1, -1):
                step = 1 << b
                incoming = pltpu.roll(word, shift=step, axis=0)
                ok = m >= step
                arrive = (
                    ok & ((incoming & _VALID) != 0)
                    & ((incoming & step) != 0)
                )
                depart = ((word & _VALID) != 0) & ((word & step) != 0)
                word = jnp.where(
                    arrive, incoming - step, jnp.where(depart, 0, word)
                )
            out = word  # phase 3: +distribute
        if phase >= 4:
            out = jnp.where(
                (word & _VALID) != 0,
                ((word >> _VAL_SH) & 0x3FF) - PACK16_VALUE_BIAS,
                0,
            )
            have = (word & _VALID) >> 23
            for b in range(nbits):
                step = 1 << b
                src_out = pltpu.roll(out, shift=step, axis=0)
                src_have = pltpu.roll(have, shift=step, axis=0)
                take = (1 - have) * jnp.where(m >= step, src_have, 0)
                out = jnp.where(take != 0, src_out, out)
                have = have | take
            out = jnp.where(m < total, out, 0)  # phase 4: full
        o16 = out.astype(jnp.int16)
        for i in range(slabs):
            zz_ref[i, :, :] = o16[:, i * bw: (i + 1) * bw]

    def build(packed_i16, bw, phase):
        n, seg = packed_i16.shape
        bh = n // bw
        slabs = max(1, (1 << 18) // (bw * seg))
        while bh % slabs:
            slabs -= 1
        spec = pl.BlockSpec((slabs * bw, seg), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((slabs, seg, bw), lambda r: (r, 0, 0),
                                memory_space=pltpu.VMEM)
        lt_spec = pl.BlockSpec((seg, seg), lambda r: (0, 0),
                               memory_space=pltpu.VMEM)
        j = jnp.arange(seg)[:, None]
        s = jnp.arange(seg)[None, :]
        ltx = (s <= j).astype(jnp.bfloat16)
        call = pl.pallas_call(
            functools.partial(kernel, seg=seg, bw=bw, slabs=slabs,
                              phase=phase),
            grid=(bh // slabs,),
            in_specs=[spec, lt_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((bh, seg, bw), jnp.int16),
        )
        return lambda p: call(p, ltx)

    chain = 8
    rng = np.random.default_rng(0)
    results = {}
    # Production-like shapes: 2048sq frames, batch 16 (attribution only).
    for K, bw, frames, tag in ((64, 256, 16, "lum"), (32, 128, 16, "chr")):
        rows = frames * (2048 // 8) * (2048 // (8 if K == 64 else 16))
        vals = rng.integers(-511, 512, size=(rows, K)).astype(np.int16)
        rep = np.repeat(
            rng.integers(-511, 512, size=(rows, (K + 7) // 8)), 8, axis=1
        )[:, :K]
        vals[::2] = rep[::2].astype(np.int16)
        packed, _ = jax.jit(rle_encode_packed16)(jnp.asarray(vals))
        p16 = jax.lax.bitcast_convert_type(
            packed.astype(jnp.uint16), jnp.int16)
        p16 = jax.device_put(p16)
        mb = rows * K * 2 / 1e6
        r = {"rows": rows, "K": K, "mb_in": mb}
        for phase, name in enumerate(
                ["copyT", "+unpack", "+matmul", "+dist", "full"]):
            fn = build(p16, bw, phase)

            def chained(p, c0, fn=fn):
                def step(_, carry):
                    c, s = carry
                    out = fn(p ^ c.astype(p.dtype))
                    s = s + jnp.sum(out.astype(jnp.float32))
                    return (s.astype(jnp.int32) % 2).astype(jnp.int16), s
                _, s = jax.lax.fori_loop(0, chain, step,
                                         (c0, jnp.float32(0)))
                return s
            f = jax.jit(chained)
            float(f(p16, jnp.int16(0)))
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                float(f(p16, jnp.int16(0)))
                best = min(best, time.perf_counter() - t0)
            ms = best / chain * 1e3
            r[name + "_ms"] = ms
            print(f"{tag} {name:8s} {ms:8.2f} ms  "
                  f"({2 * mb / ms:7.1f} GB/s rd+wr)", flush=True)
        results[tag] = r
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
