"""On-chip A/B: fused Pallas matcher vs the XLA sort matcher.

Measures (a) fenced dense-parse throughput at the production footprint
(2048 × 16 KiB = 33.55 MB per iteration, the ``lz4_matcher_roofline``
shape), (b) compressed ratio on Metamorphosis through the full
emit path, for each matcher config.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lz4jpeg_tpu.formats.fast_frame import assemble_frame
    from lz4jpeg_tpu.native import native_backend
    from lz4jpeg_tpu.ops.lz4_fast import (
        TPU_BLOCK_LOG,
        fast_match_blocks,
        pad_blocks_fast,
    )
    from lz4jpeg_tpu.ops.pallas_match import fast_match_blocks_pallas

    with open(
        "/root/reference/Output-Input/input/Metamorphosis.txt", "rb"
    ) as f:
        corpus = f.read()

    # --- ratio on the real corpus (host round trip per config) ----------
    padded, lengths = pad_blocks_fast(corpus)
    pj, lj = jnp.asarray(padded), jnp.asarray(lengths)
    nb = native_backend()

    def ratio_of(fields):
        is_match, emit_len, emit_dist = (np.asarray(x) for x in fields)
        payloads = nb.emit_blocks(
            padded.astype(np.uint8), lengths, is_match, emit_len, emit_dist
        )
        raws = [
            padded[b, : int(lengths[b])].astype(np.uint8).tobytes()
            for b in range(padded.shape[0])
        ]
        frame = assemble_frame(payloads, raws, len(corpus), TPU_BLOCK_LOG)
        from lz4jpeg_tpu.formats.fast_frame import decode_fast

        assert decode_fast(frame) == corpus
        return len(frame)

    configs = [
        ("xla_lcp4", lambda b, l: fast_match_blocks(b, l, lcp_words=4)),
        ("xla_lcp2", lambda b, l: fast_match_blocks(b, l, lcp_words=2)),
        ("pallas_s1_w2",
         lambda b, l: fast_match_blocks_pallas(b, l, stride=1, lcp_words=2)),
        ("pallas_s2_w2",
         lambda b, l: fast_match_blocks_pallas(b, l, stride=2, lcp_words=2)),
        ("pallas_s2_w1",
         lambda b, l: fast_match_blocks_pallas(b, l, stride=2, lcp_words=1)),
        ("pallas_s4_w2",
         lambda b, l: fast_match_blocks_pallas(b, l, stride=4, lcp_words=2)),
    ]
    print(f"corpus {len(corpus)} B; host C++ encoder: "
          f"{len(nb.encode_fast(corpus))} B payload-only baseline")
    for name, fn in configs:
        f = jax.jit(fn)
        size = ratio_of(jax.device_get(f(pj, lj)))
        print(f"{name:14s} ratio {size}/{len(corpus)} = "
              f"{size/len(corpus):.4f}")

    # --- fenced throughput at the roofline footprint ---------------------
    rng = np.random.default_rng(0)
    B = 2048
    big = (corpus * ((B * 16384) // len(corpus) + 1))[: B * 16384]
    bigp, bigl = pad_blocks_fast(big)
    bx, bl = jnp.asarray(bigp.astype(np.uint8)), jnp.asarray(bigl)
    mb = B * 16384 / 1e6

    for name, fn in configs:
        def chained(x, l):
            s = jnp.float32(0)
            outs = fn(x.astype(jnp.int32), l)
            for o in outs:
                s = s + jnp.sum(o.astype(jnp.float32))
            return s

        g = jax.jit(chained)
        try:
            float(g(bx, bl))
        except Exception as e:
            print(f"{name:14s} FAILED: {str(e)[:120]}")
            continue
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(g(bx, bl))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} {best*1e3:8.1f} ms  {mb/best:7.1f} MB/s dense")


if __name__ == "__main__":
    main()
