"""LZ4 device-matcher roofline: what do the two sorts actually cost?

The matcher (``ops/lz4_fast.py``) is built on two bitonic sorts per block
batch: a 5-operand (key + 4 LCP payload words) bucket sort and a 2-operand
un-sort.  This script measures, honestly fenced at the production shape
(P = 16 KiB rows):

* bare 1/2/3/5-operand ``lax.sort`` — the platform's sort ceiling per
  operand count;
* the full ``fast_match_blocks`` — how much of the stage is sort;
* ``lcp_words=2`` (3-operand sort) — the cheaper-carry variant whose
  ratio loss is recovered by extension-at-emission;
* ``block_log`` 15 (32 KiB rows, half the rows) — deeper network per row,
  fewer rows.

Feeds ``results/lz4_matcher_roofline.json``.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lz4jpeg_tpu.ops.lz4_fast import fast_match_blocks
    from lz4jpeg_tpu.utils.inputs import load_corpus

    chain = 4
    corpus = load_corpus()
    results = {"chain": chain, "entries": {}}

    def bench(fn, args, label, mb):
        def chained(a0, c0):
            def step(_, carry):
                c, s = carry
                outs = fn(a0 ^ c, *args[1:])
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                s = s + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return (s % 2).astype(jnp.int32), s

            _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
            return s

        f = jax.jit(chained)
        float(f(args[0], jnp.int32(0)))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(f(args[0], jnp.int32(0)))
            best = min(best, time.perf_counter() - t0)
        per = best / chain
        print(f"{label:46s} {per*1e3:9.2f} ms  {mb/per:7.1f} MB/s", flush=True)
        return per

    for block_log in (14, 15):
        p = 1 << block_log
        nblocks = (32 << 20) // p  # 32 MiB batch
        reps = -(-nblocks * p // len(corpus))
        data = (corpus * reps)[: nblocks * p]
        blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(nblocks, p))
        xi = blocks.astype(jnp.int32)
        lengths = jnp.full((nblocks,), p, jnp.int32)
        mb = nblocks * p / 1e6
        tag = f"p{p}"
        e = {}

        for n_ops in (1, 2, 3, 5):
            def sort_n(v, n_ops=n_ops):
                ops = (v,) + tuple(v ^ (k + 1) for k in range(n_ops - 1))
                return jax.lax.sort(ops, dimension=1, num_keys=1)

            e[f"sort{n_ops}_ms"] = 1e3 * bench(
                sort_n, (xi,), f"{tag} bare sort {n_ops}-op ({nblocks}x{p})",
                mb,
            )

        for lcp in (4, 2):
            e[f"match_lcp{lcp}_ms"] = 1e3 * bench(
                lambda b, l, lcp=lcp: fast_match_blocks(b, l, lcp_words=lcp),
                (blocks, lengths),
                f"{tag} fast_match_blocks lcp_words={lcp}", mb,
            )
        # sort share: bucket sort (1+lcp operands) + 2-op un-sort
        e["sort_share_lcp4"] = (e["sort5_ms"] + e["sort2_ms"]) / e["match_lcp4_ms"]
        e["sort_share_lcp2"] = (e["sort3_ms"] + e["sort2_ms"]) / e["match_lcp2_ms"]
        e["mb_per_iter"] = mb
        results["entries"][tag] = e
        print(
            f"{tag}: sort share lcp4 {e['sort_share_lcp4']*100:.0f}%, "
            f"lcp2 {e['sort_share_lcp2']*100:.0f}%",
            flush=True,
        )

    out = "/root/repo/results/lz4_matcher_roofline.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
