"""Pallas attempt at the LZ4T device copy-resolve (VERDICT r4 item 4).

The device decode's pointer-doubling resolve runs at ~28 MB/s — bounded
by XLA's data-dependent gather (``take_along_axis``), the slowest
primitive on this stack.  This probe measures the primitives an in-VMEM
kernel could be built from and commits the resulting DESIGN BOUND for
the one viable gather-free formulation:

*Sort-join gather*: ``out[i] = lit[root[i]]`` can be computed without a
hardware gather by sorting 2P records ``(key=root[i], tag=1, dest=i)``
∪ ``(key=j, tag=0, val=lit[j])`` by ``(key, tag)``, fill-forwarding each
literal's value across the destinations that follow it (log₂(2P) roll
stages), and reverse-replaying the sort to land values at ``dest`` —
all machinery measured in ``profiles/profile_pallas_sort.py``.

Bound arithmetic from measured rates (committed into
``results/lz4t_decode_device.json::pallas_attempt_round4``):
the in-VMEM bitonic runs at 13.4 ps per stage-element
(47.4 ms / (33.5 M elem × 105 stages)); a 64 KiB block needs 2P = 131072
records × 153 stages (n = 2¹⁷) ≈ 269 µs for the sort alone, plus ~35%
for fill-forward + replay ≈ 360 µs per 65536 output bytes → ~180 MB/s —
still below the ~300 MB/s host C++ decoder.  The host path stays
production; the measurement (not an assumption) is the reason.
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

    rng = np.random.default_rng(0)
    out = {}

    # --- bare gather rate at the resolve's exact shape -------------------
    B, P = 512, 65536  # 32 MB of blocks, the decode-bench footprint
    root = rng.integers(0, P, size=(B, P)).astype(np.int32)
    lit = rng.integers(0, 256, size=(B, P)).astype(np.uint8)
    rj, lj = jnp.asarray(root), jnp.asarray(lit)

    def g_idx(r, c):
        # One doubling step: r <- r[r], xor-perturbed by the carry.
        return jnp.take_along_axis(r, r ^ c, axis=1)

    def chained(r, c0, steps):
        def body(_, carry):
            c, rr = carry
            rr = g_idx(rr, c)
            return (rr[0, 0] & 1, rr)

        _, rr = jax.lax.fori_loop(0, steps, body, (c0, r))
        return jnp.sum(rr.astype(jnp.float32))

    f = jax.jit(lambda r, c0: chained(r, c0, 4))
    float(f(rj, jnp.int32(0)))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(f(rj, jnp.int32(0)))
        best = min(best, time.perf_counter() - t0)
    gather_melems = B * P * 4 / best / 1e6
    out["xla_gather_melem_s"] = gather_melems
    print(f"XLA take_along_axis at (512, 65536) i32: "
          f"{gather_melems:.1f} M elem/s")

    # --- byte gather (the final lit pickup) ------------------------------
    def byte_gather(l, r, c):
        return jnp.sum(
            jnp.take_along_axis(l, r ^ c, axis=1).astype(jnp.float32)
        )

    fb = jax.jit(byte_gather)
    float(fb(lj, rj, jnp.int32(0)))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        float(fb(lj, rj, jnp.int32(0)))
        best = min(best, time.perf_counter() - t0)
    out["xla_byte_gather_melem_s"] = B * P / best / 1e6
    print(f"XLA u8 gather: {out['xla_byte_gather_melem_s']:.1f} M elem/s")

    # --- design bound for the in-VMEM sort-join gather -------------------
    # Rates from the committed sort probe (same chip, same session family).
    ps_per_stage_elem = 13.4e-12
    n_records = 2 * P
    n_stages = 17 * 18 // 2  # bitonic on 2^17
    sort_s = n_records * n_stages * ps_per_stage_elem
    total_s = sort_s * 1.35  # + fill-forward + reverse replay
    bound_mbs = P / total_s / 1e6
    out["sort_join_bound_mb_s"] = bound_mbs
    out["note"] = (
        "gather-free in-VMEM resolve (sort-join: sort 2P records by "
        "(root,tag), fill-forward literal values, reverse-replay) bounds "
        f"at ~{bound_mbs:.0f} MB/s from the measured 13.4 ps/stage-elem "
        "bitonic rate -- below the ~300 MB/s host C++ decoder, so the "
        "host path stays production by measurement, not assumption"
    )
    print(f"sort-join design bound: {bound_mbs:.0f} MB/s "
          f"(host C++ ~300 MB/s) -> negative, host stays production")

    path = "/root/repo/results/lz4t_decode_device.json"
    try:
        with open(path) as fjson:
            artifact = json.load(fjson)
    except (FileNotFoundError, json.JSONDecodeError):
        artifact = []
    wrapper = {"pallas_attempt_round4": out, "entries": artifact} if isinstance(
        artifact, list
    ) else {**artifact, "pallas_attempt_round4": out}
    with open(path, "w") as fjson:
        json.dump(wrapper, fjson, indent=1)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
