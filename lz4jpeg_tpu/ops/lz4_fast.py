"""TPU fast-mode LZ4 match finding: hash buckets + rolling-hash LCP.

The parity matcher (``ops/match.py``) materializes the full (P, P)
match-length table per block — exact, but O(P²) memory, fine only for the
reference's 300-byte blocks.  This module is the scalable fast-mode design
(SURVEY.md §7 step 9) for 16 KiB blocks:

1. **Candidates by hash bucket.**  ``w32[i]`` packs the 4-byte window at
   ``i``; positions argsort by ``(hash(w32), i)``, so each position's
   candidate is simply its sorted predecessor when the hash matches — the
   batched equivalent of LZ4's "most recent position with this hash" table,
   with *every* position inserted.  A direct ``w32`` compare removes hash
   false positives exactly.
2. **Match lengths by binary lifting** over dual 32-bit polynomial rolling
   hashes: ``lcp(i, j)`` needs ⌈log₂ P⌉ vectorized substring-hash compares
   instead of a byte walk.  Two independent hash moduli put a spurious
   extension at ~2⁻⁶⁴ per compare pair (and any corruption would be caught
   by the round-trip gates); lengths are capped at the block's true length.
3. **Greedy parse** as the same vmapped ``lax.scan`` the parity path uses —
   P lockstep steps shared by every block in the batch, the TPU analogue of
   GPU LZ4's block-per-thread parse.

Output feeds the LZ4T frame (``formats/fast_frame.py``) with
``block_log=14``; the stream decodes with the existing native/Python
decoders.  Match *choices* differ from the host encoder's (both are valid
LZ4T streams; compression ratio is what varies).

Performance note: the LCP stage leans on data-dependent gathers
(``take_along_axis``), which the current TPU toolchain compiles and
executes poorly — on such stacks the native C++ engine is the faster
fast-mode choice, and this op is the algorithmic reference for healthier
backends (it is exact and fully tested either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TPU_BLOCK_LOG = 14  # 16 KiB blocks: ratio within ~4% of the host
                    # 64 KiB encoder at lockstep-scan cost
_HASH_MULT = 2654435761
# polynomial bases (odd → invertible mod 2^32); np scalars so importing
# this module cannot initialize a JAX backend (jax.distributed needs that)
_A1 = np.uint32(1000003)
_A2 = np.uint32(2654435761)


def pad_blocks_fast(data: bytes, block_log: int = TPU_BLOCK_LOG):
    """Split into (B, 2**block_log) uint8-valued int32 blocks + lengths."""
    p = 1 << block_log
    n = len(data)
    num = max(1, -(-n // p))
    arr = np.frombuffer(data, np.uint8)
    padded = np.zeros((num, p), np.int32)
    lengths = np.zeros(num, np.int32)
    for i in range(num):
        chunk = arr[i * p : (i + 1) * p]
        padded[i, : len(chunk)] = chunk
        lengths[i] = len(chunk)
    return padded, lengths


def _prefix_hashes(x: jnp.ndarray, a: jnp.uint32) -> jnp.ndarray:
    """H[k] = hash of x[:k] (polynomial, uint32 wraparound), H[0] = 0.

    Associative combine on (hash, a**len) pairs → log-depth scan.
    """
    xu = x.astype(jnp.uint32)
    b, p = x.shape
    elems = (xu, jnp.full((b, p), a, jnp.uint32))

    def combine(left, right):
        lh, lp = left
        rh, rp = right
        return lh * rp + rh, lp * rp

    h, pw = jax.lax.associative_scan(combine, elems, axis=1)
    zero = jnp.zeros((b, 1), jnp.uint32)
    return jnp.concatenate([zero, h], axis=1)  # (B, P+1)


def _pow_table(a: jnp.uint32, p: int) -> jnp.ndarray:
    pows = np.empty(p + 1, np.uint32)
    acc = 1
    a_int = int(a)
    for i in range(p + 1):
        pows[i] = acc
        acc = (acc * a_int) & 0xFFFFFFFF
    return jnp.asarray(pows)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def fast_match_blocks(
    blocks: jnp.ndarray, lengths: jnp.ndarray, max_dist: int = 65535
):
    """(B, P) int32 blocks + (B,) lengths → greedy parse fields.

    Returns ``(is_match, emit_len, emit_dist)`` (B, P) int32, untruncated
    lengths, ready for LZ4T sequence emission.
    """
    b, p = blocks.shape
    idx = jnp.arange(p, dtype=jnp.int32)
    x = blocks

    # 4-byte windows; positions within 3 of the block end can't start one.
    def sh(k):
        return jnp.pad(x[:, k:], ((0, 0), (0, k)))

    w32 = (
        sh(0).astype(jnp.uint32)
        | (sh(1).astype(jnp.uint32) << 8)
        | (sh(2).astype(jnp.uint32) << 16)
        | (sh(3).astype(jnp.uint32) << 24)
    )
    window_ok = idx[None, :] + 4 <= lengths[:, None]
    h = (w32 * jnp.uint32(_HASH_MULT)) >> jnp.uint32(16)  # 16-bit buckets
    # Invalid windows get a per-position unique bucket so they never chain.
    h = jnp.where(window_ok, h.astype(jnp.int32), 0x10000 + idx[None, :])

    # Sorted by (bucket, position): predecessor in the same bucket is the
    # most recent previous occurrence candidate.
    order = jnp.argsort(h * (p + 1) + idx[None, :], axis=1)
    h_sorted = jnp.take_along_axis(h, order, axis=1)
    prev_pos = jnp.concatenate(
        [jnp.full((b, 1), -1, order.dtype), order[:, :-1]], axis=1
    )
    same = jnp.concatenate(
        [jnp.zeros((b, 1), bool), h_sorted[:, 1:] == h_sorted[:, :-1]], axis=1
    )
    cand_sorted = jnp.where(same, prev_pos, -1)
    # Unsort: position order[k] holds cand_sorted[k] → gather by argsort.
    cand = jnp.take_along_axis(
        cand_sorted, jnp.argsort(order, axis=1), axis=1
    )

    # Exact 4-byte verification (kills hash false positives) + distance cap.
    cand_w32 = jnp.take_along_axis(w32, jnp.maximum(cand, 0), axis=1)
    dist = idx[None, :] - cand
    match4 = (
        (cand >= 0) & (cand_w32 == w32) & window_ok & (dist <= max_dist)
    )

    # LCP by binary lifting over dual rolling hashes, capped at block end.
    h1 = _prefix_hashes(x, _A1)
    h2 = _prefix_hashes(x, _A2)
    pw1 = _pow_table(_A1, p)
    pw2 = _pow_table(_A2, p)

    def substr_eq(i, j, length):
        """Vectorized: x[i:i+length] == x[j:j+length] via both hashes.

        Ends are clamped to P; callers mask out-of-range trials."""
        length = jnp.minimum(length, p)  # keep pw lookups in range
        ie = jnp.minimum(i + length, p)
        je = jnp.minimum(j + length, p)

        def one(hh, pw):
            hi = jnp.take_along_axis(hh, ie, axis=1) - (
                jnp.take_along_axis(hh, i, axis=1) * pw[length]
            )
            hj = jnp.take_along_axis(hh, je, axis=1) - (
                jnp.take_along_axis(hh, j, axis=1) * pw[length]
            )
            return hi == hj

        return one(h1, pw1) & one(h2, pw2)

    i_pos = jnp.broadcast_to(idx[None, :], (b, p))
    j_pos = jnp.maximum(cand, 0)
    max_len = jnp.maximum(lengths[:, None] - i_pos, 0)  # cap at true end
    # Binary search the largest L with equal substrings, L in [0, max_len].
    lcp = jnp.zeros((b, p), jnp.int32)
    step = 1 << (p - 1).bit_length()
    while step:
        trial = lcp + step
        ok = (trial <= max_len) & substr_eq(i_pos, j_pos, trial)
        lcp = jnp.where(ok, trial, lcp)
        step >>= 1
    best_len = jnp.where(match4 & (lcp >= 4), lcp, 0)
    best_dist = jnp.where(best_len > 0, dist, 0)

    # Greedy parse: same lockstep scan as the parity path, untruncated.
    def parse_one(lens, dists):
        def stepf(skip_until, inputs):
            k, ml, d = inputs
            is_m = (k >= skip_until) & (ml > 0)
            new_skip = jnp.where(is_m, k + ml, skip_until).astype(jnp.int32)
            return new_skip, (
                is_m,
                jnp.where(is_m, ml, 0),
                jnp.where(is_m, d, 0),
            )

        init = (lens[0] * 0).astype(jnp.int32)
        _, outs = jax.lax.scan(
            stepf, init, (idx, lens, dists)
        )
        return outs

    is_match, emit_len, emit_dist = jax.vmap(parse_one)(
        best_len.astype(jnp.int32), best_dist.astype(jnp.int32)
    )
    return is_match, emit_len, emit_dist
