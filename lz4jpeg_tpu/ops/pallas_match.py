"""Fused in-VMEM LZ4 match finder: one Pallas kernel for sort → neighbor
candidates → un-sort.

The production sort-based matcher (``ops/lz4_fast.py``) spends 82-87% of
its time in two ``lax.sort`` dispatches (``results/lz4_matcher_roofline
.json``).  The round-4 probe (``profiles/profile_pallas_sort.py``,
committed numbers in ``results/lz4_matcher_roofline.json::pallas_probe``)
showed the bare sort is COMPUTE-bound on this chip — an in-VMEM copy of
the same bitonic network runs at ``lax.sort`` speed — so the win here is
algorithmic, not locality alone:

1. **One kernel, zero HBM between phases.**  Keys and the carried suffix
   words stream in once; match fields stream out once.
2. **Reverse-replay un-sort.**  The forward bitonic records its per-stage
   swap decisions (bit-packed into 4 int32 planes held in VMEM);
   transpositions are involutions, so replaying them in reverse order
   routes the per-slot match fields back to their original positions at
   ~1/4 the cost of the second full sort the XLA matcher pays (measured
   12.3 ms vs 46-66 ms at 2048×16K).
3. **Anchor stride.**  Matches may start only at every ``stride``-th
   position (LZ4's own "acceleration" idea): the sorted element count —
   and the O(log²) network — shrinks by the stride, while emission-time
   greedy extension recovers match length and the following sequence
   absorbs the ≤ stride-1 clipped head bytes.  Ratio cost is measured,
   not assumed (``results/lz4_device.json``).

Layout: each block's ``Pa = P/stride`` anchors live as a (Pa/128, 128)
int32 tile; every bitonic partner exchange (XOR distance d) is a
lane-axis (d < 128) or sublane-axis (d ≥ 128) ``pltpu.roll`` pair plus a
select, entirely in VMEM.  Keys pack ``(bucket16 << pos_bits) | anchor``
so they are unique, which makes ``new_key != key`` a valid swap mask and
ties (same bucket) sort by position — the exact semantics of the XLA
matcher's packed-key sort.

The kernel returns, per anchor in ORIGINAL order, the packed word
``(lcp << pos_bits) | dist_anchors`` for the chosen candidate (nearest of
the 1-back/2-back sorted neighbors, preferring the longer lcp), or 0.
``fast_match_blocks_pallas`` wraps it with the XLA pre/post passes (w32
packing, hashing, segment-capped greedy parse) and returns byte-level
``(is_match, emit_len, emit_dist)`` fields identical in meaning to
``ops/lz4_fast.py::fast_match_blocks``.

Reference hot loop this replaces: the per-position window scan of
``Algorithms/sequential/LZ4/LZ4.c:290-323``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_HASH_MULT = 2654435761


def _roll_lane(x, d):
    return pltpu.roll(x, shift=d, axis=2)


def _roll_sub(x, d):
    return pltpu.roll(x, shift=d, axis=1)


def _partner(x, d, rows, sel_col, sel_row):
    """Value at XOR-partner slot (linear distance d) for every element."""
    if d < LANES:
        return jnp.where(
            sel_col, _roll_lane(x, d), _roll_lane(x, LANES - d)
        )
    r = d // LANES
    return jnp.where(sel_row, _roll_sub(x, r), _roll_sub(x, rows - r))


def _linear_back(x, shift, col):
    """Value at linear slot ``i - shift`` (row-major (rows,128) tiles),
    for shift < 128: lane roll with a row-crossing fix."""
    lane = _roll_lane(x, shift)
    lane_prev_row = _roll_lane(_roll_sub(x, 1), shift)
    return jnp.where(col < shift, lane_prev_row, lane)


def _match_kernel(key_ref, *pay_and_out, n_pay: int, rows: int,
                  pos_bits: int):
    pay_refs = pay_and_out[:n_pay]
    out_ref = pay_and_out[n_pay]

    k = key_ref[...]
    pays = [p[...] for p in pay_refs]
    shape = k.shape  # (R, rows, 128)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    lin = row * LANES + col
    n = rows * LANES
    nbits = n.bit_length() - 1
    n_stages = nbits * (nbits + 1) // 2
    assert n_stages <= 128, "mask planes hold 128 stages"

    # ---- forward bitonic sort, swap masks folded into int32 bit planes --
    acc = [None, None, None, None]
    stage = 0
    for kk in range(1, nbits + 1):
        up = (lin & (1 << kk)) == 0
        for j in range(kk - 1, -1, -1):
            d = 1 << j
            sel_col = (col & d) != 0
            sel_row = (row & (d // LANES)) != 0 if d >= LANES else None
            k_part = _partner(k, d, rows, sel_col, sel_row)
            take_min = ((lin & d) == 0) == up
            k_new = jnp.where(
                take_min, jnp.minimum(k, k_part), jnp.maximum(k, k_part)
            )
            swap = k_new != k  # keys unique by construction
            pays = [
                jnp.where(swap, _partner(p, d, rows, sel_col, sel_row), p)
                for p in pays
            ]
            k = k_new
            w, b = divmod(stage, 32)
            bit = swap.astype(jnp.int32) << b
            acc[w] = bit if acc[w] is None else (acc[w] | bit)
            stage += 1

    # ---- neighbor candidates in sorted order ----------------------------
    bucket = k >> pos_bits
    pos = k & ((1 << pos_bits) - 1)
    valid_self = bucket < 0x10000  # invalid windows carry unique buckets

    def lcp_back(shift):
        """LCP (bytes, ≤ 4·n_pay) against the ``shift``-back neighbor."""
        lcp = jnp.zeros(shape, jnp.int32)
        alive = None
        for p in pays:
            prev = _linear_back(p, shift, col)
            x = p ^ prev
            eq = (
                (x & 0x000000FF == 0).astype(jnp.int32)
                + (x & 0x0000FFFF == 0).astype(jnp.int32)
                + (x & 0x00FFFFFF == 0).astype(jnp.int32)
                + (x == 0).astype(jnp.int32)
            )
            if alive is None:
                lcp = eq
                alive = eq == 4
            else:
                lcp = lcp + jnp.where(alive, eq, 0)
                alive = alive & (eq == 4)
        return lcp

    def candidate(shift):
        same = (
            (bucket == _linear_back(bucket, shift, col))
            & valid_self
            & (lin >= shift)
        )
        dist = pos - _linear_back(pos, shift, col)
        lcp = lcp_back(shift)
        ok = same & (lcp >= 4)
        return jnp.where(ok, lcp, 0), jnp.where(ok, dist, 0)

    len1, dist1 = candidate(1)
    len2, dist2 = candidate(2)
    better2 = len2 > len1  # ties keep the nearer (1-back) neighbor
    cand = jnp.where(
        better2,
        (len2 << pos_bits) | dist2,
        (len1 << pos_bits) | dist1,
    )
    cand = jnp.where((cand & ((1 << pos_bits) - 1)) > 0, cand, 0)

    # ---- reverse replay: route cand back to original anchor order -------
    stage = n_stages
    for kk in range(nbits, 0, -1):
        for j in range(0, kk):
            stage -= 1
            d = 1 << j
            w, b = divmod(stage, 32)
            swap = ((acc[w] >> b) & 1) != 0
            sel_col = (col & d) != 0
            sel_row = (row & (d // LANES)) != 0 if d >= LANES else None
            cand = jnp.where(
                swap, _partner(cand, d, rows, sel_col, sel_row), cand
            )
    out_ref[...] = cand


@functools.partial(
    jax.jit, static_argnames=("n_pay", "interpret", "batch_r")
)
def _match_call(key, pays, *, n_pay: int, interpret: bool, batch_r: int = 8):
    b, rows, lanes = key.shape
    assert lanes == LANES
    pos_bits = (rows * LANES - 1).bit_length()
    spec = pl.BlockSpec(
        (batch_r, rows, LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _match_kernel, n_pay=n_pay, rows=rows, pos_bits=pos_bits
        ),
        grid=(b // batch_r,),
        in_specs=[spec] * (1 + n_pay),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(key, *pays)


def fast_match_blocks_pallas(
    blocks: jnp.ndarray,
    lengths: jnp.ndarray,
    max_dist: int = 65535,
    stride: int = 1,
    lcp_words: int = 2,
    seg: int = 512,
    interpret: bool = False,
):
    """Drop-in for ``ops/lz4_fast.py::fast_match_blocks`` built on the
    fused kernel.  Returns byte-level ``(is_match, emit_len, emit_dist)``
    (B, P) int32 parse fields; matches start only on anchor positions
    (multiples of ``stride``) and are capped at ``4*lcp_words`` bytes —
    emission extends them greedily, exactly as with the XLA matcher.
    """
    b, p = blocks.shape
    pa = p // stride
    if pa % LANES:
        raise ValueError(f"anchors per block ({pa}) must be a multiple of 128")
    rows = pa // LANES
    if rows & (rows - 1):
        raise ValueError(f"anchor rows ({rows}) must be a power of two")
    x = blocks if blocks.dtype == jnp.uint8 else blocks.astype(jnp.uint8)
    aidx = jnp.arange(pa, dtype=jnp.int32)

    def byte_at(c):
        """(B, Pa) uint32: byte ``stride·a + c`` per anchor a (0 past
        the end) — a strided slice, so the pre-pass reads Pa-sized
        arrays instead of building full-grid packed words and slicing
        (the packed-then-sliced formulation cost ~40 ms of XLA pre at
        2048×16K)."""
        col = x[:, c::stride][:, :pa].astype(jnp.uint32)
        if col.shape[1] < pa:
            col = jnp.pad(col, ((0, 0), (0, pa - col.shape[1])))
        return col

    def pack_anchor(k):
        return (
            byte_at(4 * k)
            | (byte_at(4 * k + 1) << 8)
            | (byte_at(4 * k + 2) << 16)
            | (byte_at(4 * k + 3) << 24)
        )

    w32_a = pack_anchor(0)
    ok_a = aidx[None, :] * stride + 4 <= lengths[:, None]
    h_a = (
        (w32_a * jnp.uint32(_HASH_MULT)) >> jnp.uint32(16)
    ).astype(jnp.int32)
    h_a = jnp.where(ok_a, h_a, 0x10000 + aidx[None, :])
    pos_bits = (pa - 1).bit_length()
    key = (h_a << pos_bits) | aidx[None, :]
    pays = [
        jax.lax.bitcast_convert_type(w32_a, jnp.int32)
    ] + [
        jax.lax.bitcast_convert_type(pack_anchor(k), jnp.int32)
        for k in range(1, lcp_words)
    ]

    batch_r = max(d for d in range(1, min(8, b) + 1) if b % d == 0)
    packed = _match_call(
        key.reshape(b, rows, LANES),
        tuple(pay.reshape(b, rows, LANES) for pay in pays),
        n_pay=lcp_words,
        interpret=interpret,
        batch_r=batch_r,
    ).reshape(b, pa)

    match_len = packed >> pos_bits
    match_dist = (packed & ((1 << pos_bits) - 1)) * stride  # bytes
    match_dist = jnp.where(match_dist <= max_dist, match_dist, 0)
    match_len = jnp.where(match_dist > 0, match_len, 0)

    # Segment/block-end caps on the BYTE grid (anchors at byte a*stride).
    byte_pos = aidx[None, :] * stride
    seg_left = seg - (byte_pos & (seg - 1))
    limit = jnp.minimum(lengths[:, None] - byte_pos, seg_left)
    match_len = jnp.minimum(match_len, jnp.maximum(limit, 0))
    match_len = jnp.where(match_len >= 4, match_len, 0)
    match_dist = jnp.where(match_len > 0, match_dist, 0)

    # Greedy parse over the anchor grid: seg//stride lockstep steps per
    # segment, all segments at once (the XLA matcher's scan, shrunk by
    # the stride).  Skip pointers live on the anchor grid; a match of L
    # bytes frees the next anchor at ceil(L/stride) steps ahead.
    seg_a = seg // stride
    nseg = (b * pa) // seg_a
    seg_len = match_len.reshape(nseg, seg_a)
    seg_dist = match_dist.reshape(nseg, seg_a)

    def stepf(skip_until, inputs):
        k, ml, d = inputs
        is_m = (k >= skip_until) & (ml > 0)
        consumed = (ml + stride - 1) // stride
        new_skip = jnp.where(is_m, k + consumed, skip_until).astype(
            jnp.int32
        )
        return new_skip, (
            is_m,
            jnp.where(is_m, ml, 0),
            jnp.where(is_m, d, 0),
        )

    _, outs = jax.lax.scan(
        stepf,
        jnp.zeros(nseg, jnp.int32),
        (jnp.arange(seg_a, dtype=jnp.int32), seg_len.T, seg_dist.T),
    )
    is_m_a, len_a, dist_a = (o.T.reshape(b, pa) for o in outs)

    # Expand anchor-grid fields to the byte grid (zeros between anchors).
    def expand(v):
        if stride == 1:
            return v
        z = jnp.zeros((b, pa, stride - 1), v.dtype)
        return jnp.concatenate([v[:, :, None], z], axis=2).reshape(b, p)

    return (
        expand(is_m_a.astype(jnp.int32)),
        expand(len_a.astype(jnp.int32)),
        expand(dist_a.astype(jnp.int32)),
    )
