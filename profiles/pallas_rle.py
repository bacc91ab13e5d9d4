"""Pallas TPU kernel CANDIDATE for the batched RLE compaction — measured
SLOWER than the XLA sort formulation; not shipped in the package.

A/B on TPU v5e (chained dispatch, tunnel RTT amortized; see
``profile_pallas.py`` and the committed ``results/pallas_ab.json``):
18.5 ms vs 6.3 ms for 2M×64 int16 blocks — the XLA bitonic sort of
``ops/rle.py`` wins 3×, so it stays the production RLE.  This file is kept
(with ``pallas_mcu.py``) so the measurement is reproducible; it is
bit-identical to ``rle_encode_batched`` (tests/test_pallas_candidates.py
asserts this in interpret mode, and the on-chip A/B re-asserts it).

The idea it tested: ``ops/rle.py``'s sort is a 21-stage compare-exchange
network for 64-wide rows, while stable stream compaction with monotone
destinations needs only ``log2(L)`` stages of bit-fixing routing (a
concentrator network: element ``i`` moves left by ``s[i] = i - rank(i)``,
one power-of-two hop per set bit of ``s``, provably collision-free because
ranks are strictly increasing).  XLA can't express that network without
materializing every stage to HBM; Pallas runs it entirely in VMEM — but
Mosaic's cross-lane ``roll``s cost more per stage than XLA's sort network,
and the kernel ends up VPU-bound above the sort's total:

* rows are packed ``128 // L`` zigzag segments per 128-lane vector row, so
  the VPU runs at full lane occupancy (a bare (N, 64) layout wastes half
  the lanes);
* the segment-local rank comes from a ``log2(L)``-stage masked
  Hillis-Steele prefix sum over lane rolls;
* the routing network is ``log2(L)`` stages of ``pltpu.roll`` + selects on
  a single combined ``key*2^16 | (value+2^15)`` operand;
* per-run lengths are the adjacent difference of the compacted start
  positions, exactly as in the sort formulation.

Precondition: values must fit int16 (the combined operand carries them in
16 bits).  JPEG quantized coefficients are bounded by ±1024 even at the
most aggressive quality scaling (|DCT| ≤ 8·128, table entries ≥ 1), so the
pipeline always satisfies this; the wrapper falls back to the sort
formulation on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 512  # 128-lane rows per grid step; ~256 KiB per VMEM operand
LANES = 128


def _rle_kernel(x_ref, counts_ref, vals_ref, *, seg: int):
    """One (BLOCK_R, 128) tile: per-segment RLE compaction in VMEM."""
    nbits = seg.bit_length() - 1
    x = x_ref[:].astype(jnp.int32)
    shape = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    m = lane & (seg - 1)  # position within the zigzag segment

    prev = pltpu.roll(x, shift=1, axis=1)
    starts = (m == 0) | (x != prev)

    # Segment-local inclusive prefix sum of `starts` → rank of each run.
    c = starts.astype(jnp.int32)
    for b in range(nbits):
        step = 1 << b
        c = c + jnp.where(m >= step, pltpu.roll(c, shift=step, axis=1), 0)
    rank = c - 1

    # Left-shift distance per start; non-starts are holes (never move).
    s = jnp.where(starts, m - rank, 0)
    hole = seg * 65536
    comb = jnp.where(starts, m * 65536 + (x + 32768), hole)

    # Bit-fixing concentrator: one hop per set bit of s, LSB→MSB.
    # Collision-free: after bits 0..b the element sits at
    # rank + (s with low bits cleared), strictly increasing across
    # elements, so no two ever occupy one slot.
    # Mosaic's roll is circular and requires non-negative shifts: a left
    # shift by ``step`` is ``roll(LANES - step)``; wrapped lanes all have
    # ``m >= seg - step`` (LANES is a multiple of seg) so the ``ok`` mask
    # below already discards them.
    for b in range(nbits):
        step = 1 << b
        s_in = pltpu.roll(s, shift=LANES - step, axis=1)
        c_in = pltpu.roll(comb, shift=LANES - step, axis=1)
        ok = m < (seg - step)  # don't import from the next segment
        move_in = ok & (((s_in >> b) & 1) == 1)
        leave = ((s >> b) & 1) == 1
        comb = jnp.where(move_in, c_in, jnp.where(leave, hole, comb))
        s = jnp.where(move_in, s_in - step, jnp.where(leave, 0, s))

    key = comb >> 16  # compacted start position (seg for holes)
    val = (comb & 0xFFFF) - 32768
    # Run k ends where run k+1 begins (or at the segment end).  Left
    # shift by 1 = circular roll by LANES-1; the wrapped lane has
    # m == seg-1 and is overridden by the where.
    nxt = jnp.where(m == seg - 1, seg, pltpu.roll(key, shift=LANES - 1, axis=1))
    valid = key < seg
    counts_ref[:] = jnp.where(valid, nxt - key, 0).astype(jnp.int16)
    vals_ref[:] = jnp.where(valid, val, 0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("seg", "interpret"))
def _rle_call(x2: jnp.ndarray, *, seg: int, interpret: bool):
    rows = x2.shape[0]
    grid = (pl.cdiv(rows, BLOCK_R),)
    spec = pl.BlockSpec((BLOCK_R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_rle_kernel, seg=seg),
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int16),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int16),
        ),
        interpret=interpret,
    )(x2)


def rle_encode_pallas(
    values: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, L) int16-range blocks → ((N, 2L) int16 [count,value] pairs,
    (N,) int32 lengths) — drop-in for ``rle_encode_batched`` up to pair
    dtype (int16 here; the consumers cast or already want int16).

    L must be a power of two ≤ 128 (the JPEG pipeline uses 64 and 32).
    """
    n, length = values.shape
    if length & (length - 1) or length > LANES:
        raise ValueError(f"segment length {length} must be a power of two ≤ {LANES}")
    segs_per_row = LANES // length
    pad = (-n) % segs_per_row
    x = values.astype(jnp.int32)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, length), jnp.int32)])
    counts2, vals2 = _rle_call(
        x.reshape(-1, LANES), seg=length, interpret=interpret
    )
    counts = counts2.reshape(-1, length)[:n]
    vals = vals2.reshape(-1, length)[:n]
    pairs = jnp.stack([counts, vals], axis=2).reshape(n, 2 * length)
    lengths = 2 * jnp.sum(counts > 0, axis=1, dtype=jnp.int32)
    return pairs, lengths


