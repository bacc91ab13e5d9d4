"""Pallas TPU kernels for the batched PAIR-layout RLE compaction.

**Superseded in round 5**: the production interchange moved to the
sparse-delta layout (``ops/rle.py::rle_encode_sparse16``), which needs
no compaction on encode and folds its decode into the inverse einsum —
these butterflies no longer run in the fast path.  They remain the
tested packed16 kernels (bit-identical to the XLA spec, interpret-mode
and on-chip tests) and the committed record of the round-3/4
formulation work the sparse16 design built on (the rank-prefix and
delta-prefix MXU matmuls reappear there as the suffix-basis fold).
Original round-3/4 docstring follows.

History (the committed measurement trail): the RLE compaction is the JPEG
forward chain's limiting stage.  The production XLA formulation is one
``lax.sort`` (``ops/rle.py``) — but an honest bare-sort measurement
(``profiles/profile_sort_ceiling.py``) shows the sort network itself runs
at only ~75 GB/s effective I/O at the production (2M, 64) shape: its ~21
compare-exchange stages round-trip HBM.  A round-1 Pallas candidate
(``profiles/pallas_rle.py``) was retired against a 6.3 ms sort baseline
that the round-2 fence audit later proved DCE-hollow (the honest number is
21.4 ms, ``results/formulation_ab.json::fence_dce_and_rle_round2b``) — so
the candidate was re-opened in round 3, rebuilt to emit the packed-u16
production layout directly, and now ships.

The algorithm (Hilewitz & Lee's PEX concentrator, 6 stages instead of 21):
run starts already occur in ascending position order, so compacting them
to the front is a monotone concentration, routable collision-free on an
inverse butterfly in ``log2(L)`` stages — LSB of the per-element shift
distance first.  XLA materializes every stage to HBM (measured 1.5× slower
than the sort, ``formulation_ab.json::log_shift_compaction``); this kernel
runs all stages in VMEM with ONE packed int32 word per element, so HBM
traffic is one read of the coefficients + one write of the packed pairs —
the stage's algorithmic minimum.

Word layout (bits):  0..5  remaining shift distance (< 64)
                     6..12 original position within segment (< 128)
                    13..22 value + 511 (10 bits; |value| ≤ 511 — the same
                           precondition as the pack16 layout itself)
                    23     valid (element is a run start)

Rows are packed ``128 // L`` zigzag segments per 128-lane vector row so
the VPU runs at full lane occupancy (L = 64 for 8×8 luma MCUs, 32 for the
8×4 chroma blocks; reference stage semantics in
``Algorithms/sequential/JPEG/JPEG.c:767-809``).

Outputs are bit-identical to ``ops/rle.py::rle_encode_packed16``
(tests/test_pallas_rle.py asserts this in interpret mode and on devices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4jpeg_tpu.ops.rle import PACK16_VALUE_BIAS

BLOCK_R = 512  # 128-lane rows per grid step (~256 KiB VMEM per operand)
LANES = 128

_POS_SH = 6
_VAL_SH = 13
_VALID = 1 << 23

# The packed word's shift-distance field is 6 bits (< 64) and the pack16
# count field is likewise 6 bits, so a 128-lane segment would silently
# corrupt output (distance bit 6 collides with the position field).  Only
# 64 (luma) and 32 (chroma) are used in-repo; reject anything larger.
MAX_SEG = 64


def _rle_pack16_kernel(x_ref, lt_ref, packed_ref, runs_ref, *, seg: int):
    """One (BLOCK_R, 128) tile → packed u16 pairs + per-segment run counts.

    Everything happens on one int32 word per element; the only cross-lane
    primitives are ``pltpu.roll`` (Mosaic's circular lane shift — wrapped
    lanes are always masked off by the segment-boundary conditions) and
    one MXU matmul against the block-lower-triangular constant ``lt_ref``
    that computes the segment-local prefix sum of run starts (exact: 0/1
    operands, sums ≤ 128, bf16 multiplies with f32 accumulation).  The
    matmul replaces a log2(seg)-stage Hillis-Steele roll chain — rolls are
    what bound this kernel on the VPU.
    """
    nbits = seg.bit_length() - 1
    x = x_ref[:].astype(jnp.int32)
    shape = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    m = lane & (seg - 1)  # position within the zigzag segment

    prev = pltpu.roll(x, shift=1, axis=1)
    starts = (m == 0) | (x != prev)

    # Segment-local inclusive prefix sum of starts → run rank per element,
    # as one 128×128 MXU contraction instead of log2(seg) lane rolls.
    c = jnp.dot(
        starts.astype(jnp.bfloat16),
        lt_ref[:],
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    rank = c - 1

    # One combined word: remaining shift distance (m - rank), original
    # position, biased value, valid flag.  Non-starts are holes.
    word = jnp.where(
        starts,
        (m - rank) | (m << _POS_SH) | ((x + 511) << _VAL_SH) | _VALID,
        0,
    )

    # Inverse-butterfly concentration, LSB of the distance first: stage b
    # moves elements left by 2^b when bit b of their remaining distance is
    # set.  Collision-free because ranks (and therefore post-stage
    # positions) are strictly increasing across valid elements.
    for b in range(nbits):
        step = 1 << b
        incoming = pltpu.roll(word, shift=LANES - step, axis=1)
        ok = m < (seg - step)  # no import across the segment boundary
        arrive = ok & ((incoming & _VALID) != 0) & ((incoming & step) != 0)
        depart = ((word & _VALID) != 0) & ((word & step) != 0)
        word = jnp.where(
            arrive, incoming - step, jnp.where(depart, 0, word)
        )

    valid = (word & _VALID) != 0
    key = jnp.where(valid, (word >> _POS_SH) & (LANES - 1), seg)
    val = ((word >> _VAL_SH) & 0x3FF) - 511
    # Run k's count is the gap to run k+1's start (segment end for the
    # last run); the wrapped lane at m == seg-1 is overridden.
    nxt = jnp.where(
        m == seg - 1, seg, pltpu.roll(key, shift=LANES - 1, axis=1)
    )
    counts = jnp.where(valid, nxt - key, 0)
    packed = (jnp.maximum(counts - 1, 0) << 10) | (
        val + PACK16_VALUE_BIAS
    )
    packed_ref[:] = jnp.where(counts > 0, packed, 0).astype(jnp.int16)

    # Per-segment run totals (for the lengths side channel): the rank at
    # each segment's last lane + 1, summed per segment id.
    segs_per_row = LANES // seg
    seg_runs = []
    for s_i in range(segs_per_row):
        in_seg = (lane >> nbits) == s_i
        seg_runs.append(
            jnp.sum(
                jnp.where(in_seg, starts.astype(jnp.int32), 0),
                axis=1,
                keepdims=True,
            )
        )
    runs_ref[:] = jnp.concatenate(seg_runs, axis=1)


@functools.partial(jax.jit, static_argnames=("seg", "interpret"))
def _rle_pack16_call(x2: jnp.ndarray, *, seg: int, interpret: bool):
    rows = x2.shape[0]
    segs_per_row = LANES // seg
    grid = (pl.cdiv(rows, BLOCK_R),)
    spec = pl.BlockSpec(
        (BLOCK_R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    runs_spec = pl.BlockSpec(
        (BLOCK_R, segs_per_row), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # Block-lower-triangular inclusive prefix matrix: LT[j, i] = 1 when
    # j ≤ i within the same segment (replicated across grid steps).
    j_ids = jnp.arange(LANES)[:, None]
    i_ids = jnp.arange(LANES)[None, :]
    lt = (
        (j_ids <= i_ids) & ((j_ids // seg) == (i_ids // seg))
    ).astype(jnp.bfloat16)
    lt_spec = pl.BlockSpec(
        (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_rle_pack16_kernel, seg=seg),
        grid=grid,
        in_specs=[spec, lt_spec],
        out_specs=(spec, runs_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int16),
            jax.ShapeDtypeStruct((rows, segs_per_row), jnp.int32),
        ),
        interpret=interpret,
    )(x2, lt)


def _rle_pack16_kt_kernel(x_ref, lt_ref, packed_ref, runs_ref, *, seg: int):
    """Transposed-layout tile: (R_BLK, K, C) coefficients — K positions
    along SUBLANES, C blocks along lanes, R_BLK block-rows per grid step
    so each step moves real work — → (R_BLK·C, K) packed pairs in
    standard block-row-major order (the per-row full 2D transpose happens
    in VMEM, one of the few relayouts Mosaic lowers).

    Consumes the layout the plane-view fused einsum emits for free
    (``ops/fused.py::fused_forward_plane_jnp``), which is what lets the
    forward chain skip the 8×8 tile relayout entirely.  The sublane-axis
    butterfly measured 11.5 ms (K=64) / 8.8 ms (K=32) per 2M blocks vs
    14.8 / 11.6 for the lane-axis kernel / the XLA sort
    (profiles/profile_pallas_rle_pack16.py round-3 addendum).
    """
    nbits = seg.bit_length() - 1
    x = x_ref[:].astype(jnp.int32)  # (R_BLK, K, C)
    m = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    prev = pltpu.roll(x, shift=1, axis=1)
    starts = (m == 0) | (x != prev)
    # Rank prefix-sum as a sublane-contracting batched MXU matmul (exact:
    # 0/1 operands, sums ≤ seg, bf16 multiplies with f32 accumulation).
    c = jax.lax.dot_general(
        starts.astype(jnp.bfloat16),
        lt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (R_BLK, C, K): c[r, b, s] = Σ_j≤s starts[r, j, b]
    rank = jnp.transpose(c, (0, 2, 1)) - 1
    word = jnp.where(
        starts,
        (m - rank) | (m << _POS_SH) | ((x + 511) << _VAL_SH) | _VALID,
        0,
    )
    for b in range(nbits):
        step = 1 << b
        incoming = pltpu.roll(word, shift=seg - step, axis=1)
        ok = m < (seg - step)
        arrive = ok & ((incoming & _VALID) != 0) & ((incoming & step) != 0)
        depart = ((word & _VALID) != 0) & ((word & step) != 0)
        word = jnp.where(arrive, incoming - step, jnp.where(depart, 0, word))
    valid = (word & _VALID) != 0
    key = jnp.where(valid, (word >> _POS_SH) & (LANES - 1), seg)
    val = ((word >> _VAL_SH) & 0x3FF) - 511
    nxt = jnp.where(
        m == seg - 1, seg, pltpu.roll(key, shift=seg - 1, axis=1)
    )
    counts = jnp.where(valid, nxt - key, 0)
    packed = (jnp.maximum(counts - 1, 0) << 10) | (val + PACK16_VALUE_BIAS)
    packed = jnp.where(counts > 0, packed, 0).astype(jnp.int16)
    r_blk, _, cols = packed.shape
    packed_ref[:] = jnp.transpose(packed, (0, 2, 1)).reshape(
        r_blk * cols, seg
    )
    # Runs stay (R_BLK, C) — flattening lanes into sublanes here is an
    # unsupported Mosaic shape cast; the wrapper flattens outside (free).
    runs_ref[:] = jnp.sum(starts.astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rle_pack16_kt_call(zz_kt: jnp.ndarray, *, interpret: bool):
    rows, seg, cols = zz_kt.shape
    # Block-rows per grid step: target ≥256K coefficients so grid-step
    # overhead amortizes (the 1-row variant measured 13% slower end to
    # end); VMEM stays ≤ ~2 MB per operand.  The runs output block is
    # (r_blk, cols), so Mosaic needs r_blk % 8 == 0 — or one whole-array
    # step (block == array dims is always legal) when ``rows`` has no
    # suitable divisor (ragged block-row counts reach here via the
    # pad-widened plane path).
    r_max = max(1, min(rows, (1 << 18) // (seg * cols)))
    r_blk = next(
        (d for d in range(r_max, 0, -1) if rows % d == 0 and d % 8 == 0),
        rows,
    )
    in_spec = pl.BlockSpec(
        (r_blk, seg, cols), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
    )
    lt_spec = pl.BlockSpec(
        (seg, seg), lambda r: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (r_blk * cols, seg), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    runs_spec = pl.BlockSpec(
        (r_blk, cols), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    j = jnp.arange(seg)[:, None]
    s = jnp.arange(seg)[None, :]
    lt = (s <= j).astype(jnp.bfloat16)  # lt[a, j] = j ≤ a (contract j)
    return pl.pallas_call(
        functools.partial(_rle_pack16_kt_kernel, seg=seg),
        grid=(rows // r_blk,),
        in_specs=[in_spec, lt_spec],
        out_specs=(out_spec, runs_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows * cols, seg), jnp.int16),
            jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        ),
        interpret=interpret,
    )(zz_kt, lt)


def rle_encode_packed16_pallas_kt(
    zz_kt: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transposed-input twin of ``rle_encode_packed16_pallas``:
    (R, K, C) coefficient blocks — K block positions along the middle
    axis, C blocks per row (the plane-view einsum's ``akb`` layout) —
    → ((R·C, K) packed uint16, (R·C,) int32 symbol lengths) in standard
    block-row-major order, bit-identical to ``rle_encode_packed16`` of
    the relayouted input.

    Requires ``C % 128 == 0`` (the lane tile) and K a power of two ≤ 128;
    callers fall back to the row-major kernel otherwise.
    """
    rows, seg, cols = zz_kt.shape
    if seg & (seg - 1) or seg > MAX_SEG:
        raise ValueError(
            f"segment length {seg} must be a power of two ≤ {MAX_SEG} "
            "(6-bit shift-distance/count fields in the packed word)"
        )
    if cols % LANES:
        raise ValueError(f"block columns {cols} must be a multiple of {LANES}")
    # int16 stays int16 into the kernel (halves its HBM read; the in-kernel
    # astype widens in VMEM); other dtypes are staged as int32.
    if zz_kt.dtype != jnp.int16:
        zz_kt = zz_kt.astype(jnp.int32)
    packed, runs = _rle_pack16_kt_call(zz_kt, interpret=interpret)
    return packed.astype(jnp.uint16), 2 * runs.reshape(-1)


def rle_encode_packed16_pallas(
    values: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``ops/rle.py::rle_encode_packed16`` (bit-identical):
    (N, L) int blocks → ((N, L) packed uint16, (N,) int32 symbol lengths).

    L must be a power of two ≤ 128; values must satisfy |v| ≤ 511 (the
    pack16 precondition — JPEG quantized coefficients always do for the
    quality range the container accepts; callers fall back to the sort
    formulation otherwise, exactly as with the XLA pack16 path).
    """
    n, length = values.shape
    if length & (length - 1) or length > MAX_SEG:
        raise ValueError(
            f"segment length {length} must be a power of two ≤ {MAX_SEG} "
            "(6-bit shift-distance/count fields in the packed word)"
        )
    segs_per_row = LANES // length
    pad = (-n) % segs_per_row
    x = values.astype(jnp.int32)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, length), jnp.int32)])
    packed2, runs2 = _rle_pack16_call(
        x.reshape(-1, LANES), seg=length, interpret=interpret
    )
    packed = packed2.astype(jnp.uint16).reshape(-1, length)[:n]
    lengths = 2 * runs2.reshape(-1)[: n]
    return packed, lengths


# ---------------------------------------------------------------------------
# Decode side: expansion butterfly (the inverse of the concentration above)
# ---------------------------------------------------------------------------

_DELTA_SH = 7  # biased value-delta field in the distribute word: bits 7..17
# The fill matmul's exactness couples the delta bias (1024) to the 5-bit
# half split in ``_expand_kt``: un-biasing folds ``-(have << 5)`` into the
# hi half, which is only correct while bias == 32 << 5.  Changing either
# constant alone silently corrupts decode output.
_DELTA_BIAS = 1024
assert _DELTA_BIAS == 32 << 5


def _expand_kt(xt: jnp.ndarray, ltx: jnp.ndarray, seg: int) -> jnp.ndarray:
    """Core expansion on a (K, rows) transposed tile → (K, rows) int32.

    The decode mirror of the encode butterfly: front-compacted
    [count, value] pairs DISTRIBUTE to their run-start positions on the
    inverse butterfly (MSB of the shift distance first — the reverse
    schedule of the encode's concentration, collision-free by the mirror
    of the same monotonicity argument).  Start positions are an exclusive
    prefix sum of counts — one lower-triangular MXU matmul.

    Round 4 replaced the log2(K)-stage fill-forward roll scan with ONE
    more MXU matmul: the butterfly distributes each run's value DELTA
    (value minus previous run's value — adjacent slots, since pack16
    fronts-compacts its pairs) instead of the value itself, and the
    filled output is then simply the inclusive prefix sum of the placed
    deltas: out[m] = Σ_{starts[j] ≤ m} Δ[j].  Rolls are what bound the
    kernel on the VPU — 6 of 12 stages deleted, for a fence-corrected
    marginal of 2.60 vs 2.82 ms luma / 1.53 vs 1.59 ms chroma at 1M
    blocks (profiles/profile_rle_decode_wide.py; the dots are not free,
    so the win is smaller than the deleted stages' 0.6 ms).  The biased
    delta (11 bits) rides the distribute word where the 10-bit value
    did, and exactness is kept by splitting the prefix operand into
    5-bit halves (bf16 mantissas hold ≤ 256 exactly; column sums stay
    f32-exact).

    Validity needs no lengths side channel: valid packed words are
    nonzero by construction (value+512 ∈ [1, 1023]) and padding slots
    are exactly zero.  Replaces the disjoint-interval membership einsum
    (``ops/rle.py::rle_decode_packed16``), whose (N, K, K) contraction
    does K× the algorithmic work on the MXU.
    """
    nbits = seg.bit_length() - 1
    m = jax.lax.broadcasted_iota(jnp.int32, xt.shape, dimension=0)
    valid = xt != 0
    counts = jnp.where(valid, (xt >> 10) + 1, 0)
    vals = jnp.where(valid, (xt & 0x3FF) - PACK16_VALUE_BIAS, 0)
    incl = jnp.dot(
        ltx,
        counts.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # incl[s, b] = Σ_{j≤s} counts[j, b]
    starts = incl - counts
    total = jnp.max(incl, axis=0, keepdims=True)  # (1, rows)
    dist = jnp.where(valid, starts - m, 0)  # ≥ 0: slots only move down
    # Δ to the previous run's value (slot m-1: pairs are front-compacted);
    # the first run's Δ is its value.  Biased to [2, 2046] — 11 bits.
    prev = pltpu.roll(vals, shift=1, axis=0)
    delta = vals - jnp.where(m == 0, 0, prev)
    word = jnp.where(
        valid, dist | ((delta + _DELTA_BIAS) << _DELTA_SH) | _VALID, 0
    )
    # Distribute: MSB-first moves down by 2^b when bit b of the remaining
    # distance is set (dist < K always, so nbits stages suffice).
    for b in range(nbits - 1, -1, -1):
        step = 1 << b
        incoming = pltpu.roll(word, shift=step, axis=0)
        ok = m >= step  # nothing wraps in from the bottom
        arrive = ok & ((incoming & _VALID) != 0) & ((incoming & step) != 0)
        depart = ((word & _VALID) != 0) & ((word & step) != 0)
        word = jnp.where(arrive, incoming - step, jnp.where(depart, 0, word))
    placed = jnp.where((word & _VALID) != 0, (word >> _DELTA_SH) & 0x7FF, 0)
    have = (word & _VALID) >> 23
    # Fill = inclusive prefix sum of the placed deltas, as two MXU dots on
    # 5-bit halves (exact in bf16); the +1024 bias un-biases for free by
    # folding -32·valid into the hi half: hi·32 + lo = placed - 1024 = Δ.
    hi = ((placed >> 5) - (have << 5)).astype(jnp.bfloat16)
    lo = (placed & 31).astype(jnp.bfloat16)
    out = (
        jnp.dot(ltx, hi, preferred_element_type=jnp.float32).astype(
            jnp.int32
        )
        * 32
        + jnp.dot(ltx, lo, preferred_element_type=jnp.float32).astype(
            jnp.int32
        )
    )
    return jnp.where(m < total, out, 0)  # zero-pad past the data


def _rle_decode_kt_kernel(p_ref, ltx_ref, zz_ref, *, seg: int):
    """(R_BLK·128, K) packed u16 pairs → (R_BLK·128, K) int16 zigzag values
    (see ``_expand_kt`` for the algorithm)."""
    xt = (p_ref[:].astype(jnp.int32) & 0xFFFF).T  # (K, rows): slots on sublanes
    out = _expand_kt(xt, ltx_ref[:], seg)
    zz_ref[:] = out.T.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rle_decode_kt_call(packed_i16: jnp.ndarray, *, interpret: bool):
    n, seg = packed_i16.shape
    # Rows per grid step: same ≥256K-element granularity rule as encode.
    r_blk = max(LANES, min(n, (1 << 18) // seg))
    while n % r_blk:
        r_blk -= LANES
    r_blk = max(r_blk, LANES)
    spec = pl.BlockSpec(
        (r_blk, seg), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    lt_spec = pl.BlockSpec(
        (seg, seg), lambda r: (0, 0), memory_space=pltpu.VMEM
    )
    j = jnp.arange(seg)[:, None]
    s = jnp.arange(seg)[None, :]
    ltx = (s <= j).astype(jnp.bfloat16)  # inclusive prefix (contract j)
    return pl.pallas_call(
        functools.partial(_rle_decode_kt_kernel, seg=seg),
        grid=(n // r_blk,),
        in_specs=[spec, lt_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, seg), jnp.int16),
        interpret=interpret,
    )(packed_i16, ltx)


def _rle_decode_kt_plane_kernel(p_ref, ltx_ref, zz_ref, *, seg: int,
                                bw: int, slabs: int):
    """(slabs·bw, K) packed pairs → (slabs, K, bw) int16 zigzag — the
    decode butterfly with its output left in the KT (plane) layout.

    The decode math already runs transposed ((K, rows) with pair slots on
    sublanes); the row-major variant pays a final transpose back, but the
    plane-view inverse chain (``ops/fused.py::fused_inverse_plane_jnp``)
    consumes exactly this orientation, so each block-row slab is stored
    as a static lane slice instead — no transpose anywhere."""
    xt = (p_ref[:].astype(jnp.int32) & 0xFFFF).T  # (K, slabs·bw)
    out = _expand_kt(xt, ltx_ref[:], seg).astype(jnp.int16)
    for i in range(slabs):
        zz_ref[i, :, :] = out[:, i * bw : (i + 1) * bw]


@functools.partial(
    jax.jit, static_argnames=("bw", "interpret")
)
def _rle_decode_kt_plane_call(
    packed_i16: jnp.ndarray, *, bw: int, interpret: bool
):
    n, seg = packed_i16.shape
    bh = n // bw
    # Slabs per grid step: ≥256K elements each, while dividing bh.
    slabs = max(1, (1 << 18) // (bw * seg))
    while bh % slabs:
        slabs -= 1
    spec = pl.BlockSpec(
        (slabs * bw, seg), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (slabs, seg, bw), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
    )
    lt_spec = pl.BlockSpec(
        (seg, seg), lambda r: (0, 0), memory_space=pltpu.VMEM
    )
    j = jnp.arange(seg)[:, None]
    s = jnp.arange(seg)[None, :]
    ltx = (s <= j).astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(
            _rle_decode_kt_plane_kernel, seg=seg, bw=bw, slabs=slabs
        ),
        grid=(bh // slabs,),
        in_specs=[spec, lt_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bh, seg, bw), jnp.int16),
        interpret=interpret,
    )(packed_i16, ltx)


def rle_decode_packed16_pallas_plane(
    packed: jnp.ndarray, bw: int, interpret: bool = False
) -> jnp.ndarray:
    """(N, K) packed uint16 pairs (N = bh·bw, block-row major) →
    (bh, K, bw) int16 zigzag coefficients in the KT plane layout.

    Requires ``bw % 128 == 0`` (lane tile for the sliced stores) and the
    usual K constraints; callers fall back to the row-major kernel plus
    relayout otherwise.
    """
    n, k = packed.shape
    if bw % LANES or n % bw:
        raise ValueError(f"bad plane shape: N={n}, bw={bw}")
    if k & (k - 1) or k > MAX_SEG:
        raise ValueError(f"bad pair width {k}")
    return _rle_decode_kt_plane_call(
        jax.lax.bitcast_convert_type(packed.astype(jnp.uint16), jnp.int16),
        bw=bw,
        interpret=interpret,
    )


def _rle_decode_wide_kernel(p_ref, u_ref, t_ref, zz_ref, *, seg: int):
    """(R_BLK, 128) packed u16 pairs — 128/seg blocks per lane row — →
    (R_BLK, 128) int16 zigzag values, fully lane-resident.

    The round-4 reformulation of the decode butterfly: the KT variant's
    in-VMEM transpose turned out innocent, but its (rows, K) loads and
    (K, ·) tiles leave half (K=64) to three quarters (K=32) of every
    vector register empty — a pure row-major copy of the narrow layout is
    as slow as the whole kernel (profiles/profile_rle_expand_ablate.py).
    This kernel runs the identical integer network in the ENCODE kernel's
    orientation instead: the packed stream viewed as (N·K/128, 128) — a
    free reshape of the same bytes — with segment-local masks, lane-axis
    rolls, and the two prefix/total reductions as 128×128 MXU matmuls
    (exact: counts ≤ 64 in bf16, 0/1 matrices, f32 accumulation).
    Output is row-major (N, K), which the plane inverse einsum consumes
    in ``abk`` orientation at identical speed
    (profiles/profile_rle_expand_rm.py).
    """
    nbits = seg.bit_length() - 1
    x = p_ref[:].astype(jnp.int32) & 0xFFFF
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    m = lane & (seg - 1)  # position within the block's pair segment
    valid = x != 0
    counts = jnp.where(valid, (x >> 10) + 1, 0)
    vals = jnp.where(valid, (x & 0x3FF) - PACK16_VALUE_BIAS, 0)
    cb = counts.astype(jnp.bfloat16)
    incl = jnp.dot(
        cb, u_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # segment-local inclusive prefix sum
    total = jnp.dot(
        cb, t_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # segment total, broadcast to every lane
    starts = incl - counts
    dist = jnp.where(valid, starts - m, 0)  # ≥ 0: pairs only move right
    word = jnp.where(valid, dist | ((vals + 512) << _VAL_SH) | _VALID, 0)
    # Distribute MSB-first: stage b moves right by 2^b when bit b of the
    # remaining distance is set; m ≥ step masks every cross-segment (and
    # row-wrap) import, exactly as in the KT kernel.
    for b in range(nbits - 1, -1, -1):
        step = 1 << b
        incoming = pltpu.roll(word, shift=step, axis=1)
        ok = m >= step
        arrive = ok & ((incoming & _VALID) != 0) & ((incoming & step) != 0)
        depart = ((word & _VALID) != 0) & ((word & step) != 0)
        word = jnp.where(arrive, incoming - step, jnp.where(depart, 0, word))
    out = jnp.where(
        (word & _VALID) != 0,
        ((word >> _VAL_SH) & 0x3FF) - PACK16_VALUE_BIAS,
        0,
    )
    have = (word & _VALID) >> 23
    for b in range(nbits):
        step = 1 << b
        src_out = pltpu.roll(out, shift=step, axis=1)
        src_have = pltpu.roll(have, shift=step, axis=1)
        take = (1 - have) * jnp.where(m >= step, src_have, 0)
        out = jnp.where(take != 0, src_out, out)
        have = have | take
    out = jnp.where(m < total, out, 0)
    zz_ref[:] = out.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("seg", "interpret"))
def _rle_decode_wide_call(p128: jnp.ndarray, *, seg: int, interpret: bool):
    rows = p128.shape[0]
    r_blk = max(16, min(rows, 2048))
    while rows % r_blk:
        r_blk -= 16
    spec = pl.BlockSpec(
        (r_blk, LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    const_spec = pl.BlockSpec(
        (LANES, LANES), lambda r: (0, 0), memory_space=pltpu.VMEM
    )
    j = jnp.arange(LANES)[:, None]
    l = jnp.arange(LANES)[None, :]
    same = (j // seg) == (l // seg)
    u = (same & (j <= l)).astype(jnp.bfloat16)
    t = same.astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_rle_decode_wide_kernel, seg=seg),
        grid=(rows // r_blk,),
        in_specs=[spec, const_spec, const_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int16),
        interpret=interpret,
    )(p128, u, t)


def rle_decode_packed16_pallas_wide(
    packed: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(N, K) packed uint16 pairs → (N, K) int16 zigzag coefficients,
    via the lane-resident wide kernel (no transpose, no narrow tiles).

    **Measured negative — NOT production.**  The hypothesis was that the
    KT kernels' narrow (rows, K) loads bound them; fence-corrected A/B
    (profiles/profile_rle_decode_wide.py) shows the lane-axis rolls this
    orientation forces cost more than the KT kernels' sublane rolls plus
    transpose (marginal 4.3 vs 2.6 ms luma at 1M blocks, stable across
    r_blk 128…2048), so the KT kernels stay production.  Kept, tested
    bit-identical, so the negative is reproducible and not re-tried
    blind (same convention as tests/test_pallas_candidates.py).

    Requires ``N·K % (128·16) == 0`` (16 full sublane rows of the wide
    view per grid tile).  Bit-identical to ``rle_decode_packed16_pallas``.
    """
    n, k = packed.shape
    if k & (k - 1) or k > MAX_SEG:
        raise ValueError(f"bad pair width {k}")
    if (n * k) % (LANES * 16):
        raise ValueError(f"bad shape ({n}, {k}) for the wide decode kernel")
    p128 = jax.lax.bitcast_convert_type(
        packed.astype(jnp.uint16), jnp.int16
    ).reshape(n * k // LANES, LANES)
    zz = _rle_decode_wide_call(p128, seg=k, interpret=interpret)
    return zz.reshape(n, k)


def rle_decode_packed16_pallas(
    packed: jnp.ndarray, lengths: jnp.ndarray, out_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``ops/rle.py::rle_decode_packed16`` on TPU: (N, K)
    packed uint16 pairs (+ unused lengths — validity is implicit in the
    nonzero packed words) → (N, out_size) int32 coefficients.

    Requires ``out_size == K`` (the JPEG pipeline always satisfies this:
    blocks hold exactly K coefficients) and N a multiple of 128; callers
    pad or fall back to the membership einsum otherwise.
    """
    del lengths  # validity is implicit (nonzero words)
    n, k = packed.shape
    if out_size != k:
        raise ValueError(f"out_size {out_size} must equal pair width {k}")
    if n % LANES or k & (k - 1) or k > MAX_SEG:
        # k ≤ 64 mirrors the encode guard: pack16's 6-bit count field
        # cannot describe longer segments in the first place.
        raise ValueError(f"bad shape ({n}, {k}) for the decode kernel")
    zz = _rle_decode_kt_call(
        jax.lax.bitcast_convert_type(
            packed.astype(jnp.uint16), jnp.int16
        ),
        interpret=interpret,
    )
    return zz.astype(jnp.int32)
