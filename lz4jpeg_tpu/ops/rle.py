"""Run-length encoding as a batched, fixed-shape vector op.

The reference RLE is a serial loop per block emitting variable-length
``[count, value]`` int pairs (JPEG.c:767-809).  The TPU formulation is
branch-free with static shapes (SURVEY.md §7 step 5):

* run boundaries  = ``x[i] != x[i-1]`` (VPU compare),
* run ids         = prefix sum of boundaries,
* per-run counts  = segment-sum of ones (scatter-add),
* per-run values  = scatter of the first element of each run,

then counts/values are interleaved into a zero-padded ``(N, 2L)`` buffer
with a ``(N,)`` valid-length side channel — the standard variable-length-
output-on-SIMD pattern (pad + mask + size side channel).

Decode inverts it with a ``searchsorted`` over the cumulative counts —
a vectorized gather instead of the reference's nested fill loops
(JPEG.c:811-842), including its cap-at-capacity and zero-pad semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rle_encode_one(values: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L,) int32 → ((2L,) padded pairs, scalar valid length)."""
    length = values.shape[0]
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), values[1:] != values[:-1]]
    )
    run_id = jnp.cumsum(starts) - 1  # run index per element
    counts = jnp.zeros(length, jnp.int32).at[run_id].add(1)
    run_values = jnp.zeros(length, jnp.int32).at[run_id].set(values)
    num_runs = jnp.sum(starts).astype(jnp.int32)
    pairs = jnp.stack([counts, run_values], axis=1).reshape(2 * length)
    valid = jnp.arange(2 * length) < 2 * num_runs
    return jnp.where(valid, pairs, 0), 2 * num_runs


def rle_encode_batched(values: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, L) int32 blocks → ((N, 2L) padded [count,value] pairs, (N,) lengths).

    Values must already be integral (the reference compares after ``(int)``
    truncation; quantized coefficients are — truncate first if not).
    """
    return jax.vmap(_rle_encode_one)(values.astype(jnp.int32))


def _rle_decode_one(pairs: jnp.ndarray, length: jnp.ndarray, out_size: int) -> jnp.ndarray:
    counts = pairs[0::2]
    vals = pairs[1::2]
    num_pairs = length // 2
    pair_valid = jnp.arange(counts.shape[0]) < num_pairs
    counts = jnp.where(pair_valid, counts, 0)
    ends = jnp.cumsum(counts)
    total = ends[-1] if counts.shape[0] > 0 else jnp.int32(0)
    pos = jnp.arange(out_size)
    run = jnp.searchsorted(ends, pos, side="right")
    run = jnp.clip(run, 0, vals.shape[0] - 1)
    out = jnp.where(pos < total, vals[run], 0)
    return out


def rle_decode_batched(
    pairs: jnp.ndarray, lengths: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """((N, 2K) pairs, (N,) valid lengths) → (N, out_size) int32, capped at
    ``out_size`` and zero-padded, matching ``inverse_RLE``."""
    return jax.vmap(lambda p, l: _rle_decode_one(p, l, out_size))(
        pairs.astype(jnp.int32), lengths.astype(jnp.int32)
    )
