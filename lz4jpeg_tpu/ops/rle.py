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


def rle_encode_batched(values: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, L) int32 blocks → ((N, 2L) padded [count,value] pairs, (N,) lengths).

    Values must already be integral (the reference compares after ``(int)``
    truncation; quantized coefficients are — truncate first if not).

    Scatter-free formulation: run lengths come from a suffix-min over
    boundary positions, and the compaction of per-start (count, value)
    pairs into the first ``num_runs`` slots is a one-hot **einsum** over
    the tiny L axis — batched matmuls the MXU eats, instead of the
    per-row scatters that serialize on TPU (measured 60× slower).
    """
    x = values.astype(jnp.int32)
    n, length = x.shape
    idx = jnp.arange(length, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.ones((n, 1), jnp.bool_), x[:, 1:] != x[:, :-1]], axis=1
    )
    run_id = jnp.cumsum(starts, axis=1, dtype=jnp.int32) - 1  # (N, L)
    # next boundary strictly after i (or L): suffix-min of boundary index.
    bpos = jnp.where(starts, idx, length)
    suffix = jax.lax.cummin(bpos[:, ::-1], axis=1)[:, ::-1]
    nb = jnp.concatenate(
        [suffix[:, 1:], jnp.full((n, 1), length, jnp.int32)], axis=1
    )
    run_len = nb - idx  # valid where starts
    # one-hot compaction: slot k collects the start whose run_id == k.
    onehot = (
        (run_id[:, :, None] == idx[None, None, :]) & starts[:, :, None]
    ).astype(jnp.float32)
    # HIGHEST precision: the TPU default (bf16 multiplies) cannot
    # represent values above 256 exactly, which quantized coefficients
    # reach at high quality settings.
    counts = jnp.einsum(
        "bil,bi->bl", onehot, run_len.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    run_values = jnp.einsum(
        "bil,bi->bl", onehot, x.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    num_runs = jnp.sum(starts, axis=1, dtype=jnp.int32)
    pairs = jnp.stack([counts, run_values], axis=2).reshape(n, 2 * length)
    valid = jnp.arange(2 * length)[None, :] < (2 * num_runs)[:, None]
    return jnp.where(valid, pairs, 0), 2 * num_runs


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
