"""Tie-aware parity comparison for quantized DCT coefficients.

The C reference's ``(int)(coeff / table)`` (JPEG.c:626-627) is
order-dependent at *quantization ties* — coefficients whose true value is an
exact integer multiple of the table entry (see ``ops/quantize.py``).  Our
pipeline snaps those ties deterministically; the oracle reproduces the C's
exact float behavior.  Parity is therefore asserted as:

* bit-equal everywhere the f64 ratio is not within ``eps`` of an integer;
* at ties, our value must be the snapped (rounded) ratio and may differ
  from the oracle's trunc by at most 1.
"""

from __future__ import annotations

import numpy as np


def quantization_tie_mask(
    coefficients64: np.ndarray, table: np.ndarray, eps: float = 1e-9
) -> np.ndarray:
    """True where coeff/table is within ``eps`` of an integer (computed from
    the f64 oracle coefficients)."""
    ratio = coefficients64 / table.astype(np.float64)
    return np.abs(ratio - np.round(ratio)) <= eps


def assert_quantized_parity(
    ours: np.ndarray,
    oracle_vals: np.ndarray,
    coefficients64: np.ndarray,
    table: np.ndarray,
    eps: float = 1e-9,
) -> None:
    ties = quantization_tie_mask(coefficients64, table, eps)
    mismatch = ours != oracle_vals
    bad = mismatch & ~ties
    if np.any(bad):
        idx = np.argwhere(bad)[:5]
        raise AssertionError(
            f"non-tie quantized mismatch at {idx.tolist()}: "
            f"ours={ours[bad][:5]}, oracle={oracle_vals[bad][:5]}"
        )
    if np.any(mismatch):
        ratio = coefficients64 / table.astype(np.float64)
        snapped = np.round(ratio)
        if not np.all(ours[mismatch] == snapped[mismatch]):
            raise AssertionError("tie mismatch is not the snapped value")
        if np.abs(ours[mismatch] - oracle_vals[mismatch]).max() > 1:
            raise AssertionError("tie mismatch exceeds one quantization step")
