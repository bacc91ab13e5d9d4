"""Quantization ops.

The reference divides by the table and truncates toward zero via an
``(int)`` cast — it does NOT round (``Quantize``, JPEG.c:621-629).  Tables:
the 64-entry luminance table (JPEG.c:12-20) and the 32-entry chrominance
table shaped for the 8×4 chroma block (JPEG.c:22-27), re-exported here from
the oracle as the single source of truth.

**Tie snapping.**  For integer pixel inputs, some DCT coefficients are
*mathematically exact* multiples of the table entry (e.g. basis rows whose
cosines are ±√2/2 yield coefficients in ¼·ℤ).  There ``trunc(c/q)`` sits on
a truncation boundary and flips with ±1-ulp summation noise — the C
reference's own result at such ties depends on its summation order and
libm.  ``quantize`` therefore snaps ratios within ``eps`` of an integer to
that integer before truncating, making the output deterministic across
dtypes and summation orders.  Non-tie coefficients are unaffected and match
the C oracle exactly (see ``utils/parity.py`` for the tie-aware
comparator used in the parity tests).
"""

from __future__ import annotations

import jax.numpy as jnp

from lz4jpeg_tpu.oracle.jpeg_oracle import (  # noqa: F401  (re-export)
    LUMINANCE_QUANTIZATION_TABLE,
    CHROMINANCE_QUANTIZATION_TABLE,
)

# Snap thresholds: generous vs each dtype's DCT rounding noise (~1e-7 rel
# for f32 over ≤2¹⁰-magnitude coefficients, ~1e-13 for f64), tight vs any
# plausible non-tie ratio.
_SNAP_EPS = {jnp.float32.dtype: 1e-4, jnp.float64.dtype: 1e-9}


def scale_table(table, quality):
    """Standard libjpeg quality scaling (framework extension; the
    reference's tables are compile-time constants, JPEG.c:12-27).

    ``quality`` None returns the table unchanged; 1–100 applies
    ``S = 5000/q`` below 50 else ``200 - 2q``, then
    ``clip((t*S + 50)//100, 1, 255)``.
    """
    import numpy as np

    if quality is None:
        return table
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.asarray(table, np.int64)
    return np.clip((t * s + 50) // 100, 1, 255)


def quantize(coefficients: jnp.ndarray, table, snap: bool = True) -> jnp.ndarray:
    """Elementwise divide + truncate toward zero.  ``table`` broadcasts over
    the batch: pass it flat for (N, L) inputs or shaped for (N, H, W)."""
    t = jnp.asarray(table, coefficients.dtype)
    ratio = coefficients / t
    if snap:
        eps = _SNAP_EPS.get(jnp.dtype(coefficients.dtype), 1e-4)
        nearest = jnp.round(ratio)
        ratio = jnp.where(jnp.abs(ratio - nearest) <= eps, nearest, ratio)
    return jnp.trunc(ratio)


def dequantize(coefficients: jnp.ndarray, table) -> jnp.ndarray:
    t = jnp.asarray(table, coefficients.dtype)
    return coefficients * t
