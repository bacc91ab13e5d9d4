"""Pallas TPU kernel CANDIDATE for the fused MCU transform — measured
SLOWER than the XLA einsum of ``ops/fused.py``; not shipped in the package.

A/B on TPU v5e (chained dispatch, tunnel RTT amortized; see
``profile_pallas.py`` and the committed ``results/pallas_ab.json``):
forward 8.5 ms vs 4.1 ms, inverse similar, for 2M 8×8 MCUs — XLA's
pipelining of the same (N, 64) × (64, 64) matmul wins 2×, so the jnp
implementation stays the production path.  Kept (with ``pallas_rle.py``)
so the measurement is reproducible; bit-identical to the jnp path
(tests/test_pallas_candidates.py, plus the on-chip A/B).

One grid step processes a (BLOCK_N, HW) tile of MCUs: uint8 pixels are
upcast in VMEM, hit the MXU once against the fused
DCT+quant+zigzag basis (see ``ops/fused.py``), and the truncated
coefficients are written back — a single VMEM-resident pass over the MCU
batch, with the (HW, HW) basis and (1, HW) offset held in VMEM across the
whole grid.  The op is HBM-bound (0.64 GB moved per 17 GFLOP at HW=64),
and XLA's double-buffering of the same matmul beats this hand tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4jpeg_tpu.ops.fused import _table_key, forward_basis, inverse_basis

BLOCK_N = 512  # MCUs per grid step; BLOCK_N·HW·4 B ≈ 128 KiB of VMEM


def _forward_kernel(x_ref, m_ref, off_ref, out_ref, *, snap_eps: float):
    # Mosaic has no direct uint8→f32 cast; hop through int32.
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    ratio = (
        jnp.dot(x, m_ref[:], preferred_element_type=jnp.float32)
        - off_ref[:]
    )
    nearest = jnp.round(ratio)
    ratio = jnp.where(jnp.abs(ratio - nearest) <= snap_eps, nearest, ratio)
    out_ref[:] = jnp.trunc(ratio)


def _inverse_kernel(zz_ref, minv_ref, out_ref):
    pix = (
        jnp.dot(
            zz_ref[:], minv_ref[:], preferred_element_type=jnp.float32
        )
        + 128.0
    )
    rounded = jnp.sign(pix) * jnp.floor(jnp.abs(pix) + 0.5)
    # Mosaic has no direct f32→uint8 cast; hop through int32.
    out_ref[:] = jnp.clip(rounded, 0, 255).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "snap_eps", "interpret")
)
def _forward_call(tiles, m, off, *, width, height, snap_eps, interpret):
    n = tiles.shape[0]
    hw = height * width
    x = tiles.reshape(n, hw)
    grid = (pl.cdiv(n, BLOCK_N),)
    return pl.pallas_call(
        functools.partial(_forward_kernel, snap_eps=snap_eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_N, hw), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw), jnp.float32),
        interpret=interpret,
    )(x, m, off)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "interpret")
)
def _inverse_call(zz, minv, *, width, height, interpret):
    n = zz.shape[0]
    hw = height * width
    grid = (pl.cdiv(n, BLOCK_N),)
    out = pl.pallas_call(
        _inverse_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_N, hw), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw), jnp.uint8),
        interpret=interpret,
    )(zz, minv)
    return out.reshape(n, height, width)


def fused_forward_pallas(
    tiles: jnp.ndarray,
    table: np.ndarray,
    width: int,
    height: int,
    snap_eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) uint8 tiles → (N, HW) quantized zigzag coefficients."""
    m, off = forward_basis(width, height, _table_key(table))
    return _forward_call(
        tiles,
        jnp.asarray(m.T, jnp.float32),
        jnp.asarray(off[None, :], jnp.float32),
        width=width,
        height=height,
        snap_eps=snap_eps,
        interpret=interpret,
    )


def fused_inverse_pallas(
    zz: jnp.ndarray,
    table: np.ndarray,
    width: int,
    height: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, HW) zigzag quantized coefficients → (N, H, W) uint8 pixels."""
    minv = inverse_basis(width, height, _table_key(table))
    return _inverse_call(
        zz.astype(jnp.float32),
        jnp.asarray(minv.T, jnp.float32),
        width=width,
        height=height,
        interpret=interpret,
    )
