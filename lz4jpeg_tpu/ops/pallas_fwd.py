"""The forward megakernel: color + DCT + sparse-RLE in ONE Pallas pass.

The round-4 roofline located the forward chain's headroom in XLA's
inter-stage HBM materialization (~19 B/px of stage traffic vs ~5 B/px
algorithmic, ``results/roofline_jpeg_forward.json``).  This kernel runs
the whole per-block chain — YCbCr color transform, DCT+quantize+zigzag
as one basis matmul per channel, and the sparse-delta RLE epilogue
(``ops/rle.py::rle_encode_sparse16``) — inside VMEM, reading the RGB
block layout once (u8) and writing the entropy-ready sparse streams
once (u16).  Reference chain collapsed: the per-stage batch loops of
``Algorithms/sequential/JPEG/JPEG.c:1136-1421``.

Design notes (measured in profiles/probe_megakernel*.py, probe_pallas_
copy_ceiling.py, committed in results/pallas_ab.json::round5):

* Input is the "kt" block layout (position-within-8×8-tile on sublanes,
  block index on lanes), produced by one XLA transpose
  (``rgb_to_kt``, ~3.9 ms / 134 MPix) — lane-split reshapes do not
  lower inside Mosaic, so the relayout stays outside.
* The 4:2:2 odd-column subsample is FOLDED into a (32, 64) chroma
  basis (chroma block position (r, c') reads full-resolution tile
  column 2c'+1), so no subsample op exists anywhere.
* All three channels concatenate into ONE (C, 128) int16 output tile
  (64 luma + 32 Cr + 32 Cb lanes per block row): per-channel (C, 64)/
  (C, 32) i16 outputs waste half to three quarters of every 128-lane
  write tile (measured +3.4 ms); the combined layout writes full lanes
  with one transpose and one DMA stream.
* Run-count side channels are NOT emitted: an (N, 1) output pays ~8 ms
  of lane-padding write amplification.  Lengths come from the host
  entropy pass (which walks the stream anyway) or a cheap XLA reduce.
* In-kernel ``dot_general`` with precision=HIGHEST is bit-identical to
  the XLA plane einsum chain (0/268M coefficient mismatches measured).
* Pallas VMEM copies cap at ~155 GB/s on this chip (vs ~300 GB/s XLA
  streams), which bounds this kernel at ~10.3 ms / 134 MPix — still
  2.4× the XLA plane-einsum chain (24.9 ms), because the win is
  formulation (one pass, no materialization), not raw stream rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4jpeg_tpu.ops.color import _snap_trunc as _snap_trunc  # shared helper
from lz4jpeg_tpu.ops.fused import forward_basis, _table_key
from lz4jpeg_tpu.ops.rle import SPARSE16_DELTA_BIAS

C_CHUNK = 2048  # blocks per grid step (measured best of 1024/2048/4096)

# Combined-output lane ranges: [0, 64) luma, [64, 96) Cr, [96, 128) Cb.
COMBINED_LANES = 128
LUM_SLICE = slice(0, 64)
CR_SLICE = slice(64, 96)
CB_SLICE = slice(96, 128)
# The one channel→lane-range mapping every consumer shares (models,
# container, roofline) — re-declaring it per call site invites drift.
CHANNEL_SLICES = {"lum": LUM_SLICE, "r": CR_SLICE, "b": CB_SLICE}


@functools.lru_cache(maxsize=None)
def _kt_bases(lum_key: bytes, chr_key: bytes):
    """(my (64,64), mc64 (64,64 zero-padded), offs (128,1)) f32 numpy.

    ``mc64`` folds the 4:2:2 odd-column subsample into the chroma
    forward basis: chroma block position (r, c') reads full-res tile
    column 2c'+1 (``chroma_subsample_422`` keeps odd columns,
    JPEG.c:327-333).  Rows 32..63 are zero padding so both bases share
    one (64, 64) operand shape."""
    my, offy = forward_basis(8, 8, lum_key)
    mc, offc = forward_basis(4, 8, chr_key)
    mc64 = np.zeros((64, 64))
    k_idx = np.arange(32)[:, None, None]
    r_idx = np.arange(8)[None, :, None]
    c_idx = np.arange(4)[None, None, :]
    mc64[k_idx, r_idx * 8 + 2 * c_idx + 1] = mc.reshape(32, 8, 4)[
        k_idx, r_idx, c_idx
    ]
    offs = np.concatenate([offy, offc, offc])[:, None]
    return (
        my.astype(np.float32),
        mc64.astype(np.float32),
        offs.astype(np.float32),
    )


def rgb_to_kt(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) uint8 → (3, 64, N) uint8 kt block layout.

    N = prod(batch) · (H/8) · (W/8), block index in block-row-major
    order (frames outermost).  Pure transpose — XLA runs it at stream
    rate; requires H % 8 == 0 and W % 8 == 0."""
    *batch, h, w, _ = rgb.shape
    bh, bw = h // 8, w // 8
    x = rgb.reshape(*batch, bh, 8, bw, 8, 3)
    nb = len(batch)
    # axes: [batch...], bh, 8, bw, 8, 3 → 3, 8(row), 8(col), [batch...], bh, bw
    perm = (nb + 4, nb + 1, nb + 3, *range(nb), nb, nb + 2)
    return x.transpose(*perm).reshape(3, 64, -1)


def _fwd_kernel(x_ref, my_ref, mc_ref, off_ref, out_ref):
    """One (3, 64, C) u8 chunk → (C, 128) i16 combined sparse streams."""
    x = x_ref[0]
    r = x[0].astype(jnp.int32).astype(jnp.float32)
    g = x[1].astype(jnp.int32).astype(jnp.float32)
    b = x[2].astype(jnp.int32).astype(jnp.float32)
    # Reference color semantics: Y truncated, Cr/Cb truncated then
    # clamped (JPEG.c:127,157,180,132-139); snap handles XLA/Mosaic
    # reassociation exactly as ops/color.py does.
    y = _snap_trunc(0.299 * r + 0.587 * g + 0.114 * b, 1e-4)
    cr = jnp.clip(
        _snap_trunc(0.439 * r - 0.368 * g - 0.071 * b + 128.0, 1e-4),
        0.0, 255.0,
    )
    cb = jnp.clip(
        _snap_trunc(-0.148 * r - 0.291 * g + 0.439 * b + 128.0, 1e-4),
        0.0, 255.0,
    )

    def dct(m_ref, plane):
        # Fused DCT+quant+zigzag basis matmul (ops/fused.py semantics);
        # HIGHEST is bit-identical to the XLA plane einsum (measured).
        return jax.lax.dot_general(
            m_ref[:], plane, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    zz = jnp.concatenate(
        [dct(my_ref, y), dct(mc_ref, cr)[:32], dct(mc_ref, cb)[:32]],
        axis=0,
    ) - off_ref[:]
    xq = _snap_trunc(zz, 1e-5).astype(jnp.int32)  # (128, C)
    # Sparse-delta epilogue, segment-local over the three channel bands
    # stacked on sublanes (segment starts at rows 0, 64, 96).
    m = jax.lax.broadcasted_iota(jnp.int32, xq.shape, 0)
    first = (m == 0) | (m == 64) | (m == 96)
    prev = pltpu.roll(xq, shift=1, axis=0)
    starts = first | (xq != prev)
    w = jnp.where(
        starts, xq - jnp.where(first, 0, prev) + SPARSE16_DELTA_BIAS, 0
    )
    out_ref[:] = w.T.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(rgb_kt: jnp.ndarray, my, mc64, offs, *, interpret: bool):
    n = rgb_kt.shape[-1]
    g = n // C_CHUNK
    xc = rgb_kt.reshape(3, 64, g, C_CHUNK).transpose(2, 0, 1, 3)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 3, 64, C_CHUNK), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((COMBINED_LANES, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C_CHUNK, COMBINED_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, COMBINED_LANES), jnp.int16),
        interpret=interpret,
    )(xc, my, mc64, offs)


def forward_megakernel(
    rgb_kt: jnp.ndarray,
    lum_table: np.ndarray,
    chr_table: np.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """(3, 64, N) uint8 kt RGB → (N, 128) uint16 combined sparse streams
    (lanes: 64 luma + 32 Cr + 32 Cb sparse-delta slots per block).

    N is padded up to a C_CHUNK multiple internally (zero blocks → valid
    all-zero-delta streams); callers slice ``[:N]``.  Output is
    bit-identical to the XLA chain: color → plane einsums →
    ``rle_encode_sparse16`` per channel (tests/test_pallas_fwd.py).
    """
    if rgb_kt.shape[:2] != (3, 64):
        raise ValueError(f"bad kt shape {rgb_kt.shape}")
    n = rgb_kt.shape[-1]
    pad = (-n) % C_CHUNK
    if pad:
        rgb_kt = jnp.pad(rgb_kt, ((0, 0), (0, 0), (0, pad)))
    my, mc64, offs = _kt_bases(_table_key(lum_table), _table_key(chr_table))
    out = _fwd_call(
        rgb_kt, jnp.asarray(my), jnp.asarray(mc64), jnp.asarray(offs),
        interpret=interpret,
    )
    out = jax.lax.bitcast_convert_type(out, jnp.uint16)
    return out[:n] if pad else out


def sparse_lengths(combined: jnp.ndarray) -> dict:
    """(N, 128) combined sparse streams → per-channel symbol lengths
    ((N,) int32 each, 2·runs — the ``rle_encode_sparse16`` side channel).

    One XLA lane-reduce pass; production entropy paths get lengths from
    the native walk instead and never call this."""
    nz = (combined != 0).astype(jnp.int32)
    return {
        "lum": 2 * jnp.sum(nz[:, LUM_SLICE], axis=1),
        "r": 2 * jnp.sum(nz[:, CR_SLICE], axis=1),
        "b": 2 * jnp.sum(nz[:, CB_SLICE], axis=1),
    }
