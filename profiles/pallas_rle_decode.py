# Pallas candidate: RLE decode (packed16 pairs -> expanded zigzag stream)
# with the disjoint-interval membership built and reduced inside VMEM.
#
# The production formulation (ops/rle.py::rle_decode_packed16) is a
# membership einsum: XLA must materialize the (N, L, L) f32 membership
# tensor in HBM before the MXU contraction -- ~16 KB per 64-symbol tile
# against ~0.4 KB of actual input+output.  This kernel builds the same
# membership per tile block in VMEM and reduces it on the VPU, so HBM
# traffic drops to the packed pairs in + expanded stream out.
#
# Candidate only: wired into production iff it beats the einsum on-chip
# (the same bar every other Pallas candidate faced, results/pallas_ab.json).
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4jpeg_tpu.ops.rle import PACK16_VALUE_BIAS

TILE_ROWS = 256  # tiles per kernel invocation


def _decode_kernel(packed_ref, npairs_ref, out_ref, *, length):
    p = packed_ref[:].astype(jnp.int32)  # (T, L) packed pairs
    t, l = p.shape
    counts = (p >> 10) + 1
    vals = (p & 0x3FF) - PACK16_VALUE_BIAS
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, l), dimension=1)
    valid = lane < npairs_ref[:]  # (T, L) pair-slot mask
    counts = jnp.where(valid, counts, 0)
    # Inclusive prefix sum over lanes: 6 shift-add rounds (log2 64).
    ends = counts
    shift = 1
    while shift < l:
        rolled = pltpu.roll(ends, shift, axis=1)
        ends = ends + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    begins = ends - counts
    # Disjoint-interval membership, built and reduced in VMEM: for each
    # output position q, its value is the single run k with
    # begin_k <= q < end_k.
    q = jax.lax.broadcasted_iota(jnp.int32, (t, length, l), dimension=1)
    member = (begins[:, None, :] <= q) & (q < ends[:, None, :])
    out_ref[:] = jnp.sum(
        jnp.where(member, vals[:, None, :], 0), axis=2
    ).astype(jnp.int32)


def rle_decode_packed16_pallas(packed, lengths, out_size, interpret=False):
    """Drop-in for ops.rle.rle_decode_packed16 (packed16 layout)."""
    n, l = packed.shape
    rows = TILE_ROWS
    if n % rows != 0:
        pad = rows - n % rows
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
        n += pad
    npairs = (lengths.astype(jnp.int32) // 2).reshape(n, 1)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, length=out_size),
        out_shape=jax.ShapeDtypeStruct((n, out_size), jnp.int32),
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, out_size), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(packed, npairs)
    return out


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    from lz4jpeg_tpu.ops.rle import rle_decode_packed16, rle_encode_packed16

    rng = np.random.default_rng(0)
    on_cpu = jax.devices()[0].platform == "cpu"
    # structured symbols: runs of zeros + small values, like zigzag streams
    sym = rng.integers(-40, 40, (1024, 64)) * (
        rng.random((1024, 64)) < 0.25
    )
    packed, lens = rle_encode_packed16(jnp.asarray(sym, jnp.int16))
    want = np.asarray(rle_decode_packed16(packed, lens, 64))
    got = np.asarray(
        rle_decode_packed16_pallas(packed, lens, 64, interpret=on_cpu)
    )[: want.shape[0]]
    assert (got == want).all(), (got != want).sum()
    print("pallas rle decode: bit-identical to the einsum path")
