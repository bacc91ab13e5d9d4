"""Device-parallel decode of the fast (LZ4T) frame.

The reference's parallel decode is a thread per block whose framing walk is
serial (each block's byte size is discovered by reading the previous
block's header, ``Algorithms/parallel/LZ4/LZ4.c:1136-1148``) and whose
create/wait pairing serialized the threads anyway (``:1177-1178``).  The
LZ4T format was designed to fix the framing half: compressed sizes live up
front, so every block's payload offset is one prefix sum over the size
table (``formats/fast_frame.py``).  This module supplies the other half —
block-parallel reconstruction on the accelerator:

1. **Framing + parse (host, linear, memcpy-speed).**  One native C++ pass
   (``lz4core.cpp::lz4t_build_copy_program``) turns the whole frame into a
   *copy program*: a dense (B, P) grid where every output byte is either a
   literal byte or the intra-block index it copies from.  Blocks are
   independent by construction (matches never cross an LZ4T block), so the
   program rows are too.
2. **Match resolution (device, batched).**  Match chains resolve by
   pointer doubling — ``root[i] ← root[root[i]]`` per block row — so a
   length-L offset-1 chain (the worst case) finishes in ⌈log₂ L⌉ batched
   gathers instead of the reference's byte-serial copy loop
   (``interpret_sequence``, LZ4.c:937-982).  All blocks resolve at once,
   and the block axis shards over a device mesh (``parallel/lz4.py::
   sharded_resolve_blocks``) exactly like the encode side.

The parity-frame twin of this module is ``ops/lz4_decode.py`` (global
output buffer, cross-block chains); LZ4T's intra-block chains are what
make the sharded version legal.
"""

from __future__ import annotations

import functools
import struct
from typing import Tuple

import numpy as np

from lz4jpeg_tpu.formats.fast_frame import (
    MAGIC,
    RAW_FLAG,
    VERSION,
    FastFormatError,
)


# Host pre-roots chains deeper than this during the program build, so the
# device runs at most ceil(log2(cap)) doubling steps.  Every doubling step
# is a data-dependent gather — the slowest primitive on this stack
# (~70 Melem/s measured, results/lz4t_decode_device.json) — so small caps
# win; 4 keeps genuine on-device chain resolution at 2 steps.
DEVICE_DEPTH_CAP = 4


def build_copy_program_fast(
    frame: bytes, depth_cap: int = DEVICE_DEPTH_CAP
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """LZ4T frame → ``(lit (B, P) u8, src (B, P) i32, raw_sizes (B,), P,
    max_depth)``.

    ``src == -1`` marks literal positions; match positions hold their
    intra-block source index.  Self-overlapping (periodic) matches are
    collapsed to one hop into the source period, chains deeper than
    ``depth_cap`` are pre-rooted (the builder's left-to-right walk keeps
    the root array for free), and ``max_depth`` is the longest remaining
    chain — the device then needs only ``ceil(log2(max_depth))`` doubling
    steps.  Native single-pass parse when built, pure Python otherwise
    (same output).
    """
    if len(frame) < 20:
        raise FastFormatError("frame too short")
    magic, version, block_log, _res, raw_size, block_count = struct.unpack_from(
        "<IBBHQI", frame, 0
    )
    if magic != MAGIC:
        raise FastFormatError("bad magic")
    if version != VERSION:
        raise FastFormatError(f"unsupported version {version}")
    p = 1 << block_log
    if block_count == 0:
        return (
            np.zeros((0, p), np.uint8),
            np.full((0, p), -1, np.int32),
            np.zeros(0, np.int64),
            p,
            0,
        )

    from lz4jpeg_tpu.native import native_available, native_backend

    if native_available():
        try:
            lit, src, sizes, depth = native_backend().build_copy_program(
                frame, block_count, p, depth_cap
            )
            return lit, src, sizes, p, depth
        except RuntimeError as e:
            raise FastFormatError(str(e)) from e

    sizes_tab = struct.unpack_from(f"<{block_count}I", frame, 20)
    # Prefix-sum framing: the up-front size table gives every payload's
    # offset without touching the payloads (the reference needed a serial
    # header walk here).
    payload_lens = np.asarray(
        [s & ~RAW_FLAG if s & RAW_FLAG else s for s in sizes_tab], np.int64
    )
    offsets = 20 + 4 * block_count + np.concatenate(
        [[0], np.cumsum(payload_lens[:-1])]
    )
    lit = np.zeros((block_count, p), np.uint8)
    src = np.full((block_count, p), -1, np.int32)
    raw_sizes = np.zeros(block_count, np.int64)
    done = 0
    max_depth = 0
    for b, rec in enumerate(sizes_tab):
        expected = min(p, raw_size - done)
        start = int(offsets[b])
        if rec & RAW_FLAG:
            length = rec & ~RAW_FLAG
            if length != expected:
                raise FastFormatError(f"raw block {b} size mismatch")
            lit[b, :length] = np.frombuffer(frame, np.uint8, length, start)
        else:
            d = _parse_payload(
                frame[start : start + rec], lit[b], src[b], expected,
                depth_cap,
            )
            max_depth = max(max_depth, d)
        raw_sizes[b] = expected
        done += expected
    if done != raw_size:
        raise FastFormatError("frame size mismatch")
    return lit, src, raw_sizes, p, max_depth


def _parse_payload(
    payload: bytes, lit_row: np.ndarray, src_row: np.ndarray, expected: int,
    depth_cap: int = DEVICE_DEPTH_CAP,
) -> int:
    """One block's payload → its copy-program row (Python spec path).
    Returns the block's maximum (post-cap) chain depth."""
    depth = np.zeros(expected, np.int32)
    root = np.arange(expected, dtype=np.int32)
    depth_cap = max(1, depth_cap)
    q, w, n = 0, 0, len(payload)
    while q < n:
        token = payload[q]
        q += 1
        run = token >> 4
        if run == 15:
            while True:
                if q >= n:
                    raise FastFormatError("truncated literal extension")
                e = payload[q]
                q += 1
                run += e
                if e != 255:
                    break
        if q + run > n or w + run > expected:
            raise FastFormatError("truncated literals")
        lit_row[w : w + run] = np.frombuffer(payload, np.uint8, run, q)
        q += run
        w += run
        if q == n:
            break  # final literals-only sequence
        if q + 2 > n:
            raise FastFormatError("truncated offset")
        offset = payload[q] | (payload[q + 1] << 8)
        q += 2
        if offset == 0 or offset > w:
            raise FastFormatError("bad match offset")
        ml = (token & 0xF) + 4
        if token & 0xF == 15:
            while True:
                if q >= n:
                    raise FastFormatError("truncated match extension")
                e = payload[q]
                q += 1
                ml += e
                if e != 255:
                    break
        if w + ml > expected:
            raise FastFormatError("match overruns block")
        # Periodic self-overlap collapses to one hop into the source period.
        j = np.arange(ml, dtype=np.int32)
        s = w - offset + np.where(j < offset, j, j % offset)
        d = depth[s] + 1
        deep = d > depth_cap
        s = np.where(deep, root[s], s)  # pre-root deep chains
        d = np.where(deep, 1, d)
        src_row[w : w + ml] = s
        depth[w : w + ml] = d
        root[w : w + ml] = root[s]
        w += ml
    if w != expected:
        raise FastFormatError("decoded size mismatch")
    return int(depth.max(initial=0))


def depth_to_steps(max_depth: int) -> int:
    """Doubling steps needed to root chains of the given depth
    (2**steps ≥ depth; depth ≤ 1 is already rooted by the initial hop)."""
    return max(0, max_depth - 1).bit_length()


@functools.partial(__import__("jax").jit, static_argnames=("steps",))
def resolve_blocks(lit, src, steps: int):
    """Batched per-block pointer doubling: (B, P) copy program → bytes.

    After k doublings every chain of depth ≤ 2^k is rooted; the program
    builder collapses periodic runs and reports the true ``max_depth``
    (single digits on real data), so ``steps = depth_to_steps(max_depth)``
    — not the block-size worst case.  Literals root at themselves (the
    doubling fixpoint).
    """
    import jax
    import jax.numpy as jnp

    p = src.shape[1]
    idx = jnp.arange(p, dtype=src.dtype)[None, :]
    root = jnp.where(src < 0, idx, src)
    root = jax.lax.fori_loop(
        0, steps, lambda _, r: jnp.take_along_axis(r, r, axis=1), root
    )
    return jnp.take_along_axis(lit, root, axis=1)


# MXU one-hot resolve parameters (round 5): r = CHUNK*hi + lo; one
# transposed one-hot matmul per 128-output tile gathers each output's
# 128-byte chunk row, a sublane-select extracts the byte.
_MXU_CHUNK = 128
_MXU_ROWS = 32  # 128-output rows per grid step


def _mxu_resolve_kernel(root_ref, lit2t_ref, out_ref, *, c_chunks: int):
    import jax
    import jax.numpy as jnp

    r2 = root_ref[0]  # (R, 128) i32 — outputs dense on lanes
    hi = r2 >> 7
    lo = r2 & 127
    sio = jax.lax.broadcasted_iota(jnp.int32, (c_chunks, 128), 0)
    bio = jax.lax.broadcasted_iota(jnp.int32, (_MXU_CHUNK, 128), 0)
    outs = []
    for r in range(r2.shape[0]):
        # One-hot over the chunk id, TRANSPOSED (chunks on sublanes) so
        # the build is a sublane-iota compare against a broadcast row —
        # the sublane-oriented variants paid 128x narrow-DMA padding
        # (profiles/probe_lz4t_mxu_gather*.py).
        ht = (sio == hi[r : r + 1, :]).astype(jnp.bfloat16)
        rows_t = jax.lax.dot_general(
            lit2t_ref[0], ht, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128 bytes-in-chunk, 128 outputs) — exact: one 1 per column
        sel = bio == lo[r : r + 1, :]
        outs.append(jnp.sum(
            jnp.where(sel, rows_t.astype(jnp.int32), 0),
            axis=0, keepdims=True,
        ))
    out_ref[0] = jnp.concatenate(outs, axis=0)


@functools.partial(
    __import__("jax").jit, static_argnames=("interpret",)
)
def resolve_blocks_mxu(lit, root, interpret: bool = False):
    """(B, P) u8 literals + (B, P) FULLY-ROOTED source indices → bytes,
    as a square-decomposed one-hot MXU gather (VERDICT r4 item 2's
    formulation), superseding the round-4 sort-join bound.  Cost is
    invariant at 2·P² MACs per P-byte block (every output tile's
    contraction must span the whole block; median root distance is
    23 Ki of the 64 Ki block, so no band helps) — that invariant IS the
    asymptote, and at serving batches the kernel reaches it:
    **1.04 GB/s at 128 MB** (881 MB/s at 64 MB; small batches are
    dispatch-starved — 457/152/40 MB/s at 16/4/1 MB), 37× the
    pointer-doubling gathers and the charter's GB/s decode bar met
    on-device (results/lz4t_decode_device.json::mxu_resolve_round5).
    Requires P % (128·_MXU_ROWS) == 0; ``root`` must satisfy
    root[i] == i at literal positions (depth_cap=1 programs).
    Reference byte-serial loop this replaces: LZ4.c:937-982."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    b, p = lit.shape
    c_chunks = p // _MXU_CHUNK
    g = p // (128 * _MXU_ROWS)
    root3 = root.reshape(b * g, _MXU_ROWS, 128)
    lit2t = jnp.transpose(
        lit.reshape(b, c_chunks, _MXU_CHUNK), (0, 2, 1)
    ).astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_mxu_resolve_kernel, c_chunks=c_chunks),
        grid=(b * g,),
        in_specs=[
            pl.BlockSpec((1, _MXU_ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _MXU_CHUNK, c_chunks),
                         lambda i, g=g: (i // g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _MXU_ROWS, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * g, _MXU_ROWS, 128), jnp.int32),
        interpret=interpret,
    )(root3, lit2t)
    return out.reshape(b, p).astype(jnp.uint8)


def decode_fast_device(frame: bytes) -> bytes:
    """Full LZ4T decode with device match resolution (single device).

    On TPU with MXU-compatible block sizes the resolve runs as the
    one-hot matmul gather (``resolve_blocks_mxu``, host pre-roots all
    chains for free during its parse walk); other shapes/backends keep
    the pointer-doubling path."""
    import jax
    import jax.numpy as jnp

    from lz4jpeg_tpu.formats.fast_frame import verify_frame_checksum

    use_mxu = jax.default_backend() == "tpu"
    lit, src, raw_sizes, p, max_depth = build_copy_program_fast(
        frame, depth_cap=1 if use_mxu else DEVICE_DEPTH_CAP
    )
    if lit.shape[0] == 0:
        return b""
    if use_mxu and p % (128 * _MXU_ROWS) == 0:
        idx = np.arange(p, dtype=np.int32)[None, :]
        root = np.where(src < 0, idx, src).astype(np.int32)
        out = np.asarray(jax.device_get(
            resolve_blocks_mxu(jnp.asarray(lit), jnp.asarray(root))
        ))
    else:
        steps = depth_to_steps(max_depth)
        out = np.asarray(
            jax.device_get(
                resolve_blocks(jnp.asarray(lit), jnp.asarray(src), steps)
            )
        )
    decoded = _trim_rows(out, raw_sizes)
    verify_frame_checksum(frame, decoded)
    return decoded


def _trim_rows(out: np.ndarray, raw_sizes: np.ndarray) -> bytes:
    if int(raw_sizes.min(initial=out.shape[1])) == out.shape[1]:
        return out.tobytes()  # only full blocks — no ragged tail
    parts = [out[b, : int(n)].tobytes() for b, n in enumerate(raw_sizes)]
    return b"".join(parts)
