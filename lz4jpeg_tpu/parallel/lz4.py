"""Sharded LZ4 block parsing: blocks distributed over the device mesh.

Replaces the reference's thread-per-block encode
(``parallel_LZ4_encode``, ``Algorithms/parallel/LZ4/LZ4.c:680-779``): the
block axis is sharded with ``shard_map``, each device runs the batched
match-table + greedy-parse kernels on its shard, and the ordered gather of
per-block parse results (``parallel_add_block_to_frame``'s
``frame_blocks[index] = *block`` under a lock, :495-514) becomes an
``all_gather`` over the mesh axis — lock-free and deterministic by
construction.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lz4jpeg_tpu.ops.match import greedy_parse, match_tables


def sharded_block_parse(
    blocks: np.ndarray, mesh: Mesh, max_match: int = 1024
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(B, P) padded int32 blocks → (is_match, emit_len, emit_dist).

    ``B`` must be a multiple of the mesh size (see ``pad_to_devices``).
    Each device parses its block shard independently; the results are
    all-gathered so every host sees the full ordered arrays.
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(None, None),
        # The all_gather output is identical on every device, but the vma
        # checker cannot statically express "replicated after all_gather"
        # in this JAX version — the equality is asserted by
        # tests/test_parallel.py against the unsharded parse.
        check_vma=False,
    )
    def parse_shard(shard):
        best_len, best_dist = match_tables(shard, max_match=max_match)
        is_match, emit_len, emit_dist = greedy_parse(best_len, best_dist)
        stacked = jnp.stack(
            [is_match.astype(jnp.int32), emit_len, emit_dist], axis=1
        )
        # Ordered gather: shard i lands at rows [i*shard_b, (i+1)*shard_b) —
        # original block order, by construction.
        return jax.lax.all_gather(stacked, axis, axis=0, tiled=True)

    gathered = np.asarray(jax.jit(parse_shard)(jnp.asarray(blocks)))
    return gathered[:, 0].astype(bool), gathered[:, 1], gathered[:, 2]


def sharded_fast_parse(
    blocks: np.ndarray, lengths: np.ndarray, mesh: Mesh
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fast-mode (LZ4T) match finding with the block axis sharded.

    Same layout contract as ``sharded_block_parse`` but running the
    fast-mode matcher (``ops/pallas_match.py``'s fused kernel on TPU
    meshes, the portable sort formulation elsewhere) per shard — 16 KiB
    blocks are the natural DP unit for large inputs.  ``blocks`` row
    count must be a multiple of the mesh size.
    """
    from lz4jpeg_tpu.ops.lz4_fast import fast_match_blocks

    axis = mesh.axis_names[0]
    use_fused = all(
        d.platform == "tpu" for d in mesh.devices.flat
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(None, None),
        check_vma=False,  # all_gather output is replicated (see above)
    )
    def parse_shard(shard, shard_lengths):
        if use_fused:
            from lz4jpeg_tpu.ops.pallas_match import (
                fast_match_blocks_pallas,
            )

            is_match, emit_len, emit_dist = fast_match_blocks_pallas(
                shard, shard_lengths
            )
        else:
            is_match, emit_len, emit_dist = fast_match_blocks(
                shard, shard_lengths
            )
        stacked = jnp.stack(
            [is_match.astype(jnp.int32), emit_len, emit_dist], axis=1
        )
        return jax.lax.all_gather(stacked, axis, axis=0, tiled=True)

    gathered = np.asarray(
        jax.jit(parse_shard)(jnp.asarray(blocks), jnp.asarray(lengths))
    )
    return gathered[:, 0].astype(bool), gathered[:, 1], gathered[:, 2]


def sharded_compressed_sizes(
    emit_len: np.ndarray, is_match: np.ndarray, mesh: Mesh
) -> np.ndarray:
    """Per-block serialized sequence-count estimate via a sharded reduction.

    Demonstrates the replicated-reduction path (``psum``) the multi-host
    frame writer uses to pre-size the output stream before the payload
    gather.  Returns the total number of match sequences per shard, summed
    over the mesh.
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(axis, None), out_specs=P()
    )
    def count(shard_matches):
        local = jnp.sum(shard_matches.astype(jnp.int32))
        return jax.lax.psum(local, axis)

    return np.asarray(jax.jit(count)(jnp.asarray(is_match)))


def sharded_resolve_blocks(
    lit: np.ndarray, src: np.ndarray, mesh: Mesh, steps: int = None
) -> np.ndarray:
    """Device-parallel LZ4T match resolution with the block axis sharded.

    The decode-side mirror of ``sharded_fast_parse``: every device runs the
    batched pointer-doubling copy-resolve (``ops/lz4t_decode.py``) on its
    rows of the copy program, then the reconstructed blocks all-gather in
    original order.  Legal because LZ4T match chains never cross a block —
    the capability match for the reference's thread-per-block decode
    (``Algorithms/parallel/LZ4/LZ4.c:1105-1222``), whose create/wait pair
    had serialized it.  Row count must be a multiple of the mesh size
    (``pad_to_devices``; all-literal padding rows resolve to themselves).
    """
    from lz4jpeg_tpu.ops.lz4t_decode import resolve_blocks

    axis = mesh.axis_names[0]
    if steps is None:
        steps = (src.shape[1] - 1).bit_length()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(None, None),
        check_vma=False,  # all_gather output is replicated (see above)
    )
    def resolve_shard(lit_s, src_s):
        out = resolve_blocks(lit_s, src_s, steps)
        return jax.lax.all_gather(out, axis, axis=0, tiled=True)

    return np.asarray(
        jax.jit(resolve_shard)(jnp.asarray(lit), jnp.asarray(src))
    )


def sharded_fast_decode(frame: bytes, mesh: Mesh) -> bytes:
    """Full LZ4T decode with match resolution sharded over ``mesh``.

    Host does the linear framing/parse pass (prefix-summable thanks to the
    up-front size table), the mesh resolves all match chains in parallel.
    """
    from lz4jpeg_tpu.formats.fast_frame import verify_frame_checksum
    from lz4jpeg_tpu.ops.lz4t_decode import (
        _trim_rows,
        build_copy_program_fast,
        depth_to_steps,
    )
    from lz4jpeg_tpu.parallel.mesh import pad_to_devices

    lit, src, raw_sizes, p, max_depth = build_copy_program_fast(frame)
    if lit.shape[0] == 0:
        return b""
    n_dev = mesh.devices.size
    lit_p, n_blocks = pad_to_devices(lit, n_dev, pad_value=0)
    src_p, _ = pad_to_devices(src, n_dev, pad_value=-1)
    out = sharded_resolve_blocks(
        lit_p, src_p, mesh, steps=depth_to_steps(max_depth)
    )[:n_blocks]
    decoded = _trim_rows(out, raw_sizes)
    verify_frame_checksum(frame, decoded)
    return decoded


def multihost_fast_decode(frame: bytes) -> bytes:
    """Cross-host LZ4T decode: the frame's up-front size table gives every
    process the full framing for free (one prefix sum — no serial header
    walk), each process builds and resolves the copy program for its
    strided stripe of blocks on its local devices, and the decoded block
    bytes gather in original order over the interconnect.

    The multi-host realization of the reference's block-parallel decode
    intent (``Algorithms/parallel/LZ4/LZ4.c:1105-1222`` — thread per block,
    accidentally serialized by its create/wait pair, and serially framed at
    ``:1136-1148``).  Byte-equal to a local ``decode`` of the same frame on
    every process; verified against the frame's content checksum.  Call
    under an initialized ``jax.distributed`` runtime; single-process it
    degrades to a local device decode.
    """
    import jax

    from lz4jpeg_tpu.formats.fast_frame import verify_frame_checksum
    from lz4jpeg_tpu.ops.lz4t_decode import (
        build_copy_program_fast,
        depth_to_steps,
        resolve_blocks,
    )
    from lz4jpeg_tpu.parallel.multihost import ordered_allgather_payloads

    pid, nproc = jax.process_index(), jax.process_count()
    lit, src, raw_sizes, p, max_depth = build_copy_program_fast(frame)
    num_blocks = lit.shape[0]
    if num_blocks == 0:
        return b""
    mine = list(range(pid, num_blocks, nproc))
    local_payloads: List[bytes] = []
    if mine:
        out = np.asarray(
            jax.device_get(
                resolve_blocks(
                    jnp.asarray(lit[mine]),
                    jnp.asarray(src[mine]),
                    depth_to_steps(max_depth),
                )
            )
        )
        local_payloads = [
            out[row, : int(raw_sizes[bi])].tobytes()
            for row, bi in enumerate(mine)
        ]
    blocks = ordered_allgather_payloads(local_payloads, mine, num_blocks)
    decoded = b"".join(blocks)
    verify_frame_checksum(frame, decoded)
    return decoded


def multihost_fast_encode(data: bytes) -> bytes:
    """Cross-host fast-mode LZ4 encode: every process matches + emits its
    strided slice of the block axis, payloads gather in original block
    order over the interconnect, and every process returns the identical
    assembled LZ4T frame.

    The multi-host version of the reference's pre-sized ordered gather
    (``parallel_add_block_to_frame``, Algorithms/parallel/LZ4/LZ4.c:495-514)
    — block independence makes the frame bytes equal to a single-process
    ``LZ4Codec.encode(engine="tpu")`` of the same input.  Call under an
    initialized ``jax.distributed`` runtime (``parallel.multihost``); in a
    single process it degrades to a local encode.
    """
    import jax
    import jax.numpy as jnp

    from lz4jpeg_tpu.formats.fast_frame import (
        assemble_frame,
        emit_block_from_parse,
    )
    from lz4jpeg_tpu.native import native_available, native_backend
    from lz4jpeg_tpu.ops.lz4_fast import (
        TPU_BLOCK_LOG,
        fast_match_blocks,
        pad_blocks_fast,
    )
    from lz4jpeg_tpu.parallel.multihost import ordered_allgather_payloads

    pid, nproc = jax.process_index(), jax.process_count()
    padded, lengths = pad_blocks_fast(data, TPU_BLOCK_LOG)
    num_blocks = padded.shape[0]
    mine = list(range(pid, num_blocks, nproc))
    data_u8 = padded.astype(np.uint8)

    local_payloads: List[bytes] = []
    if mine:
        shard = jnp.asarray(data_u8[mine])
        shard_lengths = jnp.asarray(lengths[mine])
        is_match, emit_len, emit_dist = jax.device_get(
            jax.jit(fast_match_blocks)(shard, shard_lengths)
        )
        native = native_backend() if native_available() else None
        for row, bi in enumerate(mine):
            n = int(lengths[bi])
            raw = data_u8[bi, :n].tobytes()
            emit = native.emit_block if native is not None else emit_block_from_parse
            local_payloads.append(
                emit(raw, is_match[row, :n], emit_len[row, :n], emit_dist[row, :n])
            )
    payloads = ordered_allgather_payloads(local_payloads, mine, num_blocks)
    raws = [
        data_u8[bi, : int(lengths[bi])].tobytes() for bi in range(num_blocks)
    ]
    return assemble_frame(payloads, raws, len(data), TPU_BLOCK_LOG)
