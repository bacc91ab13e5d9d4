"""Sharded JPEG forward: the MCU axis distributed over the device mesh.

The reference spawns one thread per 8×8 MCU, each running the whole
DCT→quant→zigzag→RLE chain (``process``,
``Algorithms/parallel/JPEG/JPEG.c:1103-1252``), then gathers by index — and
loses the results to a pass-by-value bug (:1300).  Here the MCU batch is a
sharded array: ``jit`` with sharding constraints lets XLA partition the
batched einsum/VPU kernels across devices, and the "gather" is simply the
output sharding — order is positional, a bug of this class cannot exist.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import (
    forward_channel,
    inverse_channel,
    scaled_tables,
)
from lz4jpeg_tpu.ops.color import chroma_subsample_422, rgb_to_ycbcr, split_mcus
from lz4jpeg_tpu.ops.rle import rle_encode_batched
from lz4jpeg_tpu.parallel.mesh import pad_to_devices

_CHANNEL_SHAPES = {"lum": (8, 8), "r": (8, 4), "b": (8, 4)}


class ShardedJPEGForward:
    """Forward transform with the MCU axis sharded over a mesh.

    The color transform + MCU split run replicated (cheap, bandwidth-bound,
    and dependent on full image rows); the per-MCU compute — DCT matmuls,
    quantization, zigzag gather, RLE compaction — runs sharded.  Quant
    tables are replicated constants (the reference's shared in-memory
    tables, SURVEY.md §2.3).
    """

    def __init__(self, mesh: Mesh, config: JPEGConfig = JPEGConfig()):
        self.mesh = mesh
        self.config = config
        self._tables = scaled_tables(config.quality)
        axis = mesh.axis_names[0]
        self._shard = NamedSharding(mesh, P(axis))
        self._mcu_stage = jax.jit(
            self._mcu_stage_impl,
            in_shardings=(self._shard, self._shard, self._shard),
            out_shardings=self._shard,
        )

    def _mcu_stage_impl(self, lum, r, b):
        dtype = self.config.dtype
        fused = self.config.precision == "fast"
        out = {}
        for name, tiles in (("lum", lum), ("r", r), ("b", b)):
            zz = forward_channel(tiles, name, self._tables, dtype, fused)
            pairs, lengths = rle_encode_batched(zz.astype(jnp.int32))
            out[name] = {"zz": zz, "rle": pairs, "rle_lengths": lengths}
        return out

    def inverse(
        self,
        rle: Dict[str, np.ndarray],
        rle_lengths: Dict[str, np.ndarray],
        bpc: int,
        bpr: int,
        height: int,
        width: int,
    ) -> np.ndarray:
        """Sharded inverse chain: RLE → IDCT per MCU shard, then merge.

        The reference's parallel variant runs the whole inverse per MCU
        thread too (``process``, Algorithms/parallel/JPEG/JPEG.c:1103-1252)
        — and then loses the results to its by-value bug; here the shard is
        the unit and the merge is the output sharding."""
        from lz4jpeg_tpu.ops.color import ycbcr_to_rgb_mcus
        from lz4jpeg_tpu.ops.rle import rle_decode_batched

        dtype = self.config.dtype
        fused = self.config.precision == "fast"
        n_dev = self.mesh.devices.size
        n_mcus = bpc * bpr

        def stage(rle_j, len_j):
            rec = {}
            for name in ("lum", "r", "b"):
                h, w = _CHANNEL_SHAPES[name]
                zz = rle_decode_batched(rle_j[name], len_j[name], h * w)
                rec[name] = inverse_channel(
                    zz, name, self._tables, dtype, fused
                )
            return rec

        padded_rle, padded_len = {}, {}
        for c in ("lum", "r", "b"):
            padded_rle[c], _ = pad_to_devices(np.asarray(rle[c]), n_dev)
            padded_len[c], _ = pad_to_devices(np.asarray(rle_lengths[c]), n_dev)
        put = functools.partial(jax.device_put, device=self._shard)
        rec = jax.jit(
            stage,
            in_shardings=(self._shard, self._shard),
            out_shardings=self._shard,
        )(
            {c: put(v) for c, v in padded_rle.items()},
            {c: put(v) for c, v in padded_len.items()},
        )
        rec = jax.device_get(rec)
        return np.asarray(
            ycbcr_to_rgb_mcus(
                jnp.asarray(rec["lum"][:n_mcus]),
                jnp.asarray(rec["r"][:n_mcus]),
                jnp.asarray(rec["b"][:n_mcus]),
                bpc, bpr, height, width, dtype,
            )
        )

    def __call__(self, rgb: np.ndarray) -> Tuple[Dict[str, Dict[str, np.ndarray]], int]:
        """RGB image → per-channel sharded forward results.

        Returns ``(stages, num_mcus)`` with padding rows (beyond
        ``num_mcus``) still present in the arrays.
        """
        y, cr, cb = rgb_to_ycbcr(jnp.asarray(rgb), self.config.dtype)
        lum, r, b = split_mcus(
            y, chroma_subsample_422(cr), chroma_subsample_422(cb)
        )
        n_dev = self.mesh.devices.size
        lum, n = pad_to_devices(np.asarray(lum), n_dev)
        r, _ = pad_to_devices(np.asarray(r), n_dev)
        b, _ = pad_to_devices(np.asarray(b), n_dev)
        put = functools.partial(jax.device_put, device=self._shard)
        stages = self._mcu_stage(put(lum), put(r), put(b))
        return jax.device_get(stages), n
