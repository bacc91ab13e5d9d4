"""The JPEG-style pipeline, TPU-first.

Where the reference runs one Win32 thread per 8×8 MCU through a scalar
DCT→quant→zigzag→RLE→Huffman chain (``process``,
``Algorithms/parallel/JPEG/JPEG.c:1103-1252``), this pipeline batches *all*
MCUs of an image into (N, 8, 8) tiles and runs the whole forward chain as a
handful of fused XLA ops: one einsum pair on the MXU for the DCT, VPU
elementwise for quantization, a constant-permutation gather for zigzag, and
prefix-sum compaction for the RLE — then a host/TPU entropy stage.

Everything up to (and including) RLE is jit-compiled; the Huffman stage has
two modes (see ``ops/huffman.py``):

* ``per_block`` — parity with the reference: a tree per block per channel,
  built with the reference's exact heap quirks;
* ``shared``    — one canonical codebook per channel, serializable, with
  vectorized pack/unpack; the codebook is replicated (broadcast) across
  devices in the sharded path, mirroring the reference's shared in-memory
  tables.

The decode half inverts each stage and is also batched/jittable down to the
RLE expansion.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.ops.color import (
    chroma_subsample_422,
    rgb_to_ycbcr,
    split_mcus,
    ycbcr_to_rgb_mcus,
)
from lz4jpeg_tpu.ops.dct import dct2_batched, idct2_batched
from lz4jpeg_tpu.ops.fused import fused_forward_jnp, fused_inverse_jnp
from lz4jpeg_tpu.ops.huffman import (
    CanonicalCodebook,
    build_canonical_codebook,
    build_canonical_codebook_from_counts,
    pack_symbols,
    unpack_symbols,
)
from lz4jpeg_tpu.ops.quantize import (
    CHROMINANCE_QUANTIZATION_TABLE,
    LUMINANCE_QUANTIZATION_TABLE,
    dequantize,
    quantize,
    scale_table,
)
from lz4jpeg_tpu.ops.rle import (
    rle_decode_batched,
    rle_decode_packed16,
    rle_encode_batched,
    rle_encode_packed16,
)
from lz4jpeg_tpu.ops.zigzag import reverse_zigzag, zigzag
from lz4jpeg_tpu.oracle import jpeg_oracle

CHANNELS = ("lum", "r", "b")
_CHANNEL_SHAPES = {"lum": (8, 8), "r": (8, 4), "b": (8, 4)}

# Pad-widened plane-path gates: the padded-work / real-work ratio up to
# which the plane formulation (plus zero-pad to the Pallas kernels'
# 128-lane tile) still beats the tile fallback — measured on-chip per
# direction (profiles/profile_plane_pad.py; forward's tile path is fast,
# decode's merge_mcus is 15× slower than everything else so nearly any
# padding wins).
PLANE_PAD_MAX_FWD = 1.2
# Before the basis-folded chroma upsample, 2.0 admitted 512² (bpr
# 64→128, 2× padded work) and measured SLOWER than the tile path at
# batch (1085 vs 1727 MPix/s); with the fold the padded plane path wins
# even there (2357 vs 1725), so the gate is back to 2.0 — only widths
# narrower than 64 blocks fall through to tiles.
PLANE_PAD_MAX_INV = 2.0


def scaled_tables(quality):
    """Per-channel quant tables for a quality setting (None = reference)."""
    lum_t = scale_table(LUMINANCE_QUANTIZATION_TABLE, quality)
    chr_t = scale_table(CHROMINANCE_QUANTIZATION_TABLE, quality)
    return {"lum": lum_t, "r": chr_t, "b": chr_t}


def forward_channel(tiles, name, tables, dtype, fused):
    """One channel's MCU batch → quantized zigzag stream.

    The single source of truth for the fused-vs-staged dispatch, shared by
    the pipeline's three forward variants and the sharded path."""
    h, w = _CHANNEL_SHAPES[name]
    if fused:
        return fused_forward_jnp(tiles, tables[name], w, h, dtype)
    coeff = dct2_batched(tiles, dtype)
    q = quantize(coeff, tables[name].reshape(h, w))
    return zigzag(q, w, h)


def inverse_channel(zz, name, tables, dtype, fused):
    """One channel's zigzag stream → pixel tiles (inverse of
    ``forward_channel``)."""
    h, w = _CHANNEL_SHAPES[name]
    if fused:
        return fused_inverse_jnp(zz, tables[name], w, h, dtype)
    blocks = reverse_zigzag(zz.astype(dtype), w, h)
    deq = dequantize(blocks.reshape(-1, h, w), tables[name].reshape(h, w))
    return idct2_batched(deq, dtype)


@dataclasses.dataclass
class JPEGEncoded:
    """Encoded image: RLE streams (always) + optional entropy bitstreams."""

    height: int
    width: int
    blocks_per_col: int
    blocks_per_row: int
    # Padded (N, 2L) RLE [count, value] pairs + (N,) valid lengths.
    rle: Dict[str, np.ndarray]
    rle_lengths: Dict[str, np.ndarray]
    entropy_mode: Optional[str] = None
    # True: rle holds the packed-u16 pair layout ((count-1)<<10 | value+512,
    # one uint16 per pair, ops/rle.py) — half the tunnel bytes of the int32
    # pair layout.  Set when the quant tables bound |value| ≤ 511.
    rle_packed16: bool = False
    # shared mode: per-channel (codebook, packed bytes, bit count).
    shared_streams: Optional[Dict[str, Tuple[CanonicalCodebook, bytes, int]]] = None
    # per_block mode: per-channel list of '0'/'1' strings (parity artifact).
    per_block_bits: Optional[Dict[str, List[str]]] = None
    # Quality setting the quant tables were scaled with (None = reference
    # tables); decode must use a pipeline with the same quality.
    quality: Optional[int] = None

    @property
    def num_blocks(self) -> int:
        return self.blocks_per_col * self.blocks_per_row

    def compressed_bytes(self) -> int:
        """Size of the entropy-coded representation in bytes."""
        if self.entropy_mode == "shared":
            return sum(
                len(cb.serialize()) + len(packed)
                for cb, packed, _ in self.shared_streams.values()
            )
        if self.entropy_mode == "per_block":
            return sum(
                (len(bits) + 7) // 8
                for ch in self.per_block_bits.values()
                for bits in ch
            )
        raise ValueError("no entropy stage was run")


class JPEGPipeline:
    """Batched encode/decode with jit-compiled transform stages."""

    def __init__(self, config: JPEGConfig = JPEGConfig()):
        self._forward_rle = jax.jit(self._forward_rle_impl)
        # Bucketed two-stage forward: the cheap image→tiles stage compiles
        # per image shape, the expensive fused+RLE stage per power-of-two
        # MCU-count bucket — bounded recompiles when serving many sizes.
        self._split_stage = jax.jit(self._split_impl)
        self._mcu_forward = jax.jit(self._mcu_forward_impl)
        self._mcu_inverse = jax.jit(
            self._mcu_inverse_impl, static_argnames=("packed16",)
        )
        if config.precision == "exact" and not jax.config.jax_enable_x64:
            # Without x64, float64 silently degrades to f32 and the pipeline
            # loses coefficient-exact parity — fail loudly instead.  Exact
            # mode is the CPU verification path (TPUs have no f64 anyway);
            # use precision="fast" for the TPU compute path.
            raise RuntimeError(
                'precision="exact" requires jax_enable_x64 '
                "(jax.config.update('jax_enable_x64', True)); "
                'use precision="fast" on TPU'
            )
        self.config = config
        self._tables = scaled_tables(config.quality)
        # Packed-u16 RLE transfer layout: |quantized value| ≤
        # ⌊sqrt(HW)·128 / min(table)⌋ must fit 10 bits signed, i.e.
        # min(table) ≥ 3.  True for the reference tables (min 6 / 17);
        # extreme quality settings fall back to int16 pairs.  Halves the
        # dominant tunnel transfers (profiles/profile_roundtrip_e2e.py:
        # the RLE-pair d2h is 1.0 s of the 2.65 s 2048² round trip).
        # Fast-precision only: exact mode is the CPU verification path,
        # whose public RLE artifacts stay oracle-comparable int pairs.
        self._pack16 = (
            config.precision == "fast"
            and config.entropy == "shared"
            and all(int(np.min(t)) >= 3 for t in self._tables.values())
        )
        # RLE compaction engine for the pack16 path: on TPU the 64-lane
        # (luma) blocks run the Pallas inverse-butterfly kernel
        # (ops/pallas_rle.py, 1.47× the XLA sort at the production shape,
        # bit-identical); 32-lane chroma blocks measured at parity and
        # keep the sort, as does every non-TPU backend.
        self._pallas_rle = self._pack16 and jax.default_backend() == "tpu"
        self._forward = jax.jit(self._forward_impl)
        self._inverse = jax.jit(
            self._inverse_impl,
            static_argnames=("bpc", "bpr", "height", "width", "packed16"),
        )
        self._batch_inverse = jax.jit(
            lambda rle, lens, bpc, bpr, h, w, packed16: jax.vmap(
                lambda r, l: self._inverse_impl(
                    r, l, bpc=bpc, bpr=bpr, height=h, width=w,
                    packed16=packed16,
                )
            )(rle, lens),
            static_argnums=(2, 3, 4, 5, 6),
        )

    # ------------------------------------------------------------------
    # Jitted transform stages
    # ------------------------------------------------------------------

    def _forward_impl(self, rgb: jnp.ndarray):
        """RGB (H, W, 3) uint8 → per-channel quantized zigzag streams and
        padded RLE pairs.  Mirrors JPEG.c main():1103-1220.

        Fast mode runs the per-MCU chain as the single fused matmul of
        ``ops/fused.py`` (DCT+quant+zigzag in one MXU pass); exact mode
        keeps the staged f64 path that is oracle-exact stage by stage.
        """
        dtype = self.config.dtype
        fused = self.config.precision == "fast"
        y, cr, cb = rgb_to_ycbcr(rgb, dtype)
        cr_sub = chroma_subsample_422(cr)
        cb_sub = chroma_subsample_422(cb)
        lum, r, b = split_mcus(y, cr_sub, cb_sub)
        out = {}
        for name, tiles in (("lum", lum), ("r", r), ("b", b)):
            zz = forward_channel(tiles, name, self._tables, dtype, fused)
            pairs, lengths = rle_encode_batched(zz.astype(jnp.int16))
            out[name] = {"zz": zz, "rle": pairs, "rle_lengths": lengths}
        return out

    def _split_impl(self, rgb: jnp.ndarray):
        """Image → MCU tile batches (cheap per-shape compile)."""
        dtype = self.config.dtype
        y, cr, cb = rgb_to_ycbcr(rgb, dtype)
        return split_mcus(
            y, chroma_subsample_422(cr), chroma_subsample_422(cb)
        )

    def _mcu_forward_impl(self, lum, r, b):
        """MCU batches → per-channel RLE streams (per-bucket compile)."""
        out = {}
        dtype = self.config.dtype
        fused = self.config.precision == "fast"
        for name, tiles in (("lum", lum), ("r", r), ("b", b)):
            zz = forward_channel(tiles, name, self._tables, dtype, fused)
            if self._pack16:
                out[name] = self._rle_pack16_fn(zz.astype(jnp.int16))
            else:
                pairs, lengths = rle_encode_batched(zz.astype(jnp.int16))
                out[name] = (
                    pairs.astype(jnp.int16), lengths.astype(jnp.int32)
                )
        return out

    def encode_bucketed(self, rgb: np.ndarray, entropy: bool = True) -> "JPEGEncoded":
        """Like ``encode`` but with power-of-two MCU-count bucketing, so a
        stream of mixed image sizes triggers at most ⌈log₂ N⌉ compiles of
        the heavy stage instead of one per distinct size."""
        h, w = rgb.shape[:2]
        bpc, bpr = -(-h // 8), -(-w // 8)
        n = bpc * bpr
        lum, r, b = self._split_stage(jnp.asarray(rgb))
        bucket = 1 << (n - 1).bit_length() if n > 1 else 1
        pad = bucket - n

        def padded(tiles):
            return jnp.pad(tiles, ((0, pad), (0, 0), (0, 0)))

        streams = jax.device_get(
            self._mcu_forward(padded(lum), padded(r), padded(b))
        )
        enc = JPEGEncoded(
            height=h,
            width=w,
            blocks_per_col=bpc,
            blocks_per_row=bpr,
            rle={
                c: np.asarray(
                    streams[c][0][:n],
                    dtype=np.uint16 if self._pack16 else np.int32,
                )
                for c in CHANNELS
            },
            rle_lengths={
                c: np.asarray(streams[c][1][:n]) for c in CHANNELS
            },
            rle_packed16=self._pack16,
            quality=self.config.quality,
        )
        if entropy:
            self.entropy_encode(enc)
        return enc

    def _rle_pack16_fn(self, zz_i16: jnp.ndarray):
        """Production pack16 compaction: Pallas butterfly for 64-lane
        blocks on TPU, XLA sort-diff otherwise (bit-identical outputs)."""
        if self._pallas_rle and zz_i16.shape[-1] == 64:
            from lz4jpeg_tpu.ops.pallas_rle import rle_encode_packed16_pallas

            return rle_encode_packed16_pallas(zz_i16)
        return rle_encode_packed16(zz_i16)

    def _forward_rle_impl(self, rgb: jnp.ndarray):
        """Forward returning only what ``encode`` ships to the host: RLE
        pairs as int16 + lengths.  Host↔device bandwidth is the bottleneck
        (HBM-vs-PCIe/tunnel, SURVEY.md §7), so the zigzag intermediates stay
        on device and the pairs travel at half width — counts are ≤64 and
        quantized coefficients are bounded by ±(8·128)/min(table) ≈ ±341,
        both well inside int16."""
        if self._pack16:
            # Straight from the zz stream, skipping _forward_impl's
            # interleaved-pair RLE entirely (the pairs would be dead code;
            # computing packed16 from them instead costs ~1.1 ms/frame in
            # strided even/odd slices, see ops/rle.py).
            dtype = self.config.dtype
            fused = self.config.precision == "fast"
            y, cr, cb = rgb_to_ycbcr(rgb, dtype)
            cr_sub = chroma_subsample_422(cr)
            cb_sub = chroma_subsample_422(cb)
            h, w = rgb.shape[:2]
            plane_fwd = False
            if self._pallas_rle and h % 8 == 0 and w % 8 == 0:
                bw_real = w // 8
                pad_cols = (-bw_real) % 128
                # Pad-widened plane path: zero block-columns pad bw to the
                # kt kernel's 128-lane tile, their (64,0)-pair rows are
                # sliced back out after the RLE kernel.  Worth it only
                # while the padded work stays near the real work
                # (measured crossover: results/formulation_ab.json::
                # plane_pad_gate_round4).
                plane_fwd = (
                    (bw_real + pad_cols) / bw_real <= PLANE_PAD_MAX_FWD
                )
            if plane_fwd:
                # Plane-view forward: the fused einsum contracts straight
                # over the plane (no 8×8 tile relayout) and emits block
                # positions along the middle axis — the exact layout the
                # sublane-butterfly RLE kernel consumes, which transposes
                # back to block-row-major in VMEM.  Bit-identical to the
                # tile path (ops/fused.py docstring); shapes where a
                # channel's block-column count is not a 128 multiple fall
                # through to the tile path below.
                from lz4jpeg_tpu.ops.fused import fused_forward_plane_jnp
                from lz4jpeg_tpu.ops.pallas_rle import (
                    rle_encode_packed16_pallas_kt,
                )

                # Row padding keeps the kt kernel's grid chunking on
                # 8-multiples (its runs output tiles sublanes by 8);
                # padded rows/cols are zero blocks sliced out below.
                bh_real = h // 8
                pad_rows = (-bh_real) % 8
                out = {}
                for name, plane in (
                    ("lum", y), ("r", cr_sub), ("b", cb_sub)
                ):
                    tw = _CHANNEL_SHAPES[name][1]
                    if pad_cols or pad_rows:
                        plane = jnp.pad(
                            plane,
                            ((0, 8 * pad_rows), (0, tw * pad_cols)),
                        )
                    zz_kt = fused_forward_plane_jnp(
                        plane, self._tables[name], tw, dtype
                    )
                    packed, lengths = rle_encode_packed16_pallas_kt(
                        zz_kt.astype(jnp.int16)
                    )
                    if pad_cols or pad_rows:
                        bwp = bw_real + pad_cols
                        seg = packed.shape[-1]
                        packed = packed.reshape(-1, bwp, seg)[
                            :bh_real, :bw_real
                        ].reshape(-1, seg)
                        lengths = lengths.reshape(-1, bwp)[
                            :bh_real, :bw_real
                        ].reshape(-1)
                    out[name] = (packed, lengths.astype(jnp.int32))
                return out
            lum, r, b = split_mcus(y, cr_sub, cb_sub)
            out = {}
            for name, tiles in (("lum", lum), ("r", r), ("b", b)):
                zz = forward_channel(tiles, name, self._tables, dtype, fused)
                packed, lengths = self._rle_pack16_fn(zz.astype(jnp.int16))
                out[name] = (packed, lengths.astype(jnp.int32))
            return out
        out = self._forward_impl(rgb)
        return {
            c: (v["rle"].astype(jnp.int16), v["rle_lengths"].astype(jnp.int32))
            for c, v in out.items()
        }

    def _inverse_impl(
        self,
        rle: Dict[str, jnp.ndarray],
        rle_lengths: Dict[str, jnp.ndarray],
        *,
        bpc: int,
        bpr: int,
        height: int,
        width: int,
        packed16: bool = False,
    ) -> jnp.ndarray:
        """Padded RLE pairs → reconstructed RGB.  Mirrors the inverse chain
        JPEG.c:1348-1428.

        On TPU with the pack16 layout and ``bpr % 128 == 0`` the whole
        chain runs in PLANE view — KT-output decode butterfly → plane
        inverse einsum → plane color merge — with no per-MCU tile
        relayout anywhere (the decode mirror of the round-3 plane
        forward; ``merge_mcus`` measured 8.6 GB/s vs the 386 GB/s stream
        ceiling and dominated decode, ``results/roofline_jpeg_inverse
        .json``)."""
        dtype = self.config.dtype
        fused = self.config.precision == "fast"
        pad_cols = (-bpr) % 128
        plane_ok = (
            packed16
            and fused
            and self._pallas_rle
            and rle["lum"].shape[-2] == bpc * bpr
            and rle["lum"].shape[-1] == 64
            # Pad-widened plane decode: zero pair rows pad bpr to the
            # kernel's 128-lane tile and the wider planes crop back.  The
            # tile path's merge_mcus runs at 8.6 GB/s (roofline_jpeg_
            # inverse.json), so the plane path wins even at 2× padded
            # work; only tiny widths fall back.
            and (bpr + pad_cols) / bpr <= PLANE_PAD_MAX_INV
        )
        if plane_ok:
            from lz4jpeg_tpu.ops.color import ycbcr_planes_to_rgb
            from lz4jpeg_tpu.ops.fused import fused_inverse_plane_jnp
            from lz4jpeg_tpu.ops.pallas_rle import (
                rle_decode_packed16_pallas_plane,
            )

            bwp = bpr + pad_cols
            planes = {}
            for name in CHANNELS:
                tw = _CHANNEL_SHAPES[name][1]
                pairs = rle[name]
                if pad_cols:
                    k = pairs.shape[-1]
                    pairs = jnp.pad(
                        pairs.reshape(bpc, bpr, k),
                        ((0, 0), (0, pad_cols), (0, 0)),
                    ).reshape(bpc * bwp, k)
                zz_kt = rle_decode_packed16_pallas_plane(pairs, bwp)
                plane = fused_inverse_plane_jnp(
                    zz_kt, self._tables[name], tw, dtype,
                    # Chroma: fold the 4:2:2 upsample into the basis —
                    # the MXU emits both pixels of a sample and the
                    # color merge never pays the lane-interleave repeat
                    # (106 → 56 ms end to end at 2048²×64, bit-equal).
                    upsample_cols=(name != "lum"),
                )
                # Materialization barrier: letting XLA fuse the inverse
                # einsum into the color merge costs +32% end to end
                # (measured; the einsum gets re-planned around its
                # consumers' layouts).
                (plane,) = jax.lax.optimization_barrier((plane,))
                planes[name] = plane
            return ycbcr_planes_to_rgb(
                planes["lum"], planes["r"], planes["b"],
                height, width, dtype, chroma_upsampled=True,
            )
        rec = {}
        for name in CHANNELS:
            h, w = _CHANNEL_SHAPES[name]
            zz = self._rle_decode_fn(
                rle[name], rle_lengths[name], h * w, packed16
            )
            rec[name] = inverse_channel(zz, name, self._tables, dtype, fused)
        return ycbcr_to_rgb_mcus(
            rec["lum"], rec["r"], rec["b"], bpc, bpr, height, width, dtype
        )

    def _rle_decode_fn(self, pairs, lengths, out_size: int, packed16: bool):
        """Production RLE expansion: the Pallas expansion butterfly on TPU
        for aligned packed16 shapes (3.2×/1.5× the membership einsum on
        luma/chroma, bit-identical — results/pallas_ab.json round 3), the
        XLA membership einsum otherwise."""
        if not packed16:
            return rle_decode_batched(pairs, lengths, out_size)
        if (
            self._pallas_rle
            and pairs.shape[-1] == out_size
            and pairs.shape[-2] % 128 == 0
        ):
            from lz4jpeg_tpu.ops.pallas_rle import rle_decode_packed16_pallas

            return rle_decode_packed16_pallas(pairs, lengths, out_size)
        return rle_decode_packed16(pairs, lengths, out_size)

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def encode(self, rgb: np.ndarray, entropy: Optional[bool] = True) -> JPEGEncoded:
        h, w = rgb.shape[:2]
        bpc, bpr = -(-h // 8), -(-w // 8)
        slim = jax.device_get(self._forward_rle(jnp.asarray(rgb)))
        enc = JPEGEncoded(
            height=h,
            width=w,
            blocks_per_col=bpc,
            blocks_per_row=bpr,
            rle={
                c: np.asarray(
                    slim[c][0],
                    dtype=np.uint16 if self._pack16 else np.int32,
                )
                for c in CHANNELS
            },
            rle_lengths={c: np.asarray(slim[c][1]) for c in CHANNELS},
            rle_packed16=self._pack16,
            quality=self.config.quality,
        )
        if entropy:
            self.entropy_encode(enc)
        return enc

    def encode_batch(
        self, rgbs: np.ndarray, entropy: Optional[bool] = True
    ) -> List["JPEGEncoded"]:
        """Encode a (B, H, W, 3) batch of same-size images in one dispatch.

        The batch axis vmaps over the jitted forward — one device round
        trip for the whole batch, which is what amortizes dispatch latency
        in serving (see bench.py's 16-frame batches)."""
        b, h, w = rgbs.shape[:3]
        bpc, bpr = -(-h // 8), -(-w // 8)
        slim = jax.device_get(
            jax.vmap(self._forward_rle)(jnp.asarray(rgbs))
        )
        out = []
        for i in range(b):
            enc = JPEGEncoded(
                height=h,
                width=w,
                blocks_per_col=bpc,
                blocks_per_row=bpr,
                rle={
                    c: np.asarray(
                        slim[c][0][i],
                        dtype=np.uint16 if self._pack16 else np.int32,
                    )
                    for c in CHANNELS
                },
                rle_lengths={c: np.asarray(slim[c][1][i]) for c in CHANNELS},
                rle_packed16=self._pack16,
                quality=self.config.quality,
            )
            if entropy:
                self.entropy_encode(enc)
            out.append(enc)
        return out

    def warmup(self, shapes: List[Tuple[int, int]]) -> None:
        """Pre-compile the forward path for the given (H, W) image shapes
        (serving cold-start control; pairs with the persistent XLA
        compilation cache)."""
        for h, w in shapes:
            dummy = jnp.zeros((h, w, 3), jnp.uint8)
            jax.block_until_ready(self._forward_rle(dummy))

    def entropy_encode(self, enc: JPEGEncoded) -> JPEGEncoded:
        mode = self.config.entropy
        enc.entropy_mode = mode
        if mode == "shared":
            from lz4jpeg_tpu.native import native_available, native_backend

            native = native_backend() if native_available() else None
            enc.shared_streams = {}
            for c in CHANNELS:
                if native is not None:
                    # Two C++ passes over the padded pairs (histogram, then
                    # map+pack) — the numpy mask-compact + np.unique route
                    # below costs seconds per channel on a throttled host.
                    # The packed-u16 layout is consumed directly (the int32
                    # pairs never materialize on the host).
                    offset = 2048  # symbols are counts ≤128 or coeffs |v|<2047
                    hist = (
                        native.rle_symbol_hist16
                        if enc.rle_packed16
                        else native.rle_symbol_hist
                    )
                    counts, _ = hist(
                        enc.rle[c], enc.rle_lengths[c], offset, 2 * offset
                    )
                    (bins,) = np.nonzero(counts)
                    codebook = build_canonical_codebook_from_counts(
                        bins.astype(np.int64) - offset, counts[bins]
                    )
                    pack = (
                        native.huff_pack_pairs16
                        if enc.rle_packed16
                        else native.huff_pack_pairs
                    )
                    packed, nbits = pack(
                        enc.rle[c], enc.rle_lengths[c], codebook
                    )
                else:
                    pairs = (
                        _unpack16_host(enc.rle[c])
                        if enc.rle_packed16
                        else enc.rle[c]
                    )
                    symbols = _valid_symbols(pairs, enc.rle_lengths[c])
                    codebook = build_canonical_codebook(symbols)
                    packed, nbits = pack_symbols(symbols, codebook)
                enc.shared_streams[c] = (codebook, packed, nbits)
        else:  # per_block parity mode
            from lz4jpeg_tpu.native import native_available, native_backend

            native = native_backend() if native_available() else None
            enc.per_block_bits = {}
            for c in CHANNELS:
                bits_list = None
                if native is not None:
                    # One C++ pass over all blocks (quirk-exact twin of the
                    # oracle heap; tested bitstring-identical) — the Python
                    # loop below runs the interpreted heap ~49k times at
                    # 2048² and cannot reach the reference's largest sizes.
                    bits_list = native.huff_per_block(
                        np.asarray(enc.rle[c], np.int32),
                        np.asarray(enc.rle_lengths[c], np.int32),
                    )
                if bits_list is None:
                    bits_list = []
                    for i in range(enc.num_blocks):
                        n = int(enc.rle_lengths[c][i])
                        rle_ints = [int(v) for v in enc.rle[c][i, :n]]
                        bits, _root, _codes = (
                            jpeg_oracle.encode_huffman_oracle(rle_ints)
                        )
                        bits_list.append(bits)
                enc.per_block_bits[c] = bits_list
        return enc

    def entropy_decode(self, enc: JPEGEncoded) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        """Recover padded RLE pairs from the entropy bitstreams."""
        if enc.entropy_mode == "shared":
            from lz4jpeg_tpu.native import native_available, native_backend

            native = native_backend() if native_available() else None
            rle, lengths = {}, {}
            for c in CHANNELS:
                codebook, packed, nbits = enc.shared_streams[c]
                pad_width = enc.rle[c].shape[1]
                block_size = _CHANNEL_SHAPES[c][0] * _CHANNEL_SHAPES[c][1]
                got = None
                if native is not None and enc.rle_packed16:
                    got = native.huff_unpack_pairs16(
                        packed, nbits, codebook,
                        block_size, enc.num_blocks, pad_width,
                    )
                elif native is not None:
                    got = native.huff_unpack_pairs(
                        packed, nbits, codebook,
                        block_size, enc.num_blocks, pad_width,
                    )
                if got is None:
                    # Pure-Python spec path; also the quirk-compatible
                    # handler for streams the strict native walker rejects.
                    symbols = unpack_symbols(packed, nbits, codebook)
                    sym_pad = (
                        2 * pad_width if enc.rle_packed16 else pad_width
                    )
                    pairs, lens = _split_symbols(
                        symbols, enc.num_blocks, sym_pad, block_size
                    )
                    got = (
                        (_pack16_host(pairs), lens)
                        if enc.rle_packed16
                        else (pairs, lens)
                    )
                rle[c], lengths[c] = got
            return rle, lengths
        if enc.entropy_mode == "per_block":
            # Per-block trees are in-memory only (like the reference, which
            # never serializes them, SURVEY.md §2.2.8) — the RLE arrays on
            # ``enc`` are authoritative.
            return enc.rle, enc.rle_lengths
        return enc.rle, enc.rle_lengths

    def decode(self, enc: JPEGEncoded, from_entropy: bool = True) -> np.ndarray:
        if from_entropy and enc.entropy_mode is not None:
            rle, lengths = self.entropy_decode(enc)
        else:
            rle, lengths = enc.rle, enc.rle_lengths
        rgb = self._inverse(
            {c: jnp.asarray(rle[c]) for c in CHANNELS},
            {c: jnp.asarray(lengths[c]) for c in CHANNELS},
            bpc=enc.blocks_per_col,
            bpr=enc.blocks_per_row,
            height=enc.height,
            width=enc.width,
            packed16=enc.rle_packed16,
        )
        return np.asarray(jax.device_get(rgb))

    def decode_batch(
        self, encs: List["JPEGEncoded"], from_entropy: bool = True
    ) -> List[np.ndarray]:
        """Decode same-size encodes in one vmapped dispatch (the inverse
        of ``encode_batch`` — one device round trip for the whole batch)."""
        if not encs:
            return []
        e0 = encs[0]
        key = (e0.height, e0.width, e0.rle_packed16)
        for e in encs[1:]:
            if (e.height, e.width, e.rle_packed16) != key:
                raise ValueError(
                    "decode_batch requires same-size encodes with one RLE "
                    "layout; decode() them individually instead"
                )
        streams = []
        for e in encs:
            if from_entropy and e.entropy_mode is not None:
                streams.append(self.entropy_decode(e))
            else:
                streams.append((e.rle, e.rle_lengths))
        rle_b = {
            c: jnp.asarray(np.stack([s[0][c] for s in streams]))
            for c in CHANNELS
        }
        len_b = {
            c: jnp.asarray(np.stack([s[1][c] for s in streams]))
            for c in CHANNELS
        }
        rgb = self._batch_inverse(
            rle_b, len_b, e0.blocks_per_col, e0.blocks_per_row,
            e0.height, e0.width, e0.rle_packed16,
        )
        rgb = np.asarray(jax.device_get(rgb))
        return [rgb[i] for i in range(len(encs))]

    def _mcu_inverse_impl(self, rle, rle_lengths, packed16: bool = False):
        """Padded RLE → per-channel pixel tiles (per-bucket compile)."""
        dtype = self.config.dtype
        fused = self.config.precision == "fast"
        rec = {}
        for name in CHANNELS:
            h, w = _CHANNEL_SHAPES[name]
            zz = self._rle_decode_fn(
                rle[name], rle_lengths[name], h * w, packed16
            )
            rec[name] = inverse_channel(zz, name, self._tables, dtype, fused)
        return rec

    def decode_bucketed(
        self, enc: JPEGEncoded, from_entropy: bool = True
    ) -> np.ndarray:
        """Like ``decode`` but the heavy MCU inverse compiles per
        power-of-two MCU bucket (see ``encode_bucketed``)."""
        if from_entropy and enc.entropy_mode is not None:
            rle, lengths = self.entropy_decode(enc)
        else:
            rle, lengths = enc.rle, enc.rle_lengths
        n = enc.num_blocks
        bucket = 1 << (n - 1).bit_length() if n > 1 else 1
        pad = bucket - n
        rle_j = {
            c: jnp.pad(jnp.asarray(rle[c]), ((0, pad), (0, 0)))
            for c in CHANNELS
        }
        len_j = {
            c: jnp.pad(jnp.asarray(lengths[c]), (0, pad)) for c in CHANNELS
        }
        rec = self._mcu_inverse(rle_j, len_j, packed16=enc.rle_packed16)
        rgb = ycbcr_to_rgb_mcus(
            rec["lum"][:n], rec["r"][:n], rec["b"][:n],
            enc.blocks_per_col, enc.blocks_per_row, enc.height, enc.width,
            self.config.dtype,
        )
        return np.asarray(jax.device_get(rgb))

    def roundtrip(self, rgb: np.ndarray) -> np.ndarray:
        """Full encode→decode, the reference's self-verification pattern
        (SURVEY.md §4)."""
        return self.decode(self.encode(rgb))

    def forward_stages(self, rgb: np.ndarray) -> Dict[str, Dict[str, np.ndarray]]:
        """All jitted forward intermediates (for stage-by-stage parity
        tests against the oracle)."""
        return jax.device_get(self._forward(jnp.asarray(rgb)))


def _unpack16_host(packed: np.ndarray) -> np.ndarray:
    """(N, L) packed uint16 → (N, 2L) interleaved int32 pairs (numpy,
    fallback paths only — the native passes consume packed directly)."""
    p = packed.astype(np.int32)
    out = np.empty((p.shape[0], 2 * p.shape[1]), np.int32)
    out[:, 0::2] = (p >> 10) + 1
    out[:, 1::2] = (p & 0x3FF) - 512
    return out


def _pack16_host(pairs: np.ndarray) -> np.ndarray:
    """(N, 2L) interleaved int32 pairs → (N, L) packed uint16 (padding
    slots stay 0, mirroring ``ops.rle.pack16_pairs``)."""
    counts = pairs[:, 0::2].astype(np.int32)
    vals = pairs[:, 1::2].astype(np.int32)
    packed = (np.maximum(counts - 1, 0) << 10) | (vals + 512)
    return np.where(counts > 0, packed, 0).astype(np.uint16)


def _valid_symbols(pairs: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flatten padded (N, 2L) RLE pairs into one symbol stream."""
    mask = np.arange(pairs.shape[1])[None, :] < lengths[:, None]
    return pairs[mask].astype(np.int32)


def _split_symbols(
    symbols: np.ndarray, num_blocks: int, pad_width: int, block_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Re-block a flat symbol stream: each block's pairs end once their
    counts sum to ``block_size`` (RLE of a full block always covers it).
    Fully vectorized: ``block_of_pair`` is nondecreasing, so block
    boundaries come from two searchsorteds and the scatter targets from a
    running offset."""
    pairs = np.zeros((num_blocks, pad_width), np.int32)
    lengths = np.zeros(num_blocks, np.int32)
    counts = symbols[0::2].astype(np.int64)
    values = symbols[1::2].astype(np.int64)
    ends = np.cumsum(counts)
    # Pair j belongs to block (ends[j]-1) // block_size.
    block_of_pair = (ends - 1) // block_size
    starts = np.searchsorted(block_of_pair, np.arange(num_blocks), "left")
    stops = np.searchsorted(block_of_pair, np.arange(num_blocks), "right")
    lengths[:] = 2 * (stops - starts)
    slot = np.arange(len(counts)) - starts[block_of_pair]
    flat_idx = block_of_pair * pad_width + 2 * slot
    pairs.reshape(-1)[flat_idx] = counts
    pairs.reshape(-1)[flat_idx + 1] = values
    return pairs, lengths


@functools.lru_cache(maxsize=None)
def default_pipeline(precision: str = "fast", entropy: str = "shared") -> JPEGPipeline:
    return JPEGPipeline(JPEGConfig(precision=precision, entropy=entropy))
