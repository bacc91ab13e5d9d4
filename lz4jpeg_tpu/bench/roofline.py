"""Per-stage roofline / MFU breakdown of the JPEG forward pipeline.

Answers "which stage limits the headline number and how far is it from
speed of light" with a committed artifact (``results/roofline_jpeg_forward
.json``) instead of a docstring claim — the framework's analogue of the
reference's per-size timing tables (``Experiment/results/*.json``).

Methodology
-----------
Each stage is chained CHAIN times inside one jit via ``lax.fori_loop``
with a data-dependent carry so executions serialize, then fenced once by
a scalar readback — per-iteration time excludes the ~24 ms host↔device
tunnel RTT of this platform (see ``utils/profiling.py``).  Per stage we
state the *algorithmic* FLOPs and HBM bytes (inputs read once + outputs
written once; internal passes XLA may add, e.g. the RLE sort's network,
only lower the achieved fraction) and compare against chip peaks:

* HBM: 819 GB/s (TPU v5e).
* MXU: 197 bf16 TFLOP/s (TPU v5e); f32 matmuls run as multi-pass bf16 so
  MFU is reported against the bf16 peak (conservative).

``speed_of_light_s = max(bytes/BW_peak, flops/FLOP_peak)`` and
``sol_fraction = speed_of_light_s / measured_s``.

The readback stage (device→host of the int16 RLE pairs) is timed
separately and RTT-inclusive — it is a real serving cost, but on this
tunnel (~20-40 MB/s d2h) it is two orders of magnitude off a production
PCIe link, which is why ``encode()`` ships the half-width int16 slim
representation and nothing else.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional

import numpy as np

HBM_PEAK_GBS = 819.0  # TPU v5e
MXU_PEAK_TFLOPS = 197.0  # TPU v5e bf16
LANES_FOR_STREAM = 512  # wide rows so the stream probe trivially saturates


def _make_chained(body, chain: int):
    import jax
    import jax.numpy as jnp

    def chained(x, c0):
        def step(_, carry):
            c, s = carry
            return body(x, c, s)

        _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
        return s

    return jax.jit(chained)


def _chain_bench(body, data, chain: int, runs: int = 4) -> float:
    """Best per-iteration seconds of ``body(x, carry, acc) -> (carry', acc')``
    chained ``chain`` times in one fenced dispatch."""
    import jax.numpy as jnp

    f = _make_chained(body, chain)
    float(f(data, jnp.int16(0)))  # compile + warm
    best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        float(f(data, jnp.int16(0)))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def _assert_fence_forces_compaction(body, data, chain: int) -> None:
    """Anti-DCE regression guard (the round-2 fence-audit lesson, encoded).

    A fence that reduces only the RLE *lengths* lets XLA dead-code-
    eliminate the whole compaction — the sort (or the Pallas butterfly
    kernel) simply vanishes from the compiled HLO, and the benchmark
    silently reports a ~2× hollow number (results/formulation_ab.json::
    fence_dce_and_rle_round2b).  This guard compiles the exact chained
    function the bench times and fails loudly unless the compaction op is
    still present.
    """
    import jax.numpy as jnp

    f = _make_chained(body, chain)
    hlo = f.lower(data, jnp.int16(0)).compile().as_text()
    n_sorts = hlo.count(" sort(") + hlo.count("=sort(")
    n_custom = hlo.count("custom-call")
    if n_sorts + n_custom == 0:
        raise RuntimeError(
            "DCE guard: the compiled RLE chain contains no sort and no "
            "custom-call — the fence no longer forces the compaction and "
            "every number this bench would print is hollow.  Fix the "
            "fence (reduce the FULL packed output, not just lengths)."
        )


def measure_hbm_stream_ceiling(
    footprint_bytes: int = 512 << 20,
    chain: int = 32,
    runs: int = 4,
) -> Dict:
    """Measured achievable HBM bandwidth at the production footprint.

    The paper peak (819 GB/s, TPU v5e) is not what a real kernel can
    sustain through XLA on this tunnel-attached chip; every roofline
    ``sol_fraction`` divides by the paper number and self-flagellates if
    the practical ceiling is lower (VERDICT r3 missing-item 1).  This
    probe times bare streaming loops — the cheapest possible kernels —
    fully fenced with the array itself as the ``fori_loop`` carry so every
    iteration must materialize its output to HBM:

    * ``stream_f32``: c' = c·a + b            — read N + write N per iter
    * ``triad_f32``:  c' = c + x·(1 + i)      — read 2N + write N
    * ``stream_u8``:  c' = c + 1 (int8)       — read N + write N

    The reported ceiling is the max achieved GB/s across variants; a value
    above the paper peak would prove the fence collapsed (asserted).
    """
    import jax
    import jax.numpy as jnp

    n_f32 = footprint_bytes // 4
    rows = n_f32 // LANES_FOR_STREAM
    rng = np.random.default_rng(7)
    x32 = jnp.asarray(
        rng.standard_normal((rows, LANES_FOR_STREAM)).astype(np.float32)
    )
    x8 = jnp.asarray(
        rng.integers(-100, 100, size=(4 * rows, LANES_FOR_STREAM)).astype(
            np.int8
        )
    )

    def bench(step, x0, aux, nbytes_per_iter):
        # aux rides as a jit ARGUMENT — a closure capture would inline a
        # footprint-sized constant into the HLO (too large for the remote
        # compile service, and wrong for caching).
        def chained(c0, a):
            c = jax.lax.fori_loop(0, chain, lambda i, c: step(i, c, a), c0)
            return jnp.sum(c.astype(jnp.float32))

        f = jax.jit(chained)
        float(f(x0, aux))  # compile + warm
        best = 1e9
        for _ in range(runs):
            t0 = time.perf_counter()
            float(f(x0, aux))
            best = min(best, time.perf_counter() - t0)
        per_iter = best / chain
        return {
            "measured_s": per_iter,
            "bytes": nbytes_per_iter,
            "achieved_gbs": nbytes_per_iter / per_iter / 1e9,
        }

    zero = jnp.zeros((1, 1), jnp.float32)
    out = {
        "footprint_bytes": footprint_bytes,
        "chain": chain,
        "variants": {},
    }
    out["variants"]["stream_f32"] = bench(
        lambda i, c, a: c * jnp.float32(1.000001) + jnp.float32(0.5),
        x32,
        zero,
        2 * footprint_bytes,
    )
    out["variants"]["triad_f32"] = bench(
        lambda i, c, a: c + a * (jnp.float32(1.0) + i.astype(jnp.float32)),
        x32,
        x32,
        3 * footprint_bytes,
    )
    out["variants"]["stream_u8"] = bench(
        lambda i, c, a: c + jnp.int8(1), x8, zero, 2 * footprint_bytes
    )
    ceiling = max(v["achieved_gbs"] for v in out["variants"].values())
    assert ceiling <= HBM_PEAK_GBS * 1.05, (
        f"stream probe reports {ceiling:.0f} GB/s > paper peak "
        f"{HBM_PEAK_GBS} — the fence collapsed; fix the probe"
    )
    out["ceiling_gbs"] = ceiling
    return out


def run_jpeg_forward_roofline(
    size: int = 2048,
    batch: int = 32,
    chain: int = 8,
    output: Optional[str] = None,
) -> Dict:
    """Stage-by-stage fenced roofline of the ROUND-5 production forward:
    Stage A (RGB → kt block-layout transpose, XLA) → megakernel (color +
    DCT + sparse-delta RLE in one Pallas VMEM pass, ``ops/pallas_fwd``).
    The retired XLA fallback chain (color → tile einsums → sparse
    epilogue) is measured alongside as the committed formulation
    comparison; the lax.sort formulation and both Pallas RLE butterflies
    left the production path entirely (the sparse16 layout needs no
    compaction), so there is no sort ceiling to report anymore.
    """
    import jax
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import JPEGPipeline
    from lz4jpeg_tpu.ops.pallas_fwd import forward_megakernel, rgb_to_kt
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    assert pipeline._sparse16, "forward roofline measures the sparse16 path"
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
    )
    npix = batch * size * size  # pixels per chain iteration
    lum_t, chr_t = pipeline._tables["lum"], pipeline._tables["r"]

    stages: Dict[str, Dict] = {}

    # -- stage A: RGB → (3, 64, N) kt block layout (pure XLA transpose) --
    def stage_a_body(x, c, s):
        kt = rgb_to_kt(x + c.astype(jnp.uint8))
        # Full fence: partial checksums slice through transposes.
        s = s + jnp.sum(kt.astype(jnp.float32))
        # Sum-derived carry: extracting a single element mid-loop
        # forces a pathological layout (+14 ms measured A/B); the sum
        # depends on every output, so serialization is identical.
        return (s.astype(jnp.int32) % 2).astype(jnp.int16), s

    print("timing stage_a_kt ...", flush=True)
    stages["stage_a_kt"] = {
        "measured_s": _chain_bench(stage_a_body, imgs, chain),
        "flops": 0,
        "bytes": 3 * npix + 3 * npix,  # RGB u8 in, planar kt u8 out
    }

    kt0 = jax.jit(rgb_to_kt)(imgs)
    jax.block_until_ready(kt0)

    # -- megakernel: kt u8 → (N, 128) u16 combined sparse streams --------
    def mega_body(kt, c, s):
        out = forward_megakernel(kt + c.astype(jnp.uint8), lum_t, chr_t)
        s = s + jnp.sum(out.astype(jnp.float32))
        return (s.astype(jnp.int32) % 2).astype(jnp.int16), s

    print("timing megakernel ...", flush=True)
    stages["megakernel"] = {
        "measured_s": _chain_bench(mega_body, kt0, chain),
        # Color (10/px) + the two basis matmuls: luma npix coeffs and
        # chroma npix coeffs (2 half-width channels), BOTH contracting 64
        # (the 4:2:2 fold widens the chroma basis to (32, 64)).
        "flops": 10 * npix + 2 * 64 * npix + 2 * 64 * npix,
        "bytes": 3 * npix + 4 * npix,  # kt u8 in, combined u16 out
        "note": (
            "Pallas VMEM copies cap at ~155 GB/s on this chip vs ~300 "
            "for XLA streams (profiles/probe_pallas_copy_ceiling.py) — "
            "the honest kernel-side stream ceiling is ~half the mSoL "
            "denominator"
        ),
    }

    # -- whole production chain (what bench.py times) ---------------------
    fwd = jax.vmap(pipeline._forward_rle_impl)

    def full_body(x, c, s):
        out = fwd(x + c.astype(jnp.uint8))
        s = s + jnp.sum(out.astype(jnp.float32))
        return (s.astype(jnp.int32) % 2).astype(jnp.int16), s

    print("timing full_forward ...", flush=True)
    stages["full_forward"] = {
        "measured_s": _chain_bench(full_body, imgs, chain),
        "flops": sum(stages[k]["flops"] for k in ("stage_a_kt", "megakernel")),
        # RGB u8 in, combined u16 out; the kt intermediate between the
        # stages is real HBM traffic and is charged to the stage table,
        # not the chain's algorithmic I/O.
        "bytes": 3 * npix + 4 * npix,
    }

    # Anti-DCE guard (round-2 lesson, round-5 shape): on TPU the compiled
    # production chain must contain the megakernel custom-call; a fence
    # that stopped forcing it would report hollow numbers.
    f = _make_chained(full_body, chain)
    hlo = f.lower(imgs, jnp.int16(0)).compile().as_text()
    if jax.default_backend() == "tpu" and hlo.count("custom-call") == 0:
        raise RuntimeError(
            "DCE guard: compiled forward chain contains no megakernel "
            "custom-call — the fence collapsed; numbers would be hollow."
        )

    # -- retired XLA fallback chain (formulation comparison) --------------
    alt = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    alt._megakernel = False
    alt_fwd = jax.vmap(alt._forward_rle_impl)

    def alt_body(x, c, s):
        out = alt_fwd(x + c.astype(jnp.uint8))
        s = s + jnp.sum(out.astype(jnp.float32))
        return (s.astype(jnp.int32) % 2).astype(jnp.int16), s

    print("timing xla_fallback_chain ...", flush=True)
    stages["xla_fallback_chain"] = {
        "measured_s": _chain_bench(alt_body, imgs, chain),
        "flops": stages["full_forward"]["flops"],
        "bytes": stages["full_forward"]["bytes"],
        "note": (
            "color → tile einsums → sparse epilogue, all XLA — the "
            "bit-identical fallback the megakernel replaced on TPU"
        ),
    }

    # -- device→host readback of the combined sparse buffer ---------------
    slim = jax.jit(fwd)(imgs)
    jax.block_until_ready(slim)
    d2h_bytes = int(np.prod(slim.shape)) * 2
    t0 = time.perf_counter()
    jax.device_get(slim)
    d2h_s = time.perf_counter() - t0
    stages["readback_d2h"] = {
        "measured_s": d2h_s,
        "flops": 0,
        "bytes": d2h_bytes,
        "note": "tunnel d2h, RTT-inclusive; not part of the device chain",
    }

    # -- fence floor: the xor-perturb + checksum traffic every stage body
    # pays per iteration (the inverse roofline's round-4 convention).
    def floor_body(x, c, s):
        (xp,) = jax.lax.optimization_barrier((x + c.astype(jnp.uint8),))
        s = s + jnp.sum(xp.astype(jnp.float32))
        return (s.astype(jnp.int32) % 2).astype(jnp.int16), s

    print("timing fence_floor ...", flush=True)
    floor_s = _chain_bench(floor_body, imgs, chain)

    # -- measured HBM-stream ceiling (the platform's real bandwidth) ------
    print("timing hbm_stream ceiling ...", flush=True)
    hbm_probe = measure_hbm_stream_ceiling(
        footprint_bytes=min(512 << 20, 4 * npix), chain=16
    )
    hbm_measured_gbs = hbm_probe["ceiling_gbs"]

    # -- roofline arithmetic ----------------------------------------------
    for name, st in stages.items():
        t = st["measured_s"]
        st["achieved_gbs"] = st["bytes"] / t / 1e9
        st["achieved_tflops"] = st["flops"] / t / 1e12
        if name == "readback_d2h":
            st["speed_of_light_s"] = None
            st["sol_fraction"] = None
            continue
        sol = max(
            st["bytes"] / (HBM_PEAK_GBS * 1e9),
            st["flops"] / (MXU_PEAK_TFLOPS * 1e12),
        )
        st["speed_of_light_s"] = sol
        st["sol_fraction"] = sol / t
        sol_m = max(
            st["bytes"] / (hbm_measured_gbs * 1e9),
            st["flops"] / (MXU_PEAK_TFLOPS * 1e12),
        )
        st["sol_fraction_measured"] = sol_m / t
        st["bound"] = (
            "memory"
            if st["bytes"] / (HBM_PEAK_GBS * 1e9)
            >= st["flops"] / (MXU_PEAK_TFLOPS * 1e12)
            else "compute"
        )

    device_stages = ("stage_a_kt", "megakernel")
    stage_sum = sum(stages[k]["measured_s"] for k in device_stages)
    limiter = max(device_stages, key=lambda k: stages[k]["measured_s"])
    result = {
        "size": size,
        "batch": batch,
        "chain": chain,
        "backend": jax.default_backend(),
        "formulation": "sparse16_megakernel",
        "peaks": {
            "hbm_gbs": HBM_PEAK_GBS,
            "hbm_gbs_measured": hbm_measured_gbs,
            "mxu_bf16_tflops": MXU_PEAK_TFLOPS,
        },
        "hbm_stream_ceiling": hbm_probe,
        "mpix_per_iter": npix / 1e6,
        "fence_floor": {
            "measured_s": floor_s,
            "note": (
                "per-iteration input xor-perturb + checksum (barriered); "
                "embedded in every stage's measured_s — subtract for "
                "kernel-marginal comparisons (bench.py's headline has no "
                "perturb, which is most of its gap to full_forward here)"
            ),
        },
        "fencing_note": (
            "every stage fence reduces the stage's FULL output — a "
            "partial fence lets XLA dead-code-eliminate whole kernels "
            "and inflate the numbers (profiles/profile_fence_dce.py); "
            "the compiled production chain is asserted to contain the "
            "megakernel custom-call"
        ),
        "stages": stages,
        "stage_sum_s": stage_sum,
        "fusion_gap_s": stages["full_forward"]["measured_s"] - stage_sum,
        "limiting_stage": limiter,
        "vs_xla_fallback": stages["xla_fallback_chain"]["measured_s"]
        / stages["full_forward"]["measured_s"],
        "full_forward_mpix_s": npix / 1e6 / stages["full_forward"]["measured_s"],
    }

    print(f"\nJPEG forward roofline — {size}² × batch {batch} "
          f"({npix/1e6:.0f} MPix/iter) on {result['backend']}")
    print(f"measured HBM stream ceiling: {hbm_measured_gbs:.0f} GB/s "
          f"(paper {HBM_PEAK_GBS:.0f})")
    print(f"{'stage':18s} {'ms':>8s} {'GB/s':>7s} {'TFLOP/s':>8s} "
          f"{'SoL ms':>7s} {'SoL%':>6s} {'mSoL%':>6s}  bound")
    for name in (*device_stages, "full_forward", "xla_fallback_chain",
                 "readback_d2h"):
        st = stages[name]
        sol_ms = f"{st['speed_of_light_s']*1e3:7.2f}" if st["speed_of_light_s"] else "      -"
        sol_pc = f"{st['sol_fraction']*100:5.1f}%" if st["sol_fraction"] else "     -"
        msol_pc = (
            f"{st['sol_fraction_measured']*100:5.1f}%"
            if st.get("sol_fraction_measured")
            else "     -"
        )
        print(
            f"{name:18s} {st['measured_s']*1e3:8.2f} {st['achieved_gbs']:7.1f} "
            f"{st['achieved_tflops']:8.2f} {sol_ms} {sol_pc} {msol_pc}  "
            f"{st.get('bound','-')}"
        )
    print(f"limiting stage: {limiter}; "
          f"fusion gap {result['fusion_gap_s']*1e3:+.2f} ms; "
          f"{result['vs_xla_fallback']:.2f}x the XLA fallback; "
          f"forward {result['full_forward_mpix_s']:.0f} MPix/s")

    if output:
        with open(output, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {output}")
    return result


def run_jpeg_inverse_roofline(
    size: int = 2048,
    batch: int = 64,
    chain: int = 8,
    output: Optional[str] = None,
) -> Dict:
    """Per-stage fenced roofline of the ROUND-5 device decode chain:
    combined sparse buffer → per-channel delta extraction + kt transpose
    → FOLDED suffix-basis einsum (the RLE expansion rides the same MXU
    pass, ``ops/fused.py::inverse_suffix_basis``) → plane YCbCr merge.
    The round-4 limiting stage (the expansion butterfly, 19.9 ms
    marginal) no longer exists as a stage at all.

    Every stage is data-oblivious, so the chain carry XOR-perturbs the
    combined words — iterations cannot be CSE'd and the streams stay
    shape-valid.  Byte counts follow the read-once/write-once convention.
    """
    import jax
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import (
        CHANNELS,
        _CHANNEL_SHAPES,
        JPEGPipeline,
    )
    from lz4jpeg_tpu.ops.color import ycbcr_planes_to_rgb
    from lz4jpeg_tpu.ops.fused import fused_inverse_plane_sparse_jnp
    from lz4jpeg_tpu.ops.pallas_fwd import CHANNEL_SLICES
    from lz4jpeg_tpu.ops.rle import SPARSE16_DELTA_BIAS
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    assert pipeline._sparse16, "inverse roofline measures the sparse16 path"
    rng = np.random.default_rng(0)
    img = generate_noise_image(size, size, rng)
    slim = jax.block_until_ready(pipeline._forward_rle(jnp.asarray(img)))
    # One batch axis of real encoded streams (tiled — decode work is
    # content-oblivious, so tiling does not change it).
    comb = jnp.tile(slim[None], (batch, 1, 1))  # (B, N, 128) u16
    bpc = bpr = size // 8
    npix = batch * size * size
    slices = CHANNEL_SLICES

    stages: Dict[str, Dict] = {}

    def unbias_all(cb):
        out = {}
        for name in CHANNELS:
            tw = _CHANNEL_SHAPES[name][1]
            k = 8 * tw
            w16 = cb[..., slices[name]].astype(jnp.int32)
            d = jnp.where(w16 != 0, w16 - SPARSE16_DELTA_BIAS, 0)
            out[name] = jnp.transpose(
                d.reshape(batch, bpc, bpr, k), (0, 1, 3, 2)
            )
        return out

    # -- stage 1: channel slice + delta un-bias + kt transpose ------------
    def unbias_body(cb, c, s):
        d = unbias_all(cb ^ c.astype(jnp.uint16))
        s = s + sum(jnp.sum(v.astype(jnp.float32)) for v in d.values())
        return (s % 2).astype(jnp.uint16), s

    print("timing unbias_kt ...", flush=True)
    stages["unbias_kt"] = {
        "measured_s": _chain_bench_u16(unbias_body, comb, chain),
        "flops": 0,
        "bytes": 4 * npix + 8 * npix,  # u16 combined in, i32 kt deltas out
    }

    d0 = jax.jit(unbias_all)(comb)

    # -- stage 2: folded suffix-basis einsum (deltas → u8 planes) ---------
    def planes_all(d):
        out = {}
        for name in CHANNELS:
            tw = _CHANNEL_SHAPES[name][1]
            out[name] = jax.vmap(
                lambda dk, n=name, w=tw: fused_inverse_plane_sparse_jnp(
                    dk, pipeline._tables[n], w, jnp.float32,
                    upsample_cols=(n != "lum"),
                )
            )(d[name])
        return out

    def einsum_body(d, c, s):
        out = planes_all({k: v + c.astype(jnp.int32) for k, v in d.items()})
        s = s + sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())
        return (s % 2).astype(jnp.uint16), s

    print("timing folded_einsum ...", flush=True)
    stages["folded_einsum"] = {
        "measured_s": _chain_bench_u16(einsum_body, d0, chain),
        # luma: npix outputs × 64-contraction; chroma: 2 channels × npix
        # full-width outputs (upsample folded) × 32-contraction.
        "flops": 2 * 64 * npix + 2 * 32 * 2 * npix,
        "bytes": 8 * npix + 3 * npix,  # i32 deltas in, u8 planes out
    }

    planes0 = jax.jit(planes_all)(d0)

    # -- stage 3: plane YCbCr merge (u8 planes → RGB) ---------------------
    def merge_body(planes, c, s):
        rgb = jax.vmap(
            lambda y, r, b: ycbcr_planes_to_rgb(
                y, r, b, size, size, jnp.float32, chroma_upsampled=True
            )
        )(
            planes["lum"] + c.astype(jnp.uint8),
            planes["r"],
            planes["b"],
        )
        # Full-RGB fence: a single channel would DCE the Cb chain.
        s = s + jnp.sum(rgb.astype(jnp.float32))
        return (s % 2).astype(jnp.uint16), s

    print("timing color_merge ...", flush=True)
    stages["color_merge"] = {
        "measured_s": _chain_bench_u16(merge_body, planes0, chain),
        "flops": 10 * npix,
        "bytes": 3 * npix + 3 * npix,  # u8 planes in, RGB u8 out
    }

    # -- whole inverse chain (what the device-decode bench times) ---------
    def full_body(cb, c, s):
        rgb = jax.vmap(
            lambda cc: pipeline._inverse_sparse_impl(
                cc, bpc=bpc, bpr=bpr, height=size, width=size
            )
        )(cb ^ c.astype(jnp.uint16))
        s = s + jnp.sum(rgb.astype(jnp.float32))
        return (s % 2).astype(jnp.uint16), s

    print("timing full_inverse ...", flush=True)
    stages["full_inverse"] = {
        "measured_s": _chain_bench_u16(full_body, comb, chain),
        "flops": sum(
            stages[k]["flops"]
            for k in ("unbias_kt", "folded_einsum", "color_merge")
        ),
        "bytes": 4 * npix + 3 * npix,  # combined u16 in, RGB u8 out
    }

    # Anti-DCE guard: the decode is einsum-borne now (no Pallas anywhere)
    # — the compiled chain must contain dots/convolution-class ops.
    f = _make_chained_u16(full_body, chain)
    hlo = f.lower(comb, jnp.uint16(0)).compile().as_text()
    if hlo.count("dot(") + hlo.count(" dot(") + hlo.count("fusion") == 0:
        raise RuntimeError(
            "DCE guard: compiled inverse chain contains no contraction — "
            "the fence collapsed; numbers would be hollow."
        )

    # -- fence floor: xor-perturb + checksum traffic per iteration --------
    def floor_body(cb, c, s):
        (x,) = jax.lax.optimization_barrier((cb ^ c.astype(jnp.uint16),))
        s = s + jnp.sum(x.astype(jnp.float32))
        return (s % 2).astype(jnp.uint16), s

    print("timing fence_floor ...", flush=True)
    floor_s = _chain_bench_u16(floor_body, comb, chain)

    print("timing hbm_stream ceiling ...", flush=True)
    hbm_probe = measure_hbm_stream_ceiling(
        footprint_bytes=min(512 << 20, 4 * npix), chain=16
    )
    hbm_measured_gbs = hbm_probe["ceiling_gbs"]

    for name, st in stages.items():
        t = st["measured_s"]
        st["achieved_gbs"] = st["bytes"] / t / 1e9
        st["achieved_tflops"] = st["flops"] / t / 1e12
        sol = max(
            st["bytes"] / (HBM_PEAK_GBS * 1e9),
            st["flops"] / (MXU_PEAK_TFLOPS * 1e12),
        )
        st["speed_of_light_s"] = sol
        st["sol_fraction"] = sol / t
        sol_m = max(
            st["bytes"] / (hbm_measured_gbs * 1e9),
            st["flops"] / (MXU_PEAK_TFLOPS * 1e12),
        )
        st["sol_fraction_measured"] = sol_m / t
        st["bound"] = (
            "memory"
            if st["bytes"] / (HBM_PEAK_GBS * 1e9)
            >= st["flops"] / (MXU_PEAK_TFLOPS * 1e12)
            else "compute"
        )

    device_stages = ("unbias_kt", "folded_einsum", "color_merge")
    stage_sum = sum(stages[k]["measured_s"] for k in device_stages)
    limiter = max(device_stages, key=lambda k: stages[k]["measured_s"])
    result = {
        "size": size,
        "batch": batch,
        "chain": chain,
        "backend": jax.default_backend(),
        "formulation": "sparse16_folded",
        "peaks": {
            "hbm_gbs": HBM_PEAK_GBS,
            "hbm_gbs_measured": hbm_measured_gbs,
            "mxu_bf16_tflops": MXU_PEAK_TFLOPS,
        },
        "hbm_stream_ceiling": hbm_probe,
        "mpix_per_iter": npix / 1e6,
        "fence_floor": {
            "measured_s": floor_s,
            "note": (
                "per-iteration xor-perturb + checksum of the combined "
                "buffer (barriered); embedded in every stage's "
                "measured_s — subtract for kernel-marginal comparisons"
            ),
        },
        "stages": stages,
        "stage_sum_s": stage_sum,
        "fusion_gap_s": stages["full_inverse"]["measured_s"] - stage_sum,
        "limiting_stage": limiter,
        "full_inverse_mpix_s": npix / 1e6 / stages["full_inverse"]["measured_s"],
    }

    print(f"\nJPEG inverse roofline — {size}² × batch {batch} "
          f"({npix/1e6:.0f} MPix/iter) on {result['backend']}")
    print(f"measured HBM stream ceiling: {hbm_measured_gbs:.0f} GB/s "
          f"(paper {HBM_PEAK_GBS:.0f})")
    print(f"{'stage':16s} {'ms':>8s} {'GB/s':>7s} {'TFLOP/s':>8s} "
          f"{'SoL%':>6s} {'mSoL%':>6s}  bound")
    for name in (*device_stages, "full_inverse"):
        st = stages[name]
        print(
            f"{name:16s} {st['measured_s']*1e3:8.2f} "
            f"{st['achieved_gbs']:7.1f} {st['achieved_tflops']:8.2f} "
            f"{st['sol_fraction']*100:5.1f}% "
            f"{st['sol_fraction_measured']*100:5.1f}%  {st['bound']}"
        )
    print(f"limiting stage: {limiter}; "
          f"fusion gap {result['fusion_gap_s']*1e3:+.2f} ms; "
          f"inverse {result['full_inverse_mpix_s']:.0f} MPix/s")

    if output:
        with open(output, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {output}")
    return result


def _make_chained_u16(body, chain: int):
    import jax
    import jax.numpy as jnp

    def chained(x, c0):
        def step(_, carry):
            c, s = carry
            return body(x, c, s)

        _, s = jax.lax.fori_loop(0, chain, step, (c0, jnp.float32(0)))
        return s

    return jax.jit(chained)


def _chain_bench_u16(body, data, chain: int, runs: int = 4) -> float:
    """``_chain_bench`` with a uint16 carry (XOR-compatible with the
    packed16 pair words)."""
    import jax.numpy as jnp

    f = _make_chained_u16(body, chain)
    float(f(data, jnp.uint16(0)))
    best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        float(f(data, jnp.uint16(0)))
        best = min(best, time.perf_counter() - t0)
    return best / chain
