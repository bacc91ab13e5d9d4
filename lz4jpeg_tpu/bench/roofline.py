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
    """Stage-by-stage fenced timing + roofline for the batched forward."""
    import jax
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import CHANNELS, JPEGPipeline, forward_channel
    from lz4jpeg_tpu.ops.rle import rle_encode_batched
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.stack([generate_noise_image(size, size, rng) for _ in range(batch)])
    )
    npix = batch * size * size  # pixels per chain iteration
    # The production pack16 path on TPU uses the plane-view einsum + the
    # sublane-butterfly Pallas kernel for width-1024-multiple images (no
    # 8×8 tile relayout at all); measure the stages of whichever path the
    # pipeline actually takes.
    plane_path = (
        getattr(pipeline, "_pallas_rle", False)
        and size % 8 == 0
        and size % 1024 == 0
    )

    stages: Dict[str, Dict] = {}

    if plane_path:
        from lz4jpeg_tpu.models.jpeg import _CHANNEL_SHAPES
        from lz4jpeg_tpu.ops.color import chroma_subsample_422, rgb_to_ycbcr
        from lz4jpeg_tpu.ops.fused import fused_forward_plane_jnp
        from lz4jpeg_tpu.ops.pallas_rle import rle_encode_packed16_pallas_kt

        def planes_fn(x):
            def one(img):
                y, cr, cb = rgb_to_ycbcr(img, jnp.float32)
                return y, chroma_subsample_422(cr), chroma_subsample_422(cb)

            return jax.vmap(one)(x)

        planes = jax.jit(planes_fn)(imgs)

        def plane_matmuls(ps, c):
            out = []
            for name, p in zip(CHANNELS, ps):
                p = (p + c.astype(p.dtype)) if c is not None else p
                tw = _CHANNEL_SHAPES[name][1]
                zz_kt = jax.vmap(
                    lambda pp, n=name, w=tw: fused_forward_plane_jnp(
                        pp, pipeline._tables[n], w
                    )
                )(p)
                out.append(zz_kt.astype(jnp.int16))
            return out

        zz = jax.jit(lambda ps: plane_matmuls(ps, None))(planes)

        # -- stage 1: color transform + 4:2:2 (planes only) --------------
        def color_body(x, c, s):
            y, r, b = planes_fn(x + c.astype(jnp.uint8))
            s = s + sum(jnp.sum(t.astype(jnp.float32)) for t in (y, r, b))
            return (y[0, 0, 0] % 2).astype(jnp.int16), s

        print("timing color_planes ...", flush=True)
        stages["color_split"] = {
            "measured_s": _chain_bench(color_body, imgs, chain),
            "flops": 10 * npix,
            "bytes": 3 * npix + 2 * npix,  # RGB u8 in, Y + half chroma out
        }

        # -- stage 2: plane-view fused einsum (3 channels, i16 out) ------
        def matmul_body(ps, c, s):
            out = plane_matmuls(ps, c)
            return (out[0][0, 0, 0, 0] % 2).astype(jnp.int16), s + sum(
                jnp.sum(o.astype(jnp.float32)) for o in out
            )

        print("timing plane_matmul ...", flush=True)
        stages["mcu_matmul"] = {
            "measured_s": _chain_bench(matmul_body, planes, chain),
            "flops": 2 * npix * 64 + 2 * (2 * (npix // 2) * 32),
            "bytes": 2 * npix + 4 * npix,  # u8 planes in, i16 coeffs out
        }

        def rle_fn(z):
            return rle_encode_packed16_pallas_kt(
                z.reshape(-1, *z.shape[2:])
            )
    else:
        split = jax.vmap(pipeline._split_impl)
        tiles = jax.jit(split)(imgs)  # stage-2/3 inputs, resident in HBM
        tiles = jax.tree_util.tree_map(
            lambda t: t.reshape(-1, *t.shape[2:]), tiles
        )

        def matmuls(ts, c):
            out = []
            for name, t in zip(CHANNELS, ts):
                t = (t + c.astype(t.dtype)) if c is not None else t
                out.append(
                    forward_channel(
                        t, name, pipeline._tables, jnp.float32, True
                    )
                )
            return out

        zz = jax.jit(lambda ts: matmuls(ts, None))(tiles)

        # -- stage 1: color transform + 4:2:2 + MCU split ----------------
        def split_body(x, c, s):
            lum, r, b = split(x + c.astype(jnp.uint8))
            # Full-output fence: a few-element checksum is sliceable
            # through the transposes (same DCE hazard as the RLE fence).
            s = s + sum(
                jnp.sum(t.astype(jnp.float32)) for t in (lum, r, b)
            )
            return (lum[0, 0, 0, 0] % 2).astype(jnp.int16), s

        print("timing color_split ...", flush=True)
        stages["color_split"] = {
            "measured_s": _chain_bench(split_body, imgs, chain),
            "flops": 10 * npix,          # 3-tap color matrix per pixel
            "bytes": 3 * npix + 2 * npix,  # RGB u8 in, tiles u8 out
        }

        # -- stage 2: fused DCT+quant+zigzag matmul (3 channels) ---------
        def matmul_body(ts, c, s):
            out = matmuls(ts, c)
            # Full-output fence: a column slice of a dot is itself a
            # smaller dot, so a partial checksum would under-measure.
            return (out[0][0, 0] % 2).astype(jnp.int16), s + sum(
                jnp.sum(o) for o in out
            )

        print("timing mcu_matmul ...", flush=True)
        stages["mcu_matmul"] = {
            "measured_s": _chain_bench(matmul_body, tiles, chain),
            "flops": 2 * npix * 64 + 2 * (2 * (npix // 2) * 32),
            "bytes": 2 * npix + 8 * npix,  # u8 tiles in, f32 coeffs out
        }

        rle_fn = (
            pipeline._rle_pack16_fn
            if pipeline._pack16
            else rle_encode_batched
        )

    # -- stage 3: RLE compaction (3 channels, production pack16 path) ----
    # FENCE THE PAIRS, NOT JUST THE LENGTHS: lengths = 2·num_runs depend
    # only on the boundary compares, so a lengths-only checksum lets XLA
    # dead-code-eliminate the bitonic sort and the pack — the r1 artifact
    # did exactly that and under-reported this stage ~3× (the fence A/B is
    # committed in results/formulation_ab.json, profiles/profile_fence_dce
    # .py).  Summing the packed output forces every element, and the
    # compiled-HLO guard below makes the lesson a hard failure.
    def rle_body(zs, c, s):
        for z in zs:
            z = (z.astype(jnp.int32) + c.astype(jnp.int32)).astype(
                jnp.int16
            )
            p, l = rle_fn(z)
            s = (
                s
                + jnp.sum(p.astype(jnp.float32))
                + jnp.sum(l.astype(jnp.float32))
            )
            c = (l.reshape(-1)[0] % 3).astype(jnp.int16)
        return c, s

    print("timing rle ...", flush=True)
    _assert_fence_forces_compaction(rle_body, zz, chain)
    stages["rle"] = {
        "measured_s": _chain_bench(rle_body, zz, chain),
        "flops": 0,  # compare/select network — not MXU work
        # zz in (i16 on the plane path, f32 staged otherwise), packed u16
        # [count|value] out (int32 (N,2L) pairs on the non-pack16
        # fallback); internal passes are excluded by the read-once/
        # write-once convention.
        "bytes": (4 * npix if plane_path else 8 * npix)
        + (4 * npix if pipeline._pack16 else 16 * npix),
    }

    # -- bare-sort ceiling at the production shapes ----------------------
    # The RLE stage is built on lax.sort (chroma) / the Pallas butterfly
    # (luma); a bare 1-operand sort at the same shapes is the platform's
    # achievable ceiling for the sort formulation — report the stage
    # against it, not only against HBM bytes (VERDICT r2 item 1;
    # profiles/profile_sort_ceiling.py is the standalone sweep).
    lum_rows = npix // 64
    sort_times = {}
    for tag, rows, length in (
        ("lum", lum_rows, 64), ("chroma", lum_rows, 32),
    ):
        xs = jnp.asarray(
            np.random.default_rng(1).integers(
                -511, 512, size=(rows, length)
            ).astype(np.int32)
        )

        def sort_body(v, c, s):
            (out,) = jax.lax.sort(
                (v ^ c.astype(jnp.int32),), dimension=1, num_keys=1
            )
            s = s + jnp.sum(out.astype(jnp.float32))
            return (s % 2).astype(jnp.int16), s

        print(f"timing bare sort {tag} ...", flush=True)
        sort_times[tag] = _chain_bench(sort_body, xs, chain)
    sort_ceiling_s = sort_times["lum"] + 2 * sort_times["chroma"]
    stages["sort_ceiling"] = {
        "measured_s": sort_ceiling_s,
        "flops": 0,
        "bytes": 8 * npix + 4 * npix,  # same I/O convention as the stage
        "note": (
            "bare 1-op lax.sort at the production shapes (lum "
            f"{lum_rows}x64 + 2 chroma {lum_rows}x32) — the sort-"
            "formulation ceiling the RLE stage is judged against"
        ),
    }

    # -- whole forward chain (what bench.py times) ------------------------
    fwd = jax.vmap(pipeline._forward_rle_impl)

    def full_body(x, c, s):
        out = fwd(x + c.astype(jnp.uint8))
        lengths0 = out["lum"][1]
        # Same full fence as bench.py: pairs + lengths.
        return (lengths0[0, 0] % 3).astype(jnp.int16), s + sum(
            jnp.sum(v[0].astype(jnp.float32))
            + jnp.sum(v[1].astype(jnp.float32))
            for v in out.values()
        )

    print("timing full_forward ...", flush=True)
    stages["full_forward"] = {
        "measured_s": _chain_bench(full_body, imgs, chain),
        "flops": sum(stages[k]["flops"] for k in ("color_split", "mcu_matmul", "rle")),
        "bytes": sum(stages[k]["bytes"] for k in ("color_split", "mcu_matmul", "rle")),
    }

    # -- device→host readback of the slim encode output -------------------
    slim = jax.jit(fwd)(imgs)
    jax.block_until_ready(slim)
    d2h_bytes = sum(
        int(np.prod(v[0].shape)) * 2 + int(np.prod(v[1].shape)) * 4
        for v in slim.values()
    )
    t0 = time.perf_counter()
    jax.device_get(slim)
    d2h_s = time.perf_counter() - t0
    stages["readback_d2h"] = {
        "measured_s": d2h_s,
        "flops": 0,
        "bytes": d2h_bytes,
        "note": "tunnel d2h, RTT-inclusive; not part of the device chain",
    }

    # -- measured HBM-stream ceiling (the platform's real bandwidth) ------
    # A bare fenced streaming loop at the production footprint — the
    # denominator every memory-bound stage should honestly be judged
    # against, alongside the paper 819 GB/s (VERDICT r3 missing-item 1).
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
        # Same arithmetic against the MEASURED stream ceiling: what the
        # platform demonstrably sustains on a bare fenced copy loop.
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

    device_stages = ("color_split", "mcu_matmul", "rle")
    stage_sum = sum(stages[k]["measured_s"] for k in device_stages)
    limiter = max(device_stages, key=lambda k: stages[k]["measured_s"])
    result = {
        "size": size,
        "batch": batch,
        "chain": chain,
        "backend": jax.default_backend(),
        "peaks": {
            "hbm_gbs": HBM_PEAK_GBS,
            "hbm_gbs_measured": hbm_measured_gbs,
            "mxu_bf16_tflops": MXU_PEAK_TFLOPS,
        },
        "hbm_stream_ceiling": hbm_probe,
        "mpix_per_iter": npix / 1e6,
        "fencing_note": (
            "every stage fence reduces the stage's FULL output (pairs, not "
            "just lengths) — a partial fence lets XLA dead-code-eliminate "
            "the RLE sort+pack and inflate the numbers ~2x; see "
            "profiles/profile_fence_dce.py and formulation_ab.json"
        ),
        "stages": stages,
        "stage_sum_s": stage_sum,
        "fusion_gap_s": stages["full_forward"]["measured_s"] - stage_sum,
        "limiting_stage": limiter,
        # How close the RLE stage runs to a bare sort at its own shapes —
        # ≥1.0 means the production path beats the sort formulation's
        # ceiling outright (the Pallas butterfly does on luma).
        "rle_vs_sort_ceiling": sort_ceiling_s / stages["rle"]["measured_s"],
        "full_forward_mpix_s": npix / 1e6 / stages["full_forward"]["measured_s"],
    }

    print(f"\nJPEG forward roofline — {size}² × batch {batch} "
          f"({npix/1e6:.0f} MPix/iter) on {result['backend']}")
    print(f"measured HBM stream ceiling: {hbm_measured_gbs:.0f} GB/s "
          f"(paper {HBM_PEAK_GBS:.0f})")
    print(f"{'stage':14s} {'ms':>8s} {'GB/s':>7s} {'TFLOP/s':>8s} "
          f"{'SoL ms':>7s} {'SoL%':>6s} {'mSoL%':>6s}  bound")
    for name in (*device_stages, "sort_ceiling", "full_forward", "readback_d2h"):
        st = stages[name]
        sol_ms = f"{st['speed_of_light_s']*1e3:7.2f}" if st["speed_of_light_s"] else "      -"
        sol_pc = f"{st['sol_fraction']*100:5.1f}%" if st["sol_fraction"] else "     -"
        msol_pc = (
            f"{st['sol_fraction_measured']*100:5.1f}%"
            if st.get("sol_fraction_measured")
            else "     -"
        )
        print(
            f"{name:14s} {st['measured_s']*1e3:8.2f} {st['achieved_gbs']:7.1f} "
            f"{st['achieved_tflops']:8.2f} {sol_ms} {sol_pc} {msol_pc}  "
            f"{st.get('bound','-')}"
        )
    print(f"limiting stage: {limiter}; "
          f"fusion gap {result['fusion_gap_s']*1e3:+.2f} ms; "
          f"rle at {result['rle_vs_sort_ceiling']*100:.0f}% of bare-sort "
          f"ceiling; forward {result['full_forward_mpix_s']:.0f} MPix/s")

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
    """Per-stage fenced roofline of the device decode chain (VERDICT r3
    item 3): RLE expansion butterfly → fused IDCT matmul → YCbCr merge,
    the same instrumentation the forward got in rounds 1-3.

    Every stage is data-oblivious (the expansion butterfly's routing
    network, the IDCT matmul, and the elementwise color merge all do
    identical work regardless of content), so the chain carry perturbs
    inputs by XOR-ing the packed value field's LSB — iterations cannot be
    CSE'd/hoisted, and the perturbed streams stay shape-valid.
    Stage byte counts follow the forward convention: inputs read once +
    outputs written once at the declared stage interfaces.
    """
    import jax
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import (
        CHANNELS,
        JPEGPipeline,
        inverse_channel,
    )
    from lz4jpeg_tpu.ops.color import ycbcr_to_rgb_mcus
    from lz4jpeg_tpu.utils.inputs import generate_noise_image

    pipeline = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    assert pipeline._pack16, "inverse roofline expects the pack16 layout"
    rng = np.random.default_rng(0)
    img = generate_noise_image(size, size, rng)
    slim = jax.block_until_ready(pipeline._forward_rle(jnp.asarray(img)))
    # One batch axis worth of real encoded streams (tiled — the decode is
    # content-oblivious, so tiling does not change the work).
    rle = {c: jnp.tile(slim[c][0], (batch, 1)) for c in CHANNELS}
    lens = {c: jnp.tile(slim[c][1], (batch,)) for c in CHANNELS}
    bpc = bpr = size // 8
    npix = batch * size * size

    stages: Dict[str, Dict] = {}

    # Measure the stages of whichever path production takes: the plane
    # chain (KT decode butterfly → plane einsum → plane color) when its
    # gate holds, the tile chain otherwise — same stage names either way.
    plane_path = (
        getattr(pipeline, "_pallas_rle", False) and (size // 8) % 128 == 0
    )

    def decode_all(rle_d, lens_d):
        return {
            c: pipeline._rle_decode_fn(
                rle_d[c], lens_d[c], rle_d[c].shape[-1], True
            )
            for c in CHANNELS
        }

    if plane_path:
        from lz4jpeg_tpu.models.jpeg import _CHANNEL_SHAPES
        from lz4jpeg_tpu.ops.color import ycbcr_planes_to_rgb
        from lz4jpeg_tpu.ops.fused import fused_inverse_plane_jnp
        from lz4jpeg_tpu.ops.pallas_rle import (
            rle_decode_packed16_pallas_plane,
        )

        bw = size // 8

        def decode_all_plane(rle_d):
            def one(pairs):
                return rle_decode_packed16_pallas_plane(pairs, bw)

            return {c: jax.vmap(one)(
                rle_d[c].reshape(batch, -1, rle_d[c].shape[-1])
            ) for c in CHANNELS}

        def expand_body(data, c, s):
            r, _ln = data
            r = {k: v ^ c.astype(jnp.uint16) for k, v in r.items()}
            zz = decode_all_plane(r)
            s = s + sum(
                jnp.sum(z.astype(jnp.float32)) for z in zz.values()
            )
            return (s % 2).astype(jnp.uint16), s

        zz0 = jax.jit(decode_all_plane)(rle)

        def plane_channels(zz, c):
            out = {}
            for name in CHANNELS:
                tw = _CHANNEL_SHAPES[name][1]
                z = zz[name] + c.astype(jnp.int16)
                out[name] = jax.vmap(
                    lambda zk, n=name, w=tw: fused_inverse_plane_jnp(
                        zk, pipeline._tables[n], w, jnp.float32,
                        # Production folds the 4:2:2 upsample into the
                        # chroma basis (models/jpeg.py) — mirror it.
                        upsample_cols=(n != "lum"),
                    )
                )(z)
            return out

        def idct_body(zz, c, s):
            out = plane_channels(zz, c)
            s = s + sum(
                jnp.sum(o.astype(jnp.float32)) for o in out.values()
            )
            return (s % 2).astype(jnp.uint16), s

        planes0 = jax.jit(
            lambda zz: plane_channels(zz, jnp.int16(0))
        )(zz0)

        def merge_body(planes, c, s):
            rgb = jax.vmap(
                lambda y, r, b: ycbcr_planes_to_rgb(
                    y, r, b, size, size, jnp.float32,
                    chroma_upsampled=True,
                )
            )(
                planes["lum"] + c.astype(jnp.uint8),
                planes["r"],
                planes["b"],
            )
            s = s + jnp.sum(rgb.astype(jnp.float32))
            return (s % 2).astype(jnp.uint16), s

        mid0 = planes0
    else:
        def expand_body(data, c, s):
            r, ln = data
            r = {k: v ^ c.astype(jnp.uint16) for k, v in r.items()}
            zz = decode_all(r, ln)
            s = s + sum(jnp.sum(z.astype(jnp.float32)) for z in zz.values())
            return (s % 2).astype(jnp.uint16), s

        zz0 = jax.jit(decode_all)(rle, lens)

        def idct_body(zz, c, s):
            out = {}
            for name in CHANNELS:
                z = zz[name] + c.astype(jnp.int32)
                out[name] = inverse_channel(
                    z, name, pipeline._tables, jnp.float32, True
                )
            s = s + sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())
            return (s % 2).astype(jnp.uint16), s

        tiles0 = jax.jit(
            lambda zz: {
                name: inverse_channel(
                    zz[name], name, pipeline._tables, jnp.float32, True
                )
                for name in CHANNELS
            }
        )(zz0)

        def merge_body(tiles, c, s):
            def one(lum, r, b):
                return ycbcr_to_rgb_mcus(
                    lum, r, b, bpc, bpr, size, size, jnp.float32
                )

            rgb = jax.vmap(one)(
                (tiles["lum"] + c.astype(jnp.uint8)).reshape(
                    batch, -1, 8, 8
                ),
                tiles["r"].reshape(batch, -1, 8, 4),
                tiles["b"].reshape(batch, -1, 8, 4),
            )
            # Full-RGB fence: a single channel would DCE the Cb chain.
            s = s + jnp.sum(rgb.astype(jnp.float32))
            return (s % 2).astype(jnp.uint16), s

        mid0 = tiles0

    # -- stage 1: RLE expansion (packed u16 pairs → zigzag coefficients) --
    print("timing rle_expand ...", flush=True)
    stages["rle_expand"] = {
        "measured_s": _chain_bench_u16(expand_body, (rle, lens), chain),
        "flops": 0,
        # 2·npix u16 pair words in (luma npix + chroma npix/2 ×2),
        # 2·npix i16/i32 coefficients out.
        "bytes": 4 * npix + (4 if plane_path else 8) * npix,
    }

    # -- stage 2: fused inverse matmul (zz → u8 pixels) -------------------
    print("timing inverse_matmul ...", flush=True)
    stages["inverse_matmul"] = {
        "measured_s": _chain_bench_u16(idct_body, zz0, chain),
        "flops": 2 * npix * 64 + 2 * npix * 32,
        "bytes": (4 if plane_path else 8) * npix + 2 * npix,
    }

    # -- stage 3: YCbCr merge (u8 pixels → RGB image) ---------------------
    print("timing color_merge ...", flush=True)
    stages["color_merge"] = {
        "measured_s": _chain_bench_u16(merge_body, mid0, chain),
        "flops": 10 * npix,
        "bytes": 2 * npix + 3 * npix,  # u8 planes/tiles in, RGB u8 out
    }

    # -- whole inverse chain (what the device-decode bench times) ---------
    def full_body(data, c, s):
        r, ln = data
        r = {k: v ^ c.astype(jnp.uint16) for k, v in r.items()}
        rgb = jax.vmap(
            lambda rr, ll: pipeline._inverse_impl(
                rr, ll, bpc=bpc, bpr=bpr, height=size, width=size,
                packed16=True,
            )
        )(
            {k: v.reshape(batch, -1, v.shape[-1]) for k, v in r.items()},
            {k: v.reshape(batch, -1) for k, v in ln.items()},
        )
        s = s + jnp.sum(rgb.astype(jnp.float32))
        return (s % 2).astype(jnp.uint16), s

    print("timing full_inverse ...", flush=True)
    stages["full_inverse"] = {
        "measured_s": _chain_bench_u16(full_body, (rle, lens), chain),
        "flops": sum(
            stages[k]["flops"]
            for k in ("rle_expand", "inverse_matmul", "color_merge")
        ),
        "bytes": sum(
            stages[k]["bytes"]
            for k in ("rle_expand", "inverse_matmul", "color_merge")
        ),
    }

    # Anti-DCE guard: the compiled full chain must still contain the
    # Pallas expansion kernel (custom-call) or a sort — otherwise the
    # fence stopped forcing the decode and the numbers are hollow.
    f = _make_chained_u16(full_body, chain)
    hlo = f.lower((rle, lens), jnp.uint16(0)).compile().as_text()
    if jax.default_backend() == "tpu":
        # Production decode is the Pallas expansion kernel (custom-call);
        # its absence means the fence stopped forcing the expansion.
        if hlo.count("custom-call") == 0:
            raise RuntimeError(
                "DCE guard: compiled inverse chain contains no expansion "
                "kernel — the fence collapsed; numbers would be hollow."
            )
    elif hlo.count("dot(") + hlo.count(" dot(") == 0:
        # CPU fallback decodes via the membership-einsum dots.
        raise RuntimeError(
            "DCE guard: compiled inverse chain contains no einsum decode."
        )

    # -- fence floor: the xor-perturb + checksum traffic every stage body
    # pays per iteration, with the xor output barriered so it materializes
    # exactly as it does when feeding a kernel.  Stage numbers above
    # INCLUDE this floor (the round-4 wide-kernel A/B showed it is ~3 ms
    # at 1M-block shapes and once mis-attributed the expansion kernel's
    # cost to its loads — results/pallas_ab.json::rle_decode_round4);
    # subtract it to compare kernel formulations, keep it to compare
    # against the reference's whole-process timings.
    def floor_body(data, c, s):
        r, _ln = data
        for k, v in r.items():
            (x,) = jax.lax.optimization_barrier((v ^ c.astype(jnp.uint16),))
            s = s + jnp.sum(x.astype(jnp.float32))
        return (s % 2).astype(jnp.uint16), s

    print("timing fence_floor ...", flush=True)
    floor_s = _chain_bench_u16(floor_body, (rle, lens), chain)

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

    device_stages = ("rle_expand", "inverse_matmul", "color_merge")
    stage_sum = sum(stages[k]["measured_s"] for k in device_stages)
    limiter = max(device_stages, key=lambda k: stages[k]["measured_s"])
    result = {
        "size": size,
        "batch": batch,
        "chain": chain,
        "backend": jax.default_backend(),
        "formulation": "plane" if plane_path else "tile",
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
                "per-iteration xor-perturb + checksum of the packed "
                "inputs (xor barriered so it materializes as a kernel "
                "feed would); embedded in every stage's measured_s — "
                "subtract for kernel-marginal comparisons"
            ),
            # Clamped at 0: on a noisy run the measured floor can exceed
            # the stage time; a negative marginal would misread as a
            # measurement, not noise.
            "rle_expand_marginal_s": max(
                0.0, stages["rle_expand"]["measured_s"] - floor_s
            ),
            "floor_exceeded_stage": floor_s
            >= stages["rle_expand"]["measured_s"],
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
