# End-to-end 2048^2 JPEG roundtrip breakdown: which link eats the 2.65 s
# (results/jpeg_roundtrip.json)? Splits encode/decode into h2d, device
# forward, d2h pairs, host entropy encode/decode, device inverse, d2h RGB.
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4jpeg_jax_cache")
import jax.numpy as jnp
import numpy as np

from lz4jpeg_tpu.config import JPEGConfig
from lz4jpeg_tpu.models.jpeg import CHANNELS, JPEGPipeline
from lz4jpeg_tpu.utils.inputs import generate_noise_image

size = 2048
rng = np.random.default_rng(0)
img = generate_noise_image(size, size, rng)
p = JPEGPipeline(JPEGConfig(precision="fast", entropy="shared"))

# warmup (compile everything)
enc = p.encode(img)
rec = p.decode(enc)


def t(name, fn, n=3):
    best = 1e9
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.1f} ms")
    return out


imgs_j = t("h2d image (12.6 MB u8)", lambda: jax.block_until_ready(jnp.asarray(img)))
slim = t(
    "device forward (fenced)",
    lambda: jax.block_until_ready(p._forward_rle(jnp.asarray(img))),
)
pairs_host = t("d2h rle pairs", lambda: jax.device_get(p._forward_rle(jnp.asarray(img))))
enc = p.encode(img, entropy=False)
t("host entropy encode (C++)", lambda: p.entropy_encode(enc))
t("host entropy decode (C++)", lambda: p.entropy_decode(enc))
rle, lengths = p.entropy_decode(enc)


def dev_inverse():
    rgb = p._inverse(
        {c: jnp.asarray(rle[c]) for c in CHANNELS},
        {c: jnp.asarray(lengths[c]) for c in CHANNELS},
        bpc=enc.blocks_per_col, bpr=enc.blocks_per_row,
        height=enc.height, width=enc.width,
        layout="sparse16" if enc.rle_sparse16 else (
                "packed16" if enc.rle_packed16 else "pairs"),
    )
    return jax.block_until_ready(rgb)


rgb_dev = t("h2d pairs + device inverse", dev_inverse)
# fresh device arrays per run: jax caches the host copy after the first
# device_get, which would otherwise make repeat pulls free
rgb_h = jax.device_get(rgb_dev)
fresh = [jax.block_until_ready(jax.device_put(rgb_h)) for _ in range(3)]
it = iter(fresh)
t("d2h rgb (12.6 MB u8)", lambda: jax.device_get(next(it)))
t("FULL encode()", lambda: p.encode(img))
full_enc = p.encode(img)
t("FULL decode()", lambda: p.decode(full_enc))
