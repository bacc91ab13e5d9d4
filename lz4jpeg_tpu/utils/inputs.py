"""Random benchmark inputs, mirroring the reference's generators.

* ``extract_random_passage`` — a random substring of a text corpus with
  newlines replaced by spaces so every byte stays printable, which the
  parity LZ4 text path requires (``Experiment/random_extract.c:8-71``;
  the printability constraint is load-bearing, SURVEY.md §2.1.6);
* ``generate_noise_image`` — per-pixel uniform RGB noise
  (``Experiment/random_image.c:58-77``).
"""

from __future__ import annotations

import numpy as np

METAMORPHOSIS_PATH = "/root/reference/Output-Input/input/Metamorphosis.txt"


def extract_random_passage(
    corpus: bytes, length: int, rng: np.random.Generator
) -> bytes:
    if length > len(corpus):
        raise ValueError(f"passage of {length} exceeds corpus ({len(corpus)})")
    start = int(rng.integers(0, len(corpus) - length + 1))
    passage = corpus[start : start + length]
    return passage.replace(b"\r", b" ").replace(b"\n", b" ")


def generate_noise_image(
    height: int, width: int, rng: np.random.Generator
) -> np.ndarray:
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def load_corpus(path: str = METAMORPHOSIS_PATH) -> bytes:
    with open(path, "rb") as f:
        return f.read()
