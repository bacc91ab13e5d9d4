"""Host-side I/O & trace utilities (the reference's L0 layer, SURVEY.md §1).

* PNG read/write via PIL (replacing the vendored stb_image /
  stb_image_write, ``Algorithms/sequential/JPEG/stb_image.h``);
* hex dump mirroring ``dump_to_hex_file`` (``"%02X "`` per byte,
  ``Algorithms/sequential/LZ4/LZ4.c:75-107``);
* binary pretty printer mirroring ``print_binary_to_file`` (LZ4.c:66-72);
* append-mode encoding log mirroring ``encoding_log.txt`` (LZ4.c:24,683)
  and the ``clear_files`` truncation (LZ4.c:204-213).
"""

from __future__ import annotations

import os
import numpy as np


def read_png(path: str) -> np.ndarray:
    """PNG → (H, W, 3) uint8 RGB (alpha dropped, like ``read_image``
    forcing 4 channels then using rgb, JPEG.c:66-103)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def write_png(path: str, rgb: np.ndarray) -> None:
    """(H, W, 3) uint8 RGB → PNG (``create_png_image``, JPEG.c:187-217)."""
    from PIL import Image

    Image.fromarray(np.asarray(rgb, dtype=np.uint8), "RGB").save(path)


def hex_dump(data: bytes) -> str:
    """``"%02X "`` per byte — the exact ``compressed.txt`` mirror format."""
    return "".join(f"{b:02X} " for b in data)


def dump_to_hex_file(input_path: str, output_path: str) -> None:
    """File-to-file variant matching the reference helper."""
    with open(input_path, "rb") as f:
        data = f.read()
    with open(output_path, "w") as f:
        f.write(hex_dump(data))


def binary_string(byte: int) -> str:
    """8-char MSB-first bit string (``print_binary_to_file``)."""
    return format(byte & 0xFF, "08b")


class EncodingLog:
    """Append-mode text log, the reference's only logging facility."""

    def __init__(self, path: str = "encoding_log.txt"):
        self.path = path

    def clear(self) -> None:
        open(self.path, "w").close()

    def write(self, message: str) -> None:
        with open(self.path, "a") as f:
            f.write(message)
            if not message.endswith("\n"):
                f.write("\n")


def clear_files(*paths: str) -> None:
    """Truncate output files before an encode run (``clear_files``)."""
    for p in paths:
        open(p, "wb").close()


def write_text_rendering(path: str, raw: bytes) -> None:
    """The reference decoder's text writer: printable ASCII verbatim,
    other bytes as literal ``0x%02X`` text (LZ4.c:1021-1032)."""
    out = bytearray()
    for b in raw:
        if 32 <= b <= 126:
            out.append(b)
        else:
            out += b"0x%02X" % b
    with open(path, "wb") as f:
        f.write(bytes(out))


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
