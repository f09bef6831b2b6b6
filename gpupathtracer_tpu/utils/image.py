"""Image IO: PPM (reference-parity P3 + binary P6) and PNG.

``write_ppm`` reproduces the reference ``saveToPPM`` format exactly
(utilities.h:842-856): ASCII "P3", "<w> <h>", "255", then one int-cast RGB
triple per line. Note the reference function is fed a buffer the GPU never
writes (SURVEY.md §2.3.10) — here the renderer output actually reaches disk.
"""

from __future__ import annotations

import numpy as np


def write_ppm(path: str, u8_image: np.ndarray) -> None:
    """ASCII P3 writer, format-identical to reference saveToPPM."""
    h, w = u8_image.shape[:2]
    flat = u8_image.reshape(-1, 3).astype(np.int64)
    with open(path, "w") as f:
        f.write("P3\n")
        f.write(f"{w} {h}\n")
        f.write("255\n")
        np.savetxt(f, flat, fmt="%d")


def read_ppm(path: str) -> np.ndarray:
    """Read ASCII P3 (e.g. the reference's committed render.ppm) → (H, W, 3) u8."""
    with open(path, "r") as f:
        tokens: list[str] = []
        for line in f:
            hash_pos = line.find("#")
            if hash_pos >= 0:
                line = line[:hash_pos]
            tokens.extend(line.split())
    assert tokens[0] == "P3", f"not an ASCII PPM: {tokens[0]}"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.asarray(tokens[4 : 4 + w * h * 3], dtype=np.int64)
    # The reference writes raw int casts that may exceed 255 (overflow quirk,
    # SURVEY.md §2.3.1) — clamp on read.
    return np.clip(data, 0, maxv).astype(np.uint8).reshape(h, w, 3)


def write_png(path: str, u8_image: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(u8_image, mode="RGB").save(path)


def write_image(path: str, u8_image: np.ndarray) -> None:
    if path.endswith(".ppm"):
        write_ppm(path, u8_image)
    else:
        write_png(path, u8_image)
