"""Radiance .hdr (RGBE) loader — minimal self-contained parser.

Role of the reference's stb_image HDR path feeding the skybox
(ref: Source/ImageLoader.cs + SkyBoxManager equirect input). Supports the
common RLE-encoded 32-bit_rle_rgbe format.
"""
from __future__ import annotations

import numpy as np


def load_hdr(path: str) -> np.ndarray:
    """Returns (H, W, 3) float32 linear radiance."""
    with open(path, "rb") as f:
        data = f.read()
    # header
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    pos = 0
    width = height = None
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line.startswith(b"-Y"):
            parts = line.split()
            height = int(parts[1])
            width = int(parts[3])
            break
        # skip header lines (FORMAT=, comments, blank)
    assert width and height
    rgbe = np.zeros((height, width, 4), np.uint8)
    for y in range(height):
        # scanline header
        if (
            width >= 8
            and width < 32768
            and data[pos] == 2
            and data[pos + 1] == 2
            and ((data[pos + 2] << 8) | data[pos + 3]) == width
        ):
            pos += 4
            # adaptive RLE per channel
            for c in range(4):
                x = 0
                while x < width:
                    count = data[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = np.frombuffer(
                            data, np.uint8, count, pos
                        )
                        pos += count
                        x += count
        else:
            # flat (possibly old-style RLE, unsupported run marker 1,1,1)
            row = np.frombuffer(data, np.uint8, width * 4, pos).reshape(width, 4)
            rgbe[y] = row
            pos += width * 4
    mantissa = rgbe[..., :3].astype(np.float32)
    exp = rgbe[..., 3].astype(np.int32) - 136  # 128 bias + 8 mantissa shift
    scale = np.exp2(exp.astype(np.float32))[..., None]
    out = mantissa * scale
    out[rgbe[..., 3] == 0] = 0.0
    return out.astype(np.float32)
