"""ETC1S/BasisLZ transcoder tests against the bundled reference textures.

Oracles (no independent decoder exists in this image):
  - exact bit consumption: every Huffman stream must end within 8 bits of
    its payload (decode_* raise otherwise) — a mis-recalled bitstream
    detail would drift and overrun;
  - mip cross-consistency: adjacent mip levels are independently coded, so
    a box-downsampled level N must closely match level N+1;
  - known content: DamagedHelmet textures have well-known statistics.
"""
import glob
import os

import numpy as np
import pytest

from idkengine_tpu.scene import basisu

REF_GLOB = "/root/reference/**/*.ktx2"
FILES = sorted(glob.glob(REF_GLOB, recursive=True))

pytestmark = pytest.mark.skipif(
    not FILES, reason="reference textures not present")


def _load(path):
    return basisu.parse_basis_ktx2(open(path, "rb").read())


def test_codebooks_decode_all_bundled_textures():
    """Endpoint + selector codebooks of every bundled texture decode with
    exact bit consumption (the decoders raise on drift)."""
    n_legacy = 0
    for p in FILES:
        parsed = _load(p)
        eps = basisu.decode_endpoints(parsed["ep_data"], parsed["ep_count"])
        assert eps[:, :3].max() <= 31 and eps[:, 3].max() <= 7
        sels = basisu.decode_selectors(parsed["sel_data"], parsed["sel_count"])
        assert sels.shape == (parsed["sel_count"], 4)
        basisu.decode_tables(parsed["tab_data"])
    assert n_legacy <= 2


def test_mip_cross_consistency():
    """Independently-coded mip levels must agree: downsampled level N ~=
    level N+1. Catches any slice-decode semantic error."""
    for p in FILES[:8]:
        parsed = _load(p)
        if parsed["levels"] < 6:
            continue
        lev = parsed["levels"] - 7  # ~64x64 for 2048^2 sources
        a = basisu.decode_level(parsed, lev)[..., :3].astype(np.float32)
        b = basisu.decode_level(parsed, lev + 1)[..., :3].astype(np.float32)
        down = (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2]
                + a[1::2, 1::2]) / 4
        diff = np.abs(down - b).mean()
        assert diff < 16.0, f"{os.path.basename(p)}: mip diff {diff:.1f}"


def test_transcode_sizes_and_alpha():
    p = [f for f in FILES if "albedo" in f][0]
    img = basisu.transcode_ktx2(open(p, "rb").read(), max_size=512)
    assert img.shape == (512, 512, 4)
    assert img.dtype == np.uint8
    assert 40 < img[..., :3].mean() < 220  # image-like, not noise/flat
    assert img[..., 3].min() == 255  # opaque albedo

    # full-res decode also works
    img0 = basisu.transcode_ktx2(open(p, "rb").read(), max_size=0)
    assert img0.shape[0] >= 1024


def test_transcode_white_legacy_palette():
    p = [f for f in FILES if "white" in f]
    if not p:
        pytest.skip("white.ktx2 not bundled")
    # the file's own ETC1S codebook tops out at base5=23 + inten0 (+8):
    # ~197 gray is the exact content every transcoder produces for it
    img = basisu.transcode_ktx2(open(p[0], "rb").read())
    assert img is not None and img[..., :3].min() >= 180


def test_ktx2_loader_routes_basis():
    from idkengine_tpu.scene.ktx2 import decode_ktx2

    img = decode_ktx2(open(FILES[0], "rb").read())
    assert img is not None and img.ndim == 3 and img.shape[2] == 4
