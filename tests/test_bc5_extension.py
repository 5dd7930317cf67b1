"""IDK_BC5_normal_metallicRoughness channel semantics.

The extension packs normal X / metalness in R and normal Y / roughness in
A so BasisU payloads can transcode to BC5_RG (ref:
glTF-Extensions/IDK_BC5_normal_metallicRoughness/README.md:27-40; consumed
at ModelLoader.cs:601-610 + 966-994). All three bundled compressed models
(HelmetCompressed, SponzaCompressed, LucyCompressed) declare it; the loader
must normalize decoded pixels to the standard glTF layout the samplers
read (metallic from B, roughness from G, normal XYZ from RGB).
"""
import json
import os

import numpy as np
import pytest

from idkengine_tpu.scene.gltf import apply_channel_layout, load_gltf

HELMET = "/root/reference/IDKEngine/Resource/Models/HelmetCompressed/Helmet.gltf"


def test_apply_channel_layout_normal_reconstruction():
    # a synthetic BC5 normal payload: X in R, Y in A, garbage in G/B
    img = np.zeros((2, 2, 4), np.uint8)
    img[..., 1] = 13  # garbage
    img[..., 2] = 200  # garbage
    # X=+0.6, Y=-0.4 -> Z = sqrt(1-.36-.16)=sqrt(.48)
    img[..., 0] = round((0.6 * 0.5 + 0.5) * 255)
    img[..., 3] = round((-0.4 * 0.5 + 0.5) * 255)
    out = apply_channel_layout(img, "bc5_normal")
    x = out[..., 0] / 255 * 2 - 1
    y = out[..., 1] / 255 * 2 - 1
    z = out[..., 2] / 255 * 2 - 1
    np.testing.assert_allclose(x, 0.6, atol=2 / 255)
    np.testing.assert_allclose(y, -0.4, atol=2 / 255)
    np.testing.assert_allclose(z, np.sqrt(0.48), atol=2 / 255)
    assert (out[..., 3] == 255).all()


def test_apply_channel_layout_mr():
    img = np.zeros((1, 3, 4), np.uint8)
    img[..., 0] = [10, 128, 255]  # metalness (spec: R)
    img[..., 3] = [200, 50, 0]    # roughness (spec: A)
    img[..., 1] = 99  # garbage
    img[..., 2] = 77  # garbage
    out = apply_channel_layout(img, "bc5_mr")
    # standard glTF layout: roughness in G, metallic in B
    np.testing.assert_array_equal(out[..., 2], img[..., 0])
    np.testing.assert_array_equal(out[..., 1], img[..., 3])


def test_apply_channel_layout_passthrough():
    img = np.arange(16, dtype=np.uint8).reshape(2, 2, 4)
    assert apply_channel_layout(img, None) is img
    assert apply_channel_layout(None, "bc5_mr") is None
    with pytest.raises(ValueError):
        apply_channel_layout(img, "bogus")


@pytest.mark.skipif(not os.path.exists(HELMET),
                    reason="reference models not present")
def test_helmet_compressed_bc5_swizzle():
    """HelmetCompressed declares the extension; its decoded normal/MR
    textures must be re-swizzled from the R/A payload layout."""
    with open(HELMET, encoding="utf-8") as f:
        g = json.load(f)
    assert "IDK_BC5_normal_metallicRoughness" in g["extensionsUsed"]

    model = load_gltf(HELMET, optimize=False)
    mat = model.materials[0]
    ntex = model.textures[mat.normal_texture]
    mrtex = model.textures[mat.metallic_roughness_texture]
    assert ntex.channel_layout == "bc5_normal"
    assert mrtex.channel_layout == "bc5_mr"
    base = model.textures[mat.base_color_texture]
    assert base.channel_layout is None

    # cross-check against a raw (un-swizzled) decode of the same payload
    from idkengine_tpu.scene.gltf import _GltfFile, _decode_image

    gf = _GltfFile(HELMET)
    tex_json = g["textures"][mat.metallic_roughness_texture]
    src = tex_json["extensions"]["KHR_texture_basisu"]["source"]
    raw, hint = gf.image_bytes(src)
    plain = _decode_image(raw, hint)
    # metallic now in B (was R), roughness in G (was A)
    np.testing.assert_array_equal(mrtex.data[..., 2], plain[..., 0])
    np.testing.assert_array_equal(mrtex.data[..., 1], plain[..., 3])

    # normal map: unit-length XYZ after reconstruction
    n = ntex.data[..., :3].astype(np.float32) / 255 * 2 - 1
    ln = np.linalg.norm(n, axis=-1)
    assert float(np.abs(ln - 1.0).mean()) < 0.02
    assert (ntex.data[..., 2].astype(np.int32) >= 127).all()  # Z >= 0
