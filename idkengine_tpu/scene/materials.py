"""Material table: SoA material params + texture atlas for the device.

TPU re-design of the reference's bindless-texture material system
(ref: GpuTypes/GpuMaterial.cs:12-19 — five texture slots per material,
ARB bindless handles): TPUs have no texture units, so all decoded textures
are packed into ONE fixed-size RGBA8 atlas array (LAYERS x SIZE x SIZE),
point/bilinear-sampled by uv-scaled gathers. Materials without a decodable
texture fall back to factor-only (atlas layer -1).
"""
from __future__ import annotations

import numpy as np

from ..log import get_logger
from .model import Model

log = get_logger(__name__)

ATLAS_SIZE = 512  # each layer is SIZE x SIZE RGBA8
ATLAS_MIPS = 7  # mip levels packed per layer (512 .. 8)


def _build_mip_strip(layer: np.ndarray) -> np.ndarray:
    """Pack a (S,S,4) uint8 layer + its box-filtered mip chain into a
    (S, 2S, 4) strip: mip0 on the left half; mip k>=1 at x in [S, S+S/2^k),
    y offset S - 2*(S>>k). The reference transcodes full BC mip chains
    (ref: ModelLoader.cs:922-1111); single-level sampling aliases under
    minification and starves TAA/TAAU of stable detail."""
    s = layer.shape[0]
    strip = np.zeros((s, 2 * s, 4), np.uint8)
    strip[:, :s] = layer
    cur = layer.astype(np.uint16)
    for k in range(1, ATLAS_MIPS):
        cur = (
            cur[0::2, 0::2].astype(np.uint32) + cur[0::2, 1::2]
            + cur[1::2, 0::2] + cur[1::2, 1::2] + 2
        ) // 4
        sk = s >> k
        y0 = s - 2 * sk
        strip[y0:y0 + sk, s:s + sk] = cur.astype(np.uint8)
        cur = cur.astype(np.uint16)
    return strip


class MaterialTable:
    """Accumulates materials from all models into device SoA arrays."""

    def __init__(self):
        self.base_color: list[np.ndarray] = []
        self.emissive: list[np.ndarray] = []
        self.metallic: list[float] = []
        self.roughness: list[float] = []
        self.ior: list[float] = []
        self.transmission: list[float] = []
        self.absorbance: list[np.ndarray] = []
        self.alpha_cutoff: list[float] = []
        self.base_layer: list[int] = []  # atlas layer for base color (-1 none)
        self.mr_layer: list[int] = []
        self.emissive_layer: list[int] = []
        self.normal_layer: list[int] = []
        self._atlas_layers: list[np.ndarray] = []

    def _add_texture(self, tex) -> int:
        if tex is None or tex.data is None:
            return -1
        from PIL import Image

        img = Image.fromarray(tex.data)
        img = img.resize((ATLAS_SIZE, ATLAS_SIZE), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)
        if tex.is_srgb:
            # linearize once at load; device samples linear values
            f = (arr[..., :3].astype(np.float32) / 255.0) ** 2.2
            arr = arr.copy()
            arr[..., :3] = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        self._atlas_layers.append(arr)
        return len(self._atlas_layers) - 1

    def add_model(self, model: Model) -> int:
        """Append model materials; returns the material index offset."""
        offset = len(self.base_color)
        tex_layer_cache: dict[int, int] = {}

        def layer_for(ti: int) -> int:
            if ti < 0 or ti >= len(model.textures):
                return -1
            if ti not in tex_layer_cache:
                tex_layer_cache[ti] = self._add_texture(model.textures[ti])
            return tex_layer_cache[ti]

        for m in model.materials:
            self.base_color.append(np.asarray(m.base_color, np.float32))
            self.emissive.append(np.asarray(m.emissive, np.float32))
            self.metallic.append(float(m.metallic))
            self.roughness.append(float(m.roughness))
            self.ior.append(float(m.ior))
            self.transmission.append(float(m.transmission))
            self.absorbance.append(np.asarray(m.absorbance, np.float32))
            self.alpha_cutoff.append(float(m.alpha_cutoff))
            self.base_layer.append(layer_for(m.base_color_texture))
            self.mr_layer.append(layer_for(m.metallic_roughness_texture))
            self.emissive_layer.append(layer_for(m.emissive_texture))
            self.normal_layer.append(layer_for(m.normal_texture))
        return offset

    def adopt_texture(self, model: Model, mat_offset: int, ti: int,
                      tex) -> int:
        """Late-arriving texture (async decode finished): pack it into the
        atlas and point every material slot that references texture `ti` at
        the new layer. Returns the layer id (-1 on decode failure)."""
        layer = self._add_texture(tex)
        if layer < 0:
            return -1
        for mi, m in enumerate(model.materials):
            g = mat_offset + mi
            if g >= len(self.base_color):
                continue
            if m.base_color_texture == ti:
                self.base_layer[g] = layer
            if m.metallic_roughness_texture == ti:
                self.mr_layer[g] = layer
            if m.emissive_texture == ti:
                self.emissive_layer[g] = layer
            if m.normal_texture == ti:
                self.normal_layer[g] = layer
        return layer

    def atlas_layer(self, layer: int) -> np.ndarray:
        """One packed atlas layer incl. its mip strip (SIZE, 2*SIZE, 4)."""
        return _build_mip_strip(self._atlas_layers[layer])

    def soa(self) -> dict[str, np.ndarray]:
        if not self.base_color:
            from .model import Material

            model = Model()
            model.materials = [Material(name="default")]
            self.add_model(model)
        atlas = (
            np.stack([_build_mip_strip(a) for a in self._atlas_layers])
            if self._atlas_layers
            else np.zeros((1, ATLAS_SIZE, 2 * ATLAS_SIZE, 4), np.uint8)
        )
        return {
            "base_color": np.stack(self.base_color),
            "emissive": np.stack(self.emissive),
            "metallic": np.asarray(self.metallic, np.float32),
            "roughness": np.asarray(self.roughness, np.float32),
            "ior": np.asarray(self.ior, np.float32),
            "transmission": np.asarray(self.transmission, np.float32),
            "absorbance": np.stack(self.absorbance),
            "alpha_cutoff": np.asarray(self.alpha_cutoff, np.float32),
            "base_layer": np.asarray(self.base_layer, np.int32),
            "mr_layer": np.asarray(self.mr_layer, np.int32),
            "emissive_layer": np.asarray(self.emissive_layer, np.int32),
            "normal_layer": np.asarray(self.normal_layer, np.int32),
            "atlas": atlas,
        }
