"""Render pipelines: the deferred pipeline and the path-tracing pipeline.

Orchestrators equivalent to the reference's two interchangeable pipelines
(ref: Source/Render/RasterPipeline.cs:264-625 and PathTracerPipeline.cs):

DeferredPipeline frame graph (the reference's raster graph re-thought as
ray + image-space passes — SURVEY.md §7 step 8):
  TAA jitter → [VXGI voxelize] → G-buffer (primary rays) → RT shadows +
  deferred lighting (+ cone-traced GI / ambient, SSAO) → SSR → volumetric →
  bloom → TAA resolve → tonemap.

PathTracerPipeline: accumulate PT samples → on-device denoise at the sample
threshold → bloom → tonemap (ref: PathTracerPipeline auto-denoise
:155-163 and output selector :13-67).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..log import get_logger
from ..ops.packet_trace import PACKET, packet_trace_any, packet_trace_closest
from ..ops.trace import trace_any, trace_closest
from ..utils import mathutil as mu
from . import bloom as bloom_mod
from . import deferred as deferred_mod
from . import denoise as denoise_mod
from . import ssao as ssao_mod
from . import ssr as ssr_mod
from . import taa as taa_mod
from . import tonemap as tonemap_mod
from . import volumetric as vol_mod
from .camera import Camera
from .gbuffer import render_gbuffer
from .pathtracer import PathTracer, PathTracerSettings
from .vxgi import VoxelGrid, VxgiSettings

log = get_logger(__name__)


@dataclass
class DeferredSettings2:
    """Pass toggles (the reference's per-pass setting objects)."""

    use_vxgi: bool = False
    use_ssao: bool = True
    use_ssr: bool = False
    use_volumetric: bool = False
    use_taa: bool = True
    use_bloom: bool = True
    shadows: str = "ray_traced"  # none | ray_traced
    vxgi: VxgiSettings = field(default_factory=VxgiSettings)
    deferred: deferred_mod.DeferredSettings = field(
        default_factory=deferred_mod.DeferredSettings
    )
    taa: taa_mod.TaaSettings = field(default_factory=taa_mod.TaaSettings)
    bloom: bloom_mod.BloomSettings = field(default_factory=bloom_mod.BloomSettings)
    tonemap: tonemap_mod.TonemapSettings = field(
        default_factory=tonemap_mod.TonemapSettings
    )
    use_packet_tracer: bool = True


class DeferredPipeline:
    """The 'rasterizer mode' equivalent (ref: RasterPipeline.Render)."""

    def __init__(self, scene_db, width: int, height: int,
                 settings: DeferredSettings2 | None = None):
        self.db = scene_db
        self.width = width
        self.height = height
        self.settings = settings or DeferredSettings2()
        self.mats = {k: jnp.asarray(v) for k, v in scene_db.materials.soa().items()}
        self.frame = 0
        self.history = None
        self._prev_cam_params = None
        self.voxel_grid = None
        if self.settings.use_vxgi:
            lo = scene_db.blas.nodes["min"][0] - 0.1
            hi = scene_db.blas.nodes["max"][0] + 0.1
            self.voxel_grid = VoxelGrid(lo, hi, self.settings.vxgi)

    # -- trace dispatch ----------------------------------------------------
    def _closest(self, o, d, t_max):
        r = o.shape[0]
        if (
            self.settings.use_packet_tracer
            and self.db.packet_scene is not None
            and r % PACKET == 0
        ):
            return packet_trace_closest(self.db.packet_scene, o, d, t_max)
        return trace_closest(self.db.device_scene, o, d, t_max)

    def _occluded(self, o, d, t_max):
        r = o.shape[0]
        if (
            self.settings.use_packet_tracer
            and self.db.packet_scene is not None
            and r % PACKET == 0
        ):
            return packet_trace_any(self.db.packet_scene, o, d, t_max)
        return trace_any(self.db.device_scene, o, d, t_max)

    # -- frame graph ---------------------------------------------------
    def render_frame(self, camera: Camera, time: float = 0.0) -> jnp.ndarray:
        """Returns the tonemapped (H,W,3) uint8-ready [0,1] image."""
        s = self.settings
        w, h = self.width, self.height
        lights = {k: jnp.asarray(v) for k, v in self.db.lights.soa().items() if k != "count"}
        n_lights = len(self.db.lights.lights)
        scene = self.db.device_scene

        # TAA jitter (Halton, ref: RasterPipeline.cs:266-299)
        jitter = mu.halton_2d(16)[self.frame % 16] if s.use_taa else np.array([0.5, 0.5])
        cam_params = camera.ray_params(w, h)
        prev_cam = self._prev_cam_params or cam_params

        # [VXGI] voxelize + mips (ref: Voxelizer.Render)
        gi = None
        if s.use_vxgi and self.voxel_grid is not None and n_lights > 0:
            self.voxel_grid.voxelize(
                scene, self.mats, lights, n_lights, frame=self.frame,
                occlusion_fn=self._occluded,
            )

        # G-buffer (primary visibility)
        gbuf = render_gbuffer(
            self._closest, scene, self.mats, cam_params, prev_cam, w, h,
            jitter=jnp.asarray(jitter, jnp.float32),
        )

        # SSAO
        ao = None
        if s.use_ssao:
            # view-space inputs: position relative to camera in cam basis
            rel = gbuf.position - cam_params["origin"]
            fwd = cam_params["forward"]
            view_z = -jnp.sum(rel * fwd, axis=-1)
            view_pos = jnp.stack(
                [jnp.sum(rel * cam_params["right"], axis=-1),
                 jnp.sum(rel * cam_params["up"], axis=-1),
                 -view_z], axis=-1)
            ao = ssao_mod.ssao(view_pos, gbuf.normal, self.frame)

        # cone-traced GI
        if s.use_vxgi and self.voxel_grid is not None:
            r = w * h
            gi = self.voxel_grid.cone_trace(
                gbuf.position.reshape(r, 3), gbuf.normal.reshape(r, 3), self.frame
            ).reshape(h, w, 3)

        # deferred lighting + RT shadows
        occ = self._occluded if s.shadows == "ray_traced" else None
        color = deferred_mod.shade_deferred(
            gbuf, lights, n_lights, cam_params["origin"], occ,
            s.deferred, gi=gi, ao=ao, frame=self.frame,
        )

        # SSR merge (ref: SSR then MergeTextures)
        if s.use_ssr:
            refl, ok = ssr_mod.ssr(color, gbuf.position, gbuf.normal, gbuf.depth, cam_params)
            f = (1.0 - gbuf.roughness[..., None]) * ok[..., None]
            color = color + refl * f * 0.5

        # volumetric light
        if s.use_volumetric and n_lights > 0:
            color = color + vol_mod.volumetric_light(
                gbuf.position, gbuf.depth, cam_params["origin"],
                lights["pos"], lights["radiance"], n_lights, None,
            )

        # bloom
        if s.use_bloom:
            color = color + bloom_mod.bloom(color, s.bloom)

        # TAA resolve
        if s.use_taa:
            if self.history is None:
                self.history = color
            color = taa_mod.taa_resolve(
                color, self.history, gbuf.velocity, 1.0 / jnp.maximum(gbuf.depth, 1e-3),
                s.taa,
            )
            self.history = color

        self._prev_cam_params = cam_params
        self.frame += 1
        return tonemap_mod.tonemap(color, s.tonemap)


@dataclass
class PtPipelineSettings:
    denoise_at_samples: int = 32  # ref: PathTracerPipeline auto-denoise threshold
    output: str = "denoised"  # noisy | denoised | albedo | normal (ref selector)
    use_bloom: bool = True
    bloom: bloom_mod.BloomSettings = field(default_factory=bloom_mod.BloomSettings)
    tonemap: tonemap_mod.TonemapSettings = field(
        default_factory=tonemap_mod.TonemapSettings
    )
    denoise: denoise_mod.DenoiseSettings = field(
        default_factory=denoise_mod.DenoiseSettings
    )


class PathTracerPipeline:
    """PT accumulation + on-device denoise + post (ref: PathTracerPipeline.cs)."""

    def __init__(self, scene_db, width: int, height: int,
                 pt_settings: PathTracerSettings | None = None,
                 settings: PtPipelineSettings | None = None,
                 env_map=None):
        self.db = scene_db
        self.settings = settings or PtPipelineSettings()
        self.pt = PathTracer(
            scene_db.device_scene,
            scene_db.materials.soa(),
            scene_db.lights.soa(),
            width, height, pt_settings, env_map=env_map,
            packet_scene=scene_db.packet_scene,
        )
        self.width, self.height = width, height

    def reset_accumulation(self):
        self.pt.reset_accumulation()

    def render_frame(self, camera: Camera) -> jnp.ndarray:
        s = self.settings
        img = self.pt.render_frame(camera)
        alb, nrm, dep = self.pt._last_aovs
        h, w = self.height, self.width
        if s.output == "albedo":
            return jnp.clip(alb.reshape(h, w, 3), 0, 1)
        if s.output == "normal":
            return nrm.reshape(h, w, 3) * 0.5 + 0.5
        color = img
        if s.output == "denoised" and self.pt.accumulated_samples >= s.denoise_at_samples:
            color = denoise_mod.atrous_denoise(
                img, alb.reshape(h, w, 3), nrm.reshape(h, w, 3), dep.reshape(h, w),
                s.denoise,
            )
        if s.use_bloom:
            color = color + bloom_mod.bloom(color, s.bloom)
        return tonemap_mod.tonemap(color, s.tonemap)
