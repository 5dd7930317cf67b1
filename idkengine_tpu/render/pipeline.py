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

from dataclasses import dataclass, field, replace

import jax.numpy as jnp
import numpy as np

from ..log import get_logger
from ..ops.packet_trace import PACKET, packet_trace_any, packet_trace_closest
from ..ops.trace import trace_any, trace_closest
from ..utils import mathutil as mu
from . import adaptive as adaptive_mod
from . import bloom as bloom_mod
from . import shadowmap as shadowmap_mod
from . import deferred as deferred_mod
from . import denoise as denoise_mod
from . import ssao as ssao_mod
from . import ssr as ssr_mod
from . import taa as taa_mod
from . import tonemap as tonemap_mod
from . import upscale as upscale_mod
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
    use_oit: bool = False  # depth-peeled transparency (ref: OIT #26)
    oit_layers: int = 4
    use_classifier: bool = False  # adaptive-rate map (ref: VRS #29)
    shadows: str = "ray_traced"  # none | pcf | ray_traced (ref modes)
    shadow_map_res: int = 256
    # render-scale mode (the FSR2 slot, ref: RasterPipeline.cs:611-624):
    # render the whole frame graph at (H/render_scale, W/render_scale) and
    # TAAU-resolve to display resolution. 1 = native + plain TAA.
    render_scale: int = 1
    upscale: upscale_mod.UpscaleSettings = field(
        default_factory=upscale_mod.UpscaleSettings)
    ssr: ssr_mod.SsrSettings = field(default_factory=ssr_mod.SsrSettings)
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
        self._shadow_mgr = None
        self.rate_map = None
        if self.settings.use_vxgi:
            lo = scene_db.blas.nodes["min"][0] - 0.1
            hi = scene_db.blas.nodes["max"][0] + 0.1
            self.voxel_grid = VoxelGrid(lo, hi, self.settings.vxgi)

    # -- trace dispatch ----------------------------------------------------
    def _use_packet(self):
        return self.settings.use_packet_tracer and self.db.packet_scene is not None

    def _closest(self, o, d, t_max):
        if self._use_packet():
            return packet_trace_closest(self.db.packet_scene, o, d, t_max)
        return trace_closest(self.db.device_scene, o, d, t_max)

    def _occluded(self, o, d, t_max):
        if self._use_packet():
            return packet_trace_any(self.db.packet_scene, o, d, t_max)
        return trace_any(self.db.device_scene, o, d, t_max)

    # -- frame graph ---------------------------------------------------
    def render_frame(self, camera: Camera, time: float = 0.0) -> jnp.ndarray:
        """Returns the tonemapped (H,W,3) uint8-ready [0,1] image."""
        s = self.settings
        rs = max(1, int(s.render_scale))
        if rs > 1:
            assert self.width % rs == 0 and self.height % rs == 0, (
                "render_scale must divide the display resolution",
                self.width, self.height, rs)
        # render-scale mode: the WHOLE frame graph runs at render res and
        # the TAAU resolve reconstructs display res (the FSR2 role, ref:
        # RasterPipeline.cs:611-624) — that's where the pass saves its time
        w, h = self.width // rs, self.height // rs
        lights = {k: jnp.asarray(v) for k, v in self.db.lights.soa().items() if k != "count"}
        n_lights = len(self.db.lights.lights)
        scene = self.db.device_scene

        # TAA jitter (Halton, ref: RasterPipeline.cs:266-299)
        jitter = (mu.halton_2d(16)[self.frame % 16]
                  if (s.use_taa or rs > 1) else np.array([0.5, 0.5]))
        cam_params = camera.ray_params(w, h)
        prev_cam = self._prev_cam_params or cam_params

        # [VXGI] voxelize + mips (ref: Voxelizer.Render)
        gi = None
        if s.use_vxgi and self.voxel_grid is not None and n_lights > 0:
            self.voxel_grid.voxelize(
                scene, self.mats, lights, n_lights, frame=self.frame,
                occlusion_fn=self._occluded,
            )

        # G-buffer (primary visibility); TAA/TAAU bias the texture LOD so
        # the temporal resolve can recover the sharper detail
        # (ref: TAAResolve.cs:76-80)
        bias = taa_mod.mip_bias(w, self.width) if (rs > 1 or s.use_taa) else 0.0
        gbuf = render_gbuffer(
            self._closest, scene, self.mats, cam_params, prev_cam, w, h,
            jitter=jnp.asarray(jitter, jnp.float32), mip_bias=bias,
            slot_shading=(self.db.slot_shading()
                          if hasattr(self.db, "slot_shading") else None),
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

        # deferred lighting + shadows (ray-traced or PCF cube maps)
        occ = self._occluded if s.shadows == "ray_traced" else None
        pcf_fn = None
        if s.shadows == "pcf" and n_lights > 0:
            if self._shadow_mgr is None:
                self._shadow_mgr = shadowmap_mod.PointShadowManager(
                    lambda o, d, tm: self._closest(o, d, tm).t, s.shadow_map_res
                )
            # per-face SAT culling against the camera frustum — faces the
            # camera can't see skip their 6*res^2-ray build (ref:
            # CpuPointShadow.cs:116-185 per-face frustum culling)
            cam_frustum = camera.frustum(w, h)
            maps = [
                self._shadow_mgr.update(li, self.db.lights.lights[li].position,
                                        camera_frustum=cam_frustum)
                for li in range(n_lights)
            ]
            pcf_fn = lambda li, pts: shadowmap_mod.pcf_visibility(maps[li], pts)
        dsettings = replace(s.deferred, shadow_mode=s.shadows) \
            if s.shadows != s.deferred.shadow_mode else s.deferred
        color = deferred_mod.shade_deferred(
            gbuf, lights, n_lights, cam_params["origin"], occ,
            dsettings, gi=gi, ao=ao, frame=self.frame, pcf_fn=pcf_fn,
        )

        # depth-peeled OIT over the opaque result (ref: RecordTransparent/
        # ResolveTransparent; layers arrive depth-ordered by construction)
        if s.use_oit:
            color = self._composite_transparency(
                color, cam_params, jitter, lights, n_lights)

        # SSR merge (ref: SSR then MergeTextures); misses fall back to the
        # sky along the reflected direction (ref: SSR/compute.glsl:79-81)
        if s.use_ssr:
            refl, ok, _t = ssr_mod.ssr(
                color, gbuf.position, gbuf.normal, gbuf.depth, cam_params,
                settings=s.ssr)
            f = (1.0 - gbuf.roughness[..., None]) * gbuf.mask[..., None]
            color = color + refl * f * 0.5

        # volumetric light, shadow-traced per march sample (ref:
        # VolumetricLight/compute.glsl:79 tests occlusion every step)
        if s.use_volumetric and n_lights > 0:
            vol_occ = self._occluded if s.shadows != "none" else None
            color = color + vol_mod.volumetric_light(
                gbuf.position, gbuf.depth, cam_params["origin"],
                lights["pos"], lights["radiance"], n_lights, vol_occ,
            )

        # bloom
        if s.use_bloom:
            color = color + bloom_mod.bloom(color, s.bloom)

        # TAA resolve (native res) or TAAU upscale resolve (render-scale
        # mode: reconstruct display res from the jittered low-res frames)
        if rs > 1:
            vel_hr = upscale_mod.upsample_bilinear(gbuf.velocity, rs) * rs
            up_set = s.upscale if s.upscale.scale == rs else \
                replace(s.upscale, scale=rs)
            self.history = upscale_mod.taau_resolve(
                color, self.history, vel_hr,
                (float(jitter[0]) - 0.5, float(jitter[1]) - 0.5), up_set)
            color = self.history[..., :3]
        elif s.use_taa:
            if self.history is None:
                self.history = color
            color = taa_mod.taa_resolve(
                color, self.history, gbuf.velocity, 1.0 / jnp.maximum(gbuf.depth, 1e-3),
                s.taa,
            )
            self.history = color

        # adaptive-rate classifier map (ref: VRS tiles; consumers can feed
        # this back as per-tile sample budgets)
        if s.use_classifier:
            self.rate_map = adaptive_mod.classify(color, gbuf.velocity)

        self._prev_cam_params = cam_params
        self.frame += 1
        return tonemap_mod.tonemap(color, s.tonemap)

    def _composite_transparency(self, opaque_color, cam_params, jitter,
                                lights, n_lights):
        """Depth-peel transparent surfaces along camera rays, shade EVERY
        layer with the full per-light loop + shadows (ref:
        RecordTransparent/fragment.glsl:77-93 — transparent fragments get
        the same lighting as opaque ones), and composite front-to-back over
        the opaque shading (render/oit.py)."""
        from ..utils.compression import decompress_normal
        from .camera import generate_rays
        from .pathtracer import _sample_atlas

        from . import oit as oit_mod

        s = self.settings
        h, w = opaque_color.shape[:2]  # render res (render-scale aware)
        o, d = generate_rays(cam_params, w, h, jnp.asarray(jitter, jnp.float32))
        mats = self.mats
        scene = self.db.device_scene
        trans_of = mats["transmission"]
        occ_fn = self._occluded if s.shadows == "ray_traced" and n_lights else None

        def trace(o_, d_, t_min, t_far):
            hit = self._closest(o_ + d_ * t_min[..., None], d_, t_far)
            p = o_ + d_ * (t_min + hit.t)[..., None]
            return hit.t, hit.slot >= 0, p, hit.slot, hit.u, hit.v

        def shade(t, valid, p, slot_raw, u, v):
            slot = jnp.maximum(slot_raw, 0)
            mid = scene.tri_mat[slot]
            base = mats["base_color"][mid]
            w_b = 1.0 - u - v
            uv = (scene.tri_uv[slot, 0] * w_b[..., None]
                  + scene.tri_uv[slot, 1] * u[..., None]
                  + scene.tri_uv[slot, 2] * v[..., None])
            tex = _sample_atlas(mats["atlas"], mats["base_layer"][mid], uv)
            alb = base[:, :3] * tex[..., :3]
            a = jnp.where(
                trans_of[mid] > 0.0, 1.0 - trans_of[mid],
                jnp.where(base[:, 3] < 1.0, base[:, 3] * tex[..., 3], 1.0),
            )
            # opaque hits end the peel WITHOUT compositing — the opaque
            # pass already shaded them
            stop = a >= 0.999
            n0 = decompress_normal(scene.tri_n[slot, 0], jnp)
            n1 = decompress_normal(scene.tri_n[slot, 1], jnp)
            n2 = decompress_normal(scene.tri_n[slot, 2], jnp)
            ns = n0 * w_b[..., None] + n1 * u[..., None] + n2 * v[..., None]
            ns = ns / jnp.maximum(
                jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-12)
            ns = jnp.where((jnp.sum(ns * d, axis=-1) > 0.0)[..., None], -ns, ns)
            mr = _sample_atlas(mats["atlas"], mats["mr_layer"][mid], uv)
            met = mats["metallic"][mid] * mr[..., 2]
            rough = mats["roughness"][mid] * mr[..., 1]
            rgb = deferred_mod.shade_points(
                p, ns, alb, met, rough, cam_params["origin"], lights,
                n_lights, occ_fn, s.deferred, frame=self.frame)
            em = _sample_atlas(mats["atlas"], mats["emissive_layer"][mid], uv)
            rgb = rgb + mats["emissive"][mid] * em[..., :3]
            return rgb, a, stop

        color, alpha = oit_mod.peel_layers(
            trace, shade, o, d, jnp.full((w * h,), 3.4e38, jnp.float32),
            layers=s.oit_layers)
        return oit_mod.composite_over(
            color.reshape(h, w, 3), alpha.reshape(h, w), opaque_color
        )


@dataclass
class PtPipelineSettings:
    denoise_at_samples: int = 32  # ref: PathTracerPipeline auto-denoise threshold
    output: str = "denoised"  # noisy | denoised | albedo | normal (ref selector)
    # adaptive bounce budget from the rate classifier (render/adaptive.py):
    # smooth tiles terminate paths earlier next frame (the VRS feedback —
    # ref LightingShadingRateClassifier actually changes shading cost)
    adaptive_rate: bool = False
    # SPMD over a device mesh (parallel/shard.py): 0 = single device,
    # -1 = all visible devices, n = first n. The ray megabatch is the
    # data-parallel axis; scene/BVH/materials replicate per chip.
    shard_devices: int = 0
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
            wave_boxes=scene_db.wave_set(),
            instances=scene_db.instance_set(),
            inst_attr_srcs=getattr(scene_db, "_inst_attr_srcs", None),
            slot_shading=(scene_db.slot_shading()
                          if hasattr(scene_db, "slot_shading") else None),
        )
        n_shard = self.settings.shard_devices
        if n_shard:
            import jax

            from ..parallel.shard import ShardedPathTracer, make_mesh

            n = len(jax.devices()) if n_shard < 0 else n_shard
            if n > 1:
                self.pt = ShardedPathTracer(self.pt, make_mesh(n))
        self.width, self.height = width, height

    def reset_accumulation(self):
        self.pt.reset_accumulation()
        self._rate_depth = None

    def render_frame(self, camera: Camera) -> jnp.ndarray:
        s = self.settings
        img = self.pt.render_frame(camera,
                                   rate_depth=getattr(self, "_rate_depth", None))
        alb, nrm, dep = self.pt._last_aovs
        if s.adaptive_rate and self.pt.accumulated_samples >= 2:
            from . import adaptive

            h_, w_ = self.height, self.width
            rate = adaptive.classify(img, jnp.zeros((h_, w_, 2)))
            depth = jnp.clip(
                jnp.round(self.pt.settings.ray_depth * rate), 1,
                self.pt.settings.ray_depth).astype(jnp.int32)
            # expand 16x16 tiles to pixels (flat raster order); edge tiles
            # the VALID reduce dropped keep the full budget
            dm = jnp.repeat(jnp.repeat(depth, adaptive.TILE, 0),
                            adaptive.TILE, 1)
            dm = jnp.pad(dm, ((0, max(0, h_ - dm.shape[0])),
                              (0, max(0, w_ - dm.shape[1]))),
                         constant_values=self.pt.settings.ray_depth)
            self._rate_depth = dm[:h_, :w_].reshape(-1)
        h, w = self.height, self.width
        if s.output == "albedo":
            return jnp.clip(alb.reshape(h, w, 3), 0, 1)
        if s.output == "normal":
            return nrm.reshape(h, w, 3) * 0.5 + 0.5
        color = img
        if s.output == "denoised" and self.pt.accumulated_samples >= s.denoise_at_samples:
            color = denoise_mod.atrous_denoise(
                img, alb.reshape(h, w, 3), nrm.reshape(h, w, 3), dep.reshape(h, w),
                s.denoise, variance=self.pt.variance(),
            )
        if s.use_bloom:
            color = color + bloom_mod.bloom(color, s.bloom)
        return tonemap_mod.tonemap(color, s.tonemap)
