"""VXGI: voxelized global illumination — voxelize + mips + cone tracing.

TPU re-design of the reference's VXGI (ref: Source/Render/VXGI/
Voxelizer/Voxelizer.cs + Resource/Shaders/VXGI/Voxelize/** and
ConeTracing/ConeTracer.cs + include/TraceCone.glsl):

  - The rasterizing voxelizer (3-viewport swizzle + imageAtomicMax,
    Voxelizer.cs:109-208) becomes SCATTER VOXELIZATION: every triangle is
    point-sampled proportionally to its area, each sample's direct radiance
    is computed (shadowed light), and samples scatter into the 3D grid with
    per-voxel max (the flicker-free equivalent of the reference's atomicMax
    path, Voxelize/fragment.glsl:68-78).
  - The compute mip chain (Voxelizer.cs:210-228) is a reduce_window chain.
  - Cone tracing (TraceCone.glsl:5-39) is the same front-to-back trilinear
    mip-march, vectorized over all query pixels.

Layout notes (TPU): all per-sample math is SoA over 1-D arrays — (N,3)
channel-minor arrays tile as (sublane, lane)=(N,3→128) on TPU, a 42x
memory blowup when materialized at fusion boundaries (measured: the
AoS voxelizer spent ~470 of 633 ms in layout-padded fusions). The grid
is channel-FIRST (4, R^3) so the minor dims stay dense, mips are one
reduce_window per level, and cone tracing samples a single flattened
mip atlas with computed per-level offsets (dynamic LOD = index math,
not a select over every level).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import voxel_scatter
from ..utils import rng as rng_mod
from . import sampling


@dataclass(frozen=True)
class VxgiSettings:
    """ref: Voxelizer/ConeTracer settings surfaces."""

    resolution: int = 128  # grid size per axis (reference default 256)
    # samples per (voxel_area) of triangle: 1.0 matches the reference's
    # raster-injection density (one fragment per covered voxel,
    # Voxelize/fragment.glsl) — the old 4.0 default was 4x oversampled and
    # scatter cost (~90 ns/update XLA floor, BENCH_NOTES) scales linearly
    samples_per_tri_unit: float = 1.0
    max_samples: int = 1 << 20
    cones: int = 6
    cone_aperture_deg: float = 32.0
    max_cone_distance: float = 0.6  # fraction of grid diagonal
    strength: float = 1.0


def _mips_atlas(radiance):
    """Mip chain + flattened atlas from the (4,R,R,R) radiance grid —
    one reduce_window per level on the channel-first grid (ref:
    Voxelizer.cs:210-228 compute mip chain)."""
    mips = [radiance]
    m = radiance
    while m.shape[1] > 4:
        m = jax.lax.reduce_window(
            m, 0.0, jax.lax.add,
            window_dimensions=(1, 2, 2, 2), window_strides=(1, 2, 2, 2),
            padding="VALID",
        ) * 0.125
        mips.append(m)
    atlas = jnp.concatenate([mm.reshape(4, -1) for mm in mips], axis=1)
    return tuple(mips), atlas


from functools import partial as _partial


@_partial(jax.jit,
          static_argnames=("res", "n_lights", "occlusion_fn"))
def _voxelize_frame(tri, tri_p0, tri_e1, tri_e2, tri_gn, tri_mat,
                    mat_base, mat_emis, lights, grid_min, grid_max, frame,
                    res: int, n_lights: int, occlusion_fn=None):
    """One voxelize pass: sample, light, scatter-max, mips, atlas.

    occlusion_fn is a STATIC argument — pass a stable callable (a bound
    method, not a fresh lambda) or jit retraces every frame."""
    budget = tri.shape[0]
    state = rng_mod.init_state(jnp.arange(budget, dtype=jnp.uint32), frame)
    state, uv = rng_mod.uniform2(state)
    su = jnp.sqrt(uv[..., 0])
    b1 = 1.0 - su
    b2 = uv[..., 1] * su
    # ONE packed row-gather for all per-sample attributes: separate
    # per-component gathers cost ~26 ns/index EACH on TPU irrespective
    # of table size (measured ~250 ms across 14 gathers); a single
    # (T,18) row gather pays that latency once.
    mat_tbl = jnp.concatenate([mat_base, mat_emis], axis=1)
    packed = jnp.concatenate(
        [tri_p0, tri_e1, tri_e2, tri_gn, mat_tbl[tri_mat]], axis=1)
    g = packed[tri]
    px = g[:, 0] + g[:, 3] * b1 + g[:, 6] * b2
    py = g[:, 1] + g[:, 4] * b1 + g[:, 7] * b2
    pz = g[:, 2] + g[:, 5] * b1 + g[:, 8] * b2
    nx, ny, nz = g[:, 9], g[:, 10], g[:, 11]
    ar, ag, ab = g[:, 12], g[:, 13], g[:, 14]

    # direct lighting at each sample (shadowed, all lights)
    rr, rg, rb = g[:, 15], g[:, 16], g[:, 17]
    for li in range(n_lights):
        l_pos = lights["pos"][li]
        l_rad = lights["radiance"][li]
        l_r = lights["radius"][li]
        tlx, tly, tlz = l_pos[0] - px, l_pos[1] - py, l_pos[2] - pz
        dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        inv = 1.0 / jnp.maximum(dist, 1e-8)
        ldx, ldy, ldz = tlx * inv, tly * inv, tlz * inv
        ndl = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
        att = jnp.pi * l_r * l_r / jnp.maximum(dist * dist, 1e-4)
        vis = 1.0
        if occlusion_fn is not None:
            o = jnp.stack(
                [px + nx * 1e-3, py + ny * 1e-3, pz + nz * 1e-3], -1)
            d = jnp.stack([ldx, ldy, ldz], -1)
            occ = occlusion_fn(o, d, dist - 1e-2)
            vis = 1.0 - occ.astype(jnp.float32)
        w = ndl * att * vis / jnp.pi
        rr = rr + ar * l_rad[0] * w
        rg = rg + ag * l_rad[1] * w
        rb = rb + ab * l_rad[2] * w

    # scatter with per-voxel MAX (flicker-free like the atomicMax path).
    # On TPU the sort + one-hot-MXU kernel replaces XLA scatter-max
    # (~90 ns/update floor, tools/bench_scatter.py); bf16 matches the
    # reference's rgba16f voxel precision (Voxelizer.cs:12-17).
    ext = grid_max - grid_min
    cx = jnp.clip((px - grid_min[0]) / ext[0] * res,
                  0, res - 1e-3).astype(jnp.int32)
    cy = jnp.clip((py - grid_min[1]) / ext[1] * res,
                  0, res - 1e-3).astype(jnp.int32)
    cz = jnp.clip((pz - grid_min[2]) / ext[2] * res,
                  0, res - 1e-3).astype(jnp.int32)
    cell_id = (cx * res + cy) * res + cz
    vals = jnp.stack([rr, rg, rb, jnp.ones((budget,), jnp.float32)], 0)
    n_cells = res * res * res
    if jax.default_backend() == "tpu" and n_cells % 128 == 0:
        grid = voxel_scatter.scatter_max_dense(cell_id, vals, n_cells,
                                               bf16=True)
    else:
        grid = jnp.zeros((4, n_cells), jnp.float32)
        grid = grid.at[:, cell_id].max(vals)
    radiance = grid.reshape(4, res, res, res)
    mips, atlas = _mips_atlas(radiance)
    return radiance, mips, atlas


class VoxelGrid:
    """World-aligned radiance grid (ref: rgba16f 3D texture, UBO 7 params)."""

    def __init__(self, grid_min, grid_max, settings: VxgiSettings = VxgiSettings()):
        self.settings = settings
        self.grid_min = jnp.asarray(grid_min, jnp.float32)
        self.grid_max = jnp.asarray(grid_max, jnp.float32)
        self.radiance = None  # (4,R,R,R) f32 — rgb + opacity, channel-first
        self.mips: list = []
        self._atlas = None  # (4, sum R_l^3) flattened mip chain
        # static per-level tables for the atlas (filled by _build_mips)
        self._res_levels = None
        self._offsets = None
        # per-scene cached sample->triangle assignment (host, once):
        # the area-proportional map depends only on geometry + grid, not
        # the frame, so the monotone searchsorted runs in numpy once per
        # scene instead of a 90 ns/update device scatter every voxelize
        # (2.75M updates ~ 250 ms/frame at the bench scene).
        self._assign_key = None
        self._tri_assign = None

    # ------------------------------------------------------------------
    def voxelize(self, scene, mats, lights, n_lights: int, frame=0,
                 occlusion_fn=None):
        """Scatter-voxelize direct lighting into the grid.

        scene: SceneArrays (tri SoA); mats/lights: device dicts;
        occlusion_fn(o, d, t_max) -> bool occluded (for shadowed injection).
        Returns the channel-first (4,R,R,R) grid.
        """
        s = self.settings
        res = s.resolution
        t = scene.tri_p0.shape[0]

        # Deterministic area-proportional sample -> triangle assignment,
        # computed ON HOST once per scene (see __init__ note). Samples are
        # uniformly spaced in cumulative-area space, so the map is a
        # monotone searchsorted — numpy does 1M queries into 2.75M keys in
        # ~100 ms, once, vs a 2.75M-update device scatter every frame (the
        # device alternatives both lose: scatter-max ~90 ns/update,
        # jnp.searchsorted lowers to a serial while loop, 127 ms/1M).
        akey = (id(scene.tri_p0), t, res, s.max_samples,
                s.samples_per_tri_unit)
        if self._assign_key != akey:
            e1 = np.asarray(scene.tri_e1)
            e2 = np.asarray(scene.tri_e2)
            area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
            voxel = np.asarray(self.grid_max - self.grid_min) / res
            vox_area = float(np.mean(voxel)) ** 2
            want = np.clip(np.ceil(
                area / max(vox_area, 1e-12) * s.samples_per_tri_unit),
                1.0, 64.0)
            total = np.cumsum(want)
            budget = int(min(s.max_samples, total[-1]))
            u = (np.arange(budget, dtype=np.float64) + 0.5) * (
                total[-1] / budget)
            tri_np = np.minimum(
                np.searchsorted(total, u, side="right"), t - 1)
            self._tri_assign = jnp.asarray(tri_np.astype(np.int32))
            self._assign_key = akey
        tri = self._tri_assign

        # The whole per-frame pass (sampling, lighting, scatter, mips,
        # atlas) runs as ONE jitted program: the eager per-op dispatch
        # alone cost ~1-2 ms/op over the device tunnel and blocked every
        # cross-op fusion (round-5 driver capture: 533 ms at 2.8M where
        # the jitted pass is budgeted <100 ms).
        out = _voxelize_frame(
            tri, scene.tri_p0, scene.tri_e1, scene.tri_e2, scene.tri_gn,
            scene.tri_mat, mats["base_color"][:, :3],
            mats["emissive"][:, :3], lights, self.grid_min, self.grid_max,
            jnp.uint32(frame), res=res, n_lights=n_lights,
            occlusion_fn=occlusion_fn)
        self.radiance, self.mips, self._atlas = (
            out[0], list(out[1]), out[2])
        self._set_mip_tables()
        return self.radiance

    # ------------------------------------------------------------------
    def _set_mip_tables(self):
        self._res_levels = jnp.asarray(
            [m.shape[1] for m in self.mips], jnp.int32)
        sizes = [int(m.shape[1]) ** 3 for m in self.mips]
        self._offsets = jnp.asarray(
            np.concatenate([[0], np.cumsum(sizes[:-1])]), jnp.int32)

    def _build_mips(self):
        """Average-downsample mip chain (ref: Voxelizer.cs mip compute)."""
        mips, atlas = _mips_atlas(self.radiance)
        self.mips = list(mips)
        self._atlas = atlas
        self._set_mip_tables()

    # ------------------------------------------------------------------
    def _sample_level(self, lvl, px, py, pz):
        """Trilinear sample at per-sample dynamic mip level `lvl` (int (N,)).

        p in [0,1]^3 as 1-D component arrays. Returns (r,g,b,a) 1-D arrays.
        One atlas gather per corner — dynamic LOD is index arithmetic, not
        a select over every static level.
        """
        resl = jnp.take(self._res_levels, lvl).astype(jnp.float32)
        off = jnp.take(self._offsets, lvl)
        resi = jnp.take(self._res_levels, lvl)

        def axis(p):
            x = jnp.clip(p * resl - 0.5, 0.0, resl - 1.001)
            x0 = jnp.floor(x)
            return x0.astype(jnp.int32), x - x0

        x0, fx = axis(px)
        y0, fy = axis(py)
        z0, fz = axis(pz)
        x1 = jnp.minimum(x0 + 1, resi - 1)
        y1 = jnp.minimum(y0 + 1, resi - 1)
        z1 = jnp.minimum(z0 + 1, resi - 1)

        at = self._atlas

        def corner(ix, iy, iz):
            idx = off + (ix * resi + iy) * resi + iz
            return at[0, idx], at[1, idx], at[2, idx], at[3, idx]

        out = []
        c000 = corner(x0, y0, z0)
        c100 = corner(x1, y0, z0)
        c010 = corner(x0, y1, z0)
        c110 = corner(x1, y1, z0)
        c001 = corner(x0, y0, z1)
        c101 = corner(x1, y0, z1)
        c011 = corner(x0, y1, z1)
        c111 = corner(x1, y1, z1)
        for ch in range(4):
            c00 = c000[ch] * (1 - fx) + c100[ch] * fx
            c10 = c010[ch] * (1 - fx) + c110[ch] * fx
            c01 = c001[ch] * (1 - fx) + c101[ch] * fx
            c11 = c011[ch] * (1 - fx) + c111[ch] * fx
            c0 = c00 * (1 - fy) + c10 * fy
            c1 = c01 * (1 - fy) + c11 * fy
            out.append(c0 * (1 - fz) + c1 * fz)
        return out

    def sample_lod(self, p01, lod):
        """Sample with continuous LOD (lerp of the two bracketing levels).

        p01: (...,3) in [0,1]; lod: (...) float. Returns (...,4)."""
        shape = p01.shape[:-1]
        px = p01[..., 0].reshape(-1)
        py = p01[..., 1].reshape(-1)
        pz = p01[..., 2].reshape(-1)
        r, g, b, a = self._sample_lod_soa(px, py, pz,
                                          jnp.reshape(lod, (-1,)))
        return jnp.stack([r, g, b, a], -1).reshape(shape + (4,))

    def _sample_lod_soa(self, px, py, pz, lod):
        n_mips = len(self.mips)
        lod = jnp.clip(lod, 0.0, n_mips - 1.001)
        lo = jnp.floor(lod).astype(jnp.int32)
        f = lod - lo.astype(jnp.float32)
        v0 = self._sample_level(lo, px, py, pz)
        v1 = self._sample_level(jnp.minimum(lo + 1, n_mips - 1), px, py, pz)
        return tuple(a * (1 - f) + b * f for a, b in zip(v0, v1))

    # ------------------------------------------------------------------
    def cone_trace(self, origin, normal, frame=0):
        """Diffuse cone-traced GI for shade points (ref: TraceCone.glsl +
        ConeTraceGI Impl.glsl:26-76): N cones on the hemisphere, LOD from
        cone diameter, front-to-back alpha compositing."""
        s = self.settings
        res = s.resolution
        extent = self.grid_max - self.grid_min
        diag = jnp.linalg.norm(extent)
        voxel_size = jnp.mean(extent) / res
        tan_half = np.tan(np.radians(s.cone_aperture_deg) * 0.5)

        n_pts = origin.shape[0]
        ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
        tr = jnp.zeros((n_pts,), jnp.float32)
        tg = jnp.zeros((n_pts,), jnp.float32)
        tb = jnp.zeros((n_pts,), jnp.float32)
        state = rng_mod.init_state(jnp.arange(n_pts, dtype=jnp.uint32), frame)
        n_steps = 10
        inv_ext = 1.0 / extent
        for c in range(s.cones):
            state, u = rng_mod.uniform2(state)
            # stratified cosine cones around the normal
            cone_dir = sampling.cosine_hemisphere(normal, u)
            cdx, cdy, cdz = cone_dir[:, 0], cone_dir[:, 1], cone_dir[:, 2]
            ar = jnp.zeros((n_pts,), jnp.float32)
            ag = jnp.zeros((n_pts,), jnp.float32)
            ab = jnp.zeros((n_pts,), jnp.float32)
            occ = jnp.zeros((n_pts,), jnp.float32)
            t = voxel_size * 2.0
            for _ in range(n_steps):
                p0 = (ox + cdx * t - self.grid_min[0]) * inv_ext[0]
                p1 = (oy + cdy * t - self.grid_min[1]) * inv_ext[1]
                p2 = (oz + cdz * t - self.grid_min[2]) * inv_ext[2]
                diam = jnp.maximum(2.0 * tan_half * t, voxel_size)
                lod = jnp.broadcast_to(jnp.log2(diam / voxel_size), (n_pts,))
                vr, vg, vb, va = self._sample_lod_soa(p0, p1, p2, lod)
                inb = ((p0 >= 0.0) & (p0 <= 1.0) & (p1 >= 0.0) & (p1 <= 1.0)
                       & (p2 >= 0.0) & (p2 <= 1.0)).astype(jnp.float32)
                a = jnp.clip(va, 0.0, 1.0) * inb
                w = (1.0 - occ) * a
                ar = ar + w * vr * inb
                ag = ag + w * vg * inb
                ab = ab + w * vb * inb
                occ = jnp.minimum(occ + (1.0 - occ) * a, 1.0)
                t = t * 1.7 + voxel_size
                t = jnp.minimum(t, diag * s.max_cone_distance)
            tr, tg, tb = tr + ar, tg + ag, tb + ab
        k = s.strength / s.cones
        return jnp.stack([tr, tg, tb], -1) * k
