"""Multi-chip scaling: shard the ray megabatch over a device mesh.

The reference is single-GPU with no distribution story (SURVEY.md §5); the
TPU-native scaling axis is the wavefront ray pool — pure data parallelism
over pixels/rays with the BVH + materials replicated per chip. Collectives
only appear at image assembly (an all_gather the jit inserts from the output
sharding); there is NO per-bounce communication, so scaling rides ICI
bandwidth-free.

For scenes larger than per-chip HBM a ring-pass-the-scene variant over ICI
(the CP analogue from SURVEY.md §5) would shard the triangle arrays and
ppermute them through the bounce loop — not needed at current scene sizes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    """1-D device mesh over the ray axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (scene/materials/lights) onto every device."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_rays(mesh: Mesh, tree, axis: str = "rays"):
    """Shard leading (ray) axis of a pytree of (R, ...) arrays."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def shard_render(mesh: Mesh, render_sample_fn, axis: str = "rays"):
    """Wrap a PT sample function for SPMD execution: inputs replicated,
    radiance output sharded over rays. XLA partitions the whole bounce loop
    (raygen is pixel-index math, traversal/shading are elementwise over
    rays), so each chip traces its pixel slice independently."""
    repl = NamedSharding(mesh, P())
    by_rays = NamedSharding(mesh, P(axis))

    # 12 args: scene, mats, lights, env_map, cam_params, frame,
    # packet_scene, wave_boxes, rate_depth, instances, attr, swz_tables
    # (PathTracer._render_sample signature — attr/swz travel as args so
    # they don't bake into the HLO as constants)
    return jax.jit(
        render_sample_fn,
        in_shardings=(repl,) * 12,
        out_shardings=(by_rays, by_rays, by_rays, by_rays, repl),
    )


class ShardedPathTracer:
    """PathTracer wrapper that runs the sample step SPMD over a mesh.

    Usage:
        pt = PathTracer(...)
        spt = ShardedPathTracer(pt, make_mesh())
        img = spt.render_frame(camera)
    """

    def __init__(self, pt, mesh: Mesh):
        self.pt = pt
        self.mesh = mesh
        self._scene_r = replicate(mesh, pt.scene)
        self._mats_r = replicate(mesh, pt.mats)
        self._lights_r = replicate(mesh, pt.lights)
        self._env_r = None if pt.env_map is None else replicate(mesh, pt.env_map)
        self._packet_r = (None if pt.packet_scene is None
                          else replicate(mesh, pt.packet_scene))
        self._wave_boxes_r = (None if pt.wave_boxes is None
                              else replicate(mesh, pt.wave_boxes))
        self._inst_r = (None if pt.instances is None
                        else replicate(mesh, pt.instances))
        self._attr_r = replicate(mesh, pt._attr)
        self._swz_r = replicate(mesh, (pt._swz, pt._inv_swz))
        self._fn = shard_render(mesh, pt._render_sample)

    def __getattr__(self, name):
        # stand in for the wrapped PathTracer everywhere else (pipelines
        # read settings/accumulated_samples/_last_aovs/aov_* through us)
        return getattr(self.pt, name)

    def render_frame(self, camera, rate_depth=None):
        import jax.numpy as jnp

        cam_params = replicate(self.mesh, camera.ray_params(self.pt.width, self.pt.height))
        rd = None if rate_depth is None else replicate(self.mesh, rate_depth)
        radiance, alb, nrm, dep, nrays = self._fn(
            self._scene_r, self._mats_r, self._lights_r, self._env_r,
            cam_params, jnp.uint32(self.pt._frame),
            self._packet_r, self._wave_boxes_r, rd, self._inst_r,
            self._attr_r, self._swz_r,
        )
        n = self.pt.accumulated_samples
        self.pt.accum = (self.pt.accum * n + radiance) / (n + 1)
        self.pt.accumulated_samples = n + 1
        self.pt._frame += 1
        self.pt._last_aovs = (alb, nrm, dep)
        self.pt.last_rays_traced = nrays
        return self.pt.image()


# ---------------------------------------------------------------------------
# Packet/steered tracer under SPMD (shard_map over the ray axis)
# ---------------------------------------------------------------------------
# GSPMD cannot partition a Mosaic custom call (the scalar-prefetch grids of
# ops/packet_trace.py), so the production Pallas path is distributed with
# shard_map: every chip runs the SAME kernel on its ray slice with the
# segment tables replicated. No collectives anywhere in the trace — the hit
# arrays come back sharded like the rays went in (SURVEY.md §5: pure DP,
# comm only at image assembly).

def shard_packet_closest(mesh: Mesh, wave_set, axis: str = "rays",
                         interpret: bool = False, rows: int | None = None):
    """Sharded `packet_trace_closest_steered` over a WaveSet: returns
    fn(o, d, t_max) -> Hit with o/d/t_max (R,·) sharded on the ray axis.
    R/n_devices must be a multiple of the packet size (rows*128)."""
    from ..ops import packet_trace as _pt

    rows = _pt.PACKET_ROWS if rows is None else rows
    repl, ray = P(), P(axis)

    def local(pairs, leaf, smin, smax, o, d, t_max):
        return _pt.packet_trace_closest_steered(
            wave_set.segs, pairs, leaf, smin, smax, o, d, t_max,
            interpret=interpret, rows=rows, tag="spmd")

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(repl, repl, repl, repl, ray, ray, ray),
        out_specs=jax.tree_util.tree_map(lambda _: ray, _hit_struct()),
        check_vma=False,
    )


def shard_packet_any(mesh: Mesh, wave_set, axis: str = "rays",
                     interpret: bool = False, rows: int | None = None):
    """Sharded occlusion twin of shard_packet_closest."""
    from ..ops import packet_trace as _pt

    rows = _pt.PACKET_ROWS if rows is None else rows
    repl, ray = P(), P(axis)

    def local(pairs, leaf, smin, smax, o, d, t_max):
        return _pt.packet_trace_any_steered(
            wave_set.segs, pairs, leaf, smin, smax, o, d, t_max,
            interpret=interpret, rows=rows, tag="spmd")

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(repl, repl, repl, repl, ray, ray, ray),
        out_specs=ray,
        check_vma=False,
    )


def _hit_struct():
    from ..ops.trace import Hit
    return Hit(t=0, slot=0, u=0, v=0)
