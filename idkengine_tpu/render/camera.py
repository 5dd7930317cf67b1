"""Camera: FPS state + thin-lens ray generation.

Host-side state/physics mirrors the reference camera (ref: Source/Camera.cs —
velocity-Verlet force/impulse/drag, collision hook); ray generation is the
device-side equivalent of the path tracer's camera ray setup
(ref: PathTracing/FirstHit/compute.glsl:55-61 thin-lens DoF).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..utils import mathutil as mu


@dataclass
class Camera:
    position: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.8, 5.0], np.float32))
    yaw: float = -90.0  # degrees, looking -z
    pitch: float = 0.0
    fov_y: float = 60.0  # degrees
    near: float = 0.05
    # thin lens
    focal_distance: float = 10.0
    lens_radius: float = 0.0
    # physics (ref: Camera.cs:122-150)
    velocity: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    mass: float = 1.0
    drag: float = 6.0
    speed: float = 6.0
    collision_radius: float = 0.35

    # ------------------------------------------------------------------
    @property
    def forward(self) -> np.ndarray:
        cy, sy = np.cos(np.radians(self.yaw)), np.sin(np.radians(self.yaw))
        cp, sp = np.cos(np.radians(self.pitch)), np.sin(np.radians(self.pitch))
        return np.array([cy * cp, sp, sy * cp], np.float32)

    @property
    def right(self) -> np.ndarray:
        f = self.forward
        return mu.normalize(np.cross(f, [0.0, 1.0, 0.0])).astype(np.float32)

    @property
    def up(self) -> np.ndarray:
        return np.cross(self.right, self.forward).astype(np.float32)

    def view_matrix(self) -> np.ndarray:
        return mu.look_at(self.position, self.position + self.forward, np.array([0, 1, 0.0]))

    def projection_matrix(self, aspect: float) -> np.ndarray:
        return mu.perspective_reverse_z(np.radians(self.fov_y), aspect, self.near)

    def frustum(self, width: int, height: int, far: float = 1e4):
        """Camera frustum as a convex SAT volume (ref: Frustum.cs built
        from the clip matrix; used for per-face shadow culling at
        CpuPointShadow.cs:116-185). Reverse-Z has an infinite far plane,
        so culling uses a finite `far` cap instead."""
        from ..collision import Frustum

        aspect = width / height
        tan_half = np.tan(np.radians(self.fov_y) * 0.5)
        r = self.right * tan_half * aspect
        u = self.up * tan_half
        f = self.forward
        corner_dirs = np.stack([f - r - u, f + r - u, f + r + u, f - r + u])
        return Frustum.from_corner_rays(self.position, corner_dirs,
                                        self.near, far)

    # ------------------------------------------------------------------
    def process_inputs(self, move: np.ndarray, dt: float, look: tuple[float, float] = (0, 0)):
        """Apply look deltas + acceleration impulses (ref: Camera.cs ProcessInputs)."""
        self.yaw += look[0]
        self.pitch = float(np.clip(self.pitch + look[1], -89.0, 89.0))
        acc = (
            self.right * move[0] + np.array([0, 1, 0], np.float32) * move[1] + self.forward * move[2]
        )
        norm = np.linalg.norm(acc)
        if norm > 1e-6:
            self.velocity = self.velocity + (acc / norm) * self.speed * dt * self.drag

    def advance_simulation(self, dt: float):
        """Velocity-Verlet-ish integration with drag (ref: Camera.cs:122-150)."""
        self.position = self.position + self.velocity * dt
        self.velocity = self.velocity * max(1.0 - self.drag * dt, 0.0)

    # ------------------------------------------------------------------
    def ray_params(self, width: int, height: int) -> dict:
        """Static per-frame camera basis for device raygen."""
        aspect = width / height
        tan_half = np.tan(np.radians(self.fov_y) * 0.5)
        return {
            "origin": jnp.asarray(self.position),
            "forward": jnp.asarray(self.forward),
            "right": jnp.asarray(self.right * tan_half * aspect),
            "up": jnp.asarray(self.up * tan_half),
            "focal_distance": jnp.float32(self.focal_distance),
            "lens_radius": jnp.float32(self.lens_radius),
        }


def generate_rays(params: dict, width: int, height: int, jitter, lens_u=None,
                  px=None):
    """Primary ray batch (R=W*H,3). jitter: (2,) or (R,2) subpixel offset in
    [0,1); lens_u: (R,2) uniforms for thin-lens DoF or None; px: optional
    pixel-id array — ray i belongs to pixel px[i] (tile-swizzled launch
    order, the TPU analogue of the reference's workgroup swizzle,
    FirstHit/compute.glsl:236-262)."""
    if px is None:
        px = jnp.arange(width * height, dtype=jnp.int32)
    x = (px % width).astype(jnp.float32)
    y = (px // width).astype(jnp.float32)
    jx = jitter[..., 0]
    jy = jitter[..., 1]
    u = (x + jx) / width * 2.0 - 1.0
    v = 1.0 - (y + jy) / height * 2.0
    d = (
        params["forward"][None, :]
        + u[:, None] * params["right"][None, :]
        + v[:, None] * params["up"][None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(params["origin"], d.shape)
    if lens_u is not None:
        # thin-lens: jitter origin on aperture disk, refocus at focal plane
        # (ref: FirstHit/compute.glsl:55-61)
        r = jnp.sqrt(lens_u[..., 0]) * params["lens_radius"]
        phi = 2.0 * jnp.pi * lens_u[..., 1]
        right_n = params["right"] / jnp.linalg.norm(params["right"])
        up_n = params["up"] / jnp.linalg.norm(params["up"])
        offset = (
            right_n[None, :] * (r * jnp.cos(phi))[:, None]
            + up_n[None, :] * (r * jnp.sin(phi))[:, None]
        )
        focus = o + d * params["focal_distance"]
        o = o + offset
        d = focus - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d
