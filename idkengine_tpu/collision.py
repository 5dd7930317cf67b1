"""Scene collision: moving-sphere-vs-scene with sliding response.

Host-side physics query path (ref: Source/Shapes/Intersections.cs:492-594
SceneVsMovingSphereCollisionRoutine): recursive sub-stepped sphere sweep
against BVH box queries with sliding-plane response. Consumed by the camera
and light physics (ref: Camera.cs:152-169, LightManager.cs:237-361).
The per-triangle closest-point tests run in the native C++ core.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .utils.mathutil import normalize


@dataclass
class CollisionSettings:
    """ref: Intersections.cs routine parameters."""

    test_steps: int = 4  # sweep sub-steps per recursion
    recursive_steps: int = 8  # max slide iterations
    epsilon: float = 1e-3


def scene_vs_moving_sphere(
    scene_db,
    position: np.ndarray,
    velocity_step: np.ndarray,
    radius: float,
    settings: CollisionSettings | None = None,
):
    """Move a sphere by velocity_step, sliding along scene geometry.

    Returns (new_position, new_velocity_step_remainder_applied) — the final
    position after sliding and the effective displacement."""
    settings = settings or CollisionSettings()
    pos = np.asarray(position, np.float64).copy()
    disp = np.asarray(velocity_step, np.float64).copy()

    for _ in range(settings.recursive_steps):
        step_len = np.linalg.norm(disp)
        if step_len < settings.epsilon * 0.01:
            break
        hit_any = False
        sub = disp / settings.test_steps
        for _ in range(settings.test_steps):
            new_pos = pos + sub
            # AABB around the swept sphere
            lo = np.minimum(pos, new_pos) - radius
            hi = np.maximum(pos, new_pos) + radius
            candidates = scene_db.intersect_box(lo.astype(np.float32), hi.astype(np.float32))
            if candidates.size:
                res = scene_db.blas.sphere_closest_triangle(
                    candidates, new_pos.astype(np.float32), radius
                )
                if res is not None:
                    closest, dist, local_i = res
                    # contact normal; degenerate (center on the surface) →
                    # use the triangle's face normal oriented toward travel
                    delta = new_pos - np.asarray(closest, np.float64)
                    if dist > 1e-5:
                        n = normalize(delta)
                    else:
                        tri = int(candidates[local_i])
                        vid = scene_db.blas.indices[tri]
                        a, b, c = scene_db.blas.vertices[vid].astype(np.float64)
                        n = normalize(np.cross(b - a, c - a))
                        if np.dot(n, pos - new_pos) < 0:
                            n = -n
                    penetration = radius - dist
                    pos = new_pos + n * (penetration + settings.epsilon)
                    # remove the normal component from the remaining motion
                    # (sliding plane, ref: Intersections.cs response)
                    disp = disp - np.dot(disp, n) * n
                    hit_any = True
                    break
            pos = new_pos
        if not hit_any:
            break
    return pos.astype(np.float32)


def camera_collision(scene_db, camera, dt: float):
    """Advance the camera with collision response
    (ref: Camera.cs CollisionDetection:152-169)."""
    step = camera.velocity * dt
    new_pos = scene_vs_moving_sphere(
        scene_db, camera.position, step, camera.collision_radius
    )
    camera.position = new_pos
    return camera


def light_collisions(scene_db, light_manager, dt: float):
    """Simulate lights with scene collision + elastic light-light response
    (ref: LightManager.cs:237-361)."""

    def collide(pos, radius, vel):
        step = vel * dt
        new_pos = scene_vs_moving_sphere(scene_db, pos, step, radius)
        moved = new_pos - pos
        # reflect: kill velocity into surfaces (approximate restitution 0.4)
        if np.linalg.norm(moved - step) > 1e-5:
            vel = vel * 0.6
        return new_pos, vel

    light_manager.simulate(dt, collide_fn=collide)
