"""Pinhole camera model — batched project / back-project.

Reference formulas:
- back-projection ``pt3d = ((u-cx)·d/fx, (v-cy)·d/fy, d)`` (frontend.cpp:883-887,
  740-745);
- projection ``u = fx·X/Z + cx, v = fy·Y/Z + cy`` with camera-frame point
  ``X_c = Rᵀ(X_w − t)`` for a camera-to-world pose (backend.cpp:1153-1173).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dynamic_visual_slam_tpu.config import CameraConfig
from dynamic_visual_slam_tpu.core import lie


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def from_config(cls, c: CameraConfig, dtype=jnp.float32) -> "Intrinsics":
        return cls(*(jnp.asarray(v, dtype) for v in (c.fx, c.fy, c.cx, c.cy)))

    def matrix(self) -> jnp.ndarray:
        z, o = jnp.zeros_like(self.fx), jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], -1),
            jnp.stack([z, self.fy, self.cy], -1),
            jnp.stack([z, z, o], -1),
        ], -2)


def backproject(k: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (...,2) + depth (...,) → camera-frame points (...,3)."""
    x = (uv[..., 0] - k.cx) * depth / k.fx
    y = (uv[..., 1] - k.cy) * depth / k.fy
    return jnp.stack([x, y, depth], axis=-1)


def project(k: Intrinsics, xyz: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Camera-frame points (...,3) → pixels (...,2). Caller masks Z<=0."""
    z = jnp.where(jnp.abs(xyz[..., 2]) < eps, eps, xyz[..., 2])
    u = k.fx * xyz[..., 0] / z + k.cx
    v = k.fy * xyz[..., 1] / z + k.cy
    return jnp.stack([u, v], axis=-1)


def world_to_camera(q_wc: jnp.ndarray, t_wc: jnp.ndarray, xyz_w: jnp.ndarray) -> jnp.ndarray:
    """Camera-to-world pose (q,t) ⇒ X_c = Rᵀ(X_w − t) (backend.cpp:1162-1167)."""
    return lie.quat_rotate(lie.quat_conj(q_wc), xyz_w - t_wc)


def camera_to_world(q_wc: jnp.ndarray, t_wc: jnp.ndarray, xyz_c: jnp.ndarray) -> jnp.ndarray:
    """X_w = R X_c + t (frontend.cpp:750-752)."""
    return lie.quat_rotate(q_wc, xyz_c) + t_wc


def reproject_world(k: Intrinsics, q_wc, t_wc, xyz_w) -> jnp.ndarray:
    return project(k, world_to_camera(q_wc, t_wc, xyz_w))


def in_bounds(uv: jnp.ndarray, width: int, height: int, margin: float = 0.0) -> jnp.ndarray:
    return ((uv[..., 0] >= margin) & (uv[..., 0] <= width - 1 - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] <= height - 1 - margin))
