"""SO(3)/SE(3) primitives on quaternions — jittable, batched, f64-safe.

Conventions (matching the reference's Eigen usage in
``bundle_adjustment.hpp:92-213`` and the manual quaternion→R expansion in
``backend.cpp:1186-1216``):

- quaternions are ``[w, x, y, z]`` arrays, unit norm, Hamilton convention;
- a pose ``(q, t)`` denotes the rigid map ``X ↦ R(q) X + t``;
- camera-to-world ("T_wc") stores the camera pose in world coordinates, so
  ``X_world = R X_cam + t``; world-to-camera is its inverse.

Everything is pure jnp and shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, eps)
    # canonicalize sign (w >= 0) so parity checks are stable
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    w, xyz = q[..., :1], q[..., 1:]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) → (...,3,3). Same expansion as backend.cpp:1195-1207."""
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) → (...,4) wxyz.  Branch-free Shepperd via 4-candidate select."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four unnormalized candidates, each valid when its pivot is largest
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (...,3) → quaternion (...,4)."""
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    half = 0.5 * theta
    small = theta < 1e-8
    k = jnp.where(small, 0.5 - theta * theta / 48.0,
                  jnp.sin(half) / jnp.maximum(theta, 1e-20))
    w = jnp.cos(half)
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (...,4) → axis-angle (...,3)."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-8
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-20), theta / jnp.maximum(vn, 1e-20))
    return k * v


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (...,3) → rotation matrix (...,3,3) (cv::Rodrigues, frontend.cpp:930)."""
    return quat_to_mat(so3_exp(rvec))


def se3_inverse(q: jnp.ndarray, t: jnp.ndarray):
    """Invert (q,t): X↦RX+t  ⇒  X↦Rᵀ(X−t)."""
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def se3_compose(qa, ta, qb, tb):
    """(qa,ta)∘(qb,tb): first apply b, then a."""
    return quat_normalize(quat_mul(qa, qb)), quat_rotate(qa, tb) + ta


def se3_apply(q, t, x):
    return quat_rotate(q, x) + t


# Optical↔ROS basis change (frontend.cpp:393-397; reused backend.cpp:1441-1445).
# C maps camera-optical axes (z fwd, x right, y down) to ROS body axes
# (x fwd, y left, z up):  T_ros = C · R_optical · Cᵀ.
OPTICAL_TO_ROS = jnp.array([[0.0, 0.0, 1.0],
                            [-1.0, 0.0, 0.0],
                            [0.0, -1.0, 0.0]], dtype=jnp.float32)


def optical_to_ros_rotation(r_opt: jnp.ndarray) -> jnp.ndarray:
    c = OPTICAL_TO_ROS.astype(r_opt.dtype)
    return c @ r_opt @ c.T


def optical_to_ros_point(p_opt: jnp.ndarray) -> jnp.ndarray:
    return p_opt @ OPTICAL_TO_ROS.astype(p_opt.dtype).T
