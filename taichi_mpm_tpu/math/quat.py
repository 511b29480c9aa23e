"""Quaternion and planar rotation utilities for the rigid-body module.

The reference delegates rotations to taichi's ``Rotation<dim>`` (Eigen
quaternions in 3D, an angle in 2D; see usage in
/root/reference/src/mpm_rigid_body.cpp:104-131). Here: batched, pure
functions on (..., 4) wxyz quaternions and (..., 1) angles.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 0].set(1.0)


def quat_mul(a, b):
    """Hamilton product of wxyz quaternions (broadcasting)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_mat(q):
    """(..., 4) wxyz -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        -1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_from_euler_xyz(euler):
    """Intrinsic X, then Y, then Z rotation (matches the reference's
    AngleAxis(x, UnitX) * AngleAxis(y, UnitY) * AngleAxis(z, UnitZ),
    mpm_rigid_body.cpp:121-126). euler in radians, shape (..., 3)."""
    hx, hy, hz = euler[..., 0] * 0.5, euler[..., 1] * 0.5, euler[..., 2] * 0.5
    zeros = jnp.zeros_like(hx)
    qx = jnp.stack([jnp.cos(hx), jnp.sin(hx), zeros, zeros], -1)
    qy = jnp.stack([jnp.cos(hy), zeros, jnp.sin(hy), zeros], -1)
    qz = jnp.stack([jnp.cos(hz), zeros, zeros, jnp.sin(hz)], -1)
    return quat_mul(quat_mul(qx, qy), qz)


def quat_integrate(q, omega, dt):
    """Advance orientation by world-frame angular velocity omega (..., 3):
    q' = normalize(q + dt/2 * [0, omega] * q)."""
    zero = jnp.zeros_like(omega[..., :1])
    oq = jnp.concatenate([zero, omega], -1)
    return quat_normalize(q + 0.5 * dt * quat_mul(oq, q))


def rot2d(angle, v):
    """Rotate 2D vectors v (..., 2) by angles (..., 1) or (...,)."""
    a = jnp.asarray(angle)
    if a.ndim == v.ndim:
        a = a[..., 0]
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.stack(
        [c * v[..., 0] - s * v[..., 1], s * v[..., 0] + c * v[..., 1]], -1
    )
