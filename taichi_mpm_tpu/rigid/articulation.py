"""Articulation constraints between rigid bodies.

Functional port of /root/reference/src/articulation.{h,cpp}: velocity-
level constraint projection run as apply -> N x project -> penalize
(MPM::articulate, mpm.h:278-319, default 100 iterations). All six
reference types: rotation, frozen, distance, axial_rotation, motor,
stepper. Parameters are converted to body frames at scene-build time
(host-side, numpy) and stored in frozen dataclasses that jit closes
over statically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from taichi_mpm_tpu.rigid.body import (
    RigidBodies,
    apply_impulse_single,
    impulse_contribution,
    rotate,
    velocity_at,
    world_inertia_inv,
)


@dataclasses.dataclass(frozen=True)
class Articulation:
    """Static articulation descriptor. Offsets/axis are body-frame."""

    kind: str  # rotation | frozen | distance | axial_rotation | motor | stepper
    obj: Tuple[int, int]
    offset0: Tuple[float, ...] = ()
    offset1: Tuple[float, ...] = ()
    # for axial types: two anchor pairs (body-frame), built host-side
    anchors0: Tuple = ()  # ((o0a, o1a), (o0b, o1b)) body-frame offsets
    axis_body: Tuple[float, ...] = ()  # in obj1 body frame (3D)
    target_distance: float = 0.0
    penalty: float = 1e3
    power: float = 0.0
    angular_velocity: float = 0.0


def _anchor(b: RigidBodies, i: int, offset_body) -> jnp.ndarray:
    off = jnp.asarray(offset_body, jnp.float32)
    return b.pos[i] + rotate(b.rot[i], off)


def _apply_torque(b: RigidBodies, i: int, L) -> RigidBodies:
    """omega_i += I_world^-1 L (RigidBody::apply_torque with an angular
    impulse, articulation.cpp Motor/Stepper usage)."""
    Iinv = world_inertia_inv(b)
    if b.dim == 2:
        dw = Iinv[i] * L
    else:
        dw = Iinv[i] @ L
    return dataclasses.replace(b, omega=b.omega.at[i].add(dw))


def _distance_project(b: RigidBodies, i0, i1, off0, off1) -> RigidBodies:
    """Remove relative normal velocity at the anchor pair
    (DistanceArticulation::project, articulation.cpp:140-158)."""
    p0 = _anchor(b, i0, off0)
    p1 = _anchor(b, i1, off1)
    n = p0 - p1
    dist = jnp.linalg.norm(n)
    n = n / jnp.maximum(dist, 1e-10)
    v01 = velocity_at(b, jnp.asarray(i0), p0) - velocity_at(b, jnp.asarray(i1), p1)
    k0 = impulse_contribution(b, jnp.asarray(i0), p0 - b.pos[i0], n)
    k1 = impulse_contribution(b, jnp.asarray(i1), p1 - b.pos[i1], n)
    j = jnp.where(dist < 1e-10, 0.0, jnp.sum(n * v01) / jnp.maximum(k0 + k1, 1e-30))
    b = apply_impulse_single(b, i0, -j * n, p0)
    b = apply_impulse_single(b, i1, j * n, p1)
    return b


def _distance_penalize(b: RigidBodies, i0, i1, off0, off1, target, penalty, dt) -> RigidBodies:
    """Positional drift correction (articulation.cpp:119-138)."""
    p0 = _anchor(b, i0, off0)
    p1 = _anchor(b, i1, off1)
    n = p0 - p1
    dist = jnp.linalg.norm(n)
    n = n / jnp.maximum(dist, 1e-10)
    j = jnp.where(dist < 1e-10, 0.0, -dt * penalty * (target - dist))
    b = apply_impulse_single(b, i0, -j * n, p0)
    b = apply_impulse_single(b, i1, j * n, p1)
    return b


def _world_axis(b: RigidBodies, a: Articulation) -> jnp.ndarray:
    ax = jnp.asarray(a.axis_body, jnp.float32)
    return rotate(b.rot[a.obj[1]], ax)


def _project_one(b: RigidBodies, a: Articulation) -> RigidBodies:
    i0, i1 = a.obj
    if a.kind == "rotation":
        # shared angular velocity from total angular momentum
        # (RotationArticulation::project, articulation.cpp:34-41)
        Iinv = world_inertia_inv(b)
        if b.dim == 2:
            big = 1.0 / jnp.maximum(Iinv[:, 0], 1e-12)
            I0, I1 = big[i0], big[i1]
            L = I0 * b.omega[i0, 0] + I1 * b.omega[i1, 0]
            w = L / (I0 + I1)
            omega = b.omega.at[i0].set(w[None]).at[i1].set(w[None])
        else:
            # explicit adjugate inverses: jnp.linalg.inv/solve on a
            # 3x3 lower to LuDecompositionBlock custom-calls, and this
            # runs inside the 100-iteration projection fori_loop every
            # substep (300 serialized launches; r5 res-256 trace)
            from taichi_mpm_tpu.rigid.cdf import _explicit_inv

            eye = jnp.eye(3, dtype=jnp.float32)
            I0 = _explicit_inv(Iinv[i0] + 1e-12 * eye)
            I1 = _explicit_inv(Iinv[i1] + 1e-12 * eye)
            L = I0 @ b.omega[i0] + I1 @ b.omega[i1]
            w = _explicit_inv(I0 + I1) @ L
            omega = b.omega.at[i0].set(w).at[i1].set(w)
        return dataclasses.replace(b, omega=omega)
    if a.kind == "frozen":
        # zero x/y angular velocity and z linear velocity of obj0
        # (FrozenArticulation<3>::project)
        omega = b.omega.at[i0, 0].set(0.0).at[i0, 1].set(0.0)
        vel = b.vel.at[i0, 2].set(0.0)
        return dataclasses.replace(b, omega=omega, vel=vel)
    if a.kind == "distance":
        return _distance_project(b, i0, i1, a.offset0, a.offset1)
    if a.kind in ("axial_rotation", "motor", "stepper"):
        for (o0, o1) in a.anchors0:
            b = _distance_project(b, i0, i1, o0, o1)
        if a.kind == "stepper":
            # drive relative angular velocity along the axis to target
            # (StepperArticulation::project)
            Iinv = world_inertia_inv(b)
            if b.dim == 2:
                cur = b.omega[i0, 0] - b.omega[i1, 0]
                Isum_inv = Iinv[i0, 0] + Iinv[i1, 0]
                L = (a.angular_velocity - cur) / jnp.maximum(Isum_inv, 1e-30)
                b = _apply_torque(b, i0, L)
                b = _apply_torque(b, i1, -L)
            else:
                axis = _world_axis(b, a)
                axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)
                cur = jnp.sum((b.omega[i0] - b.omega[i1]) * axis)
                corr = a.angular_velocity - cur
                from taichi_mpm_tpu.rigid.cdf import _explicit_inv

                eye = jnp.eye(3, dtype=jnp.float32)
                L = _explicit_inv(Iinv[i0] + Iinv[i1] + 1e-12 * eye) @ (
                    axis * corr
                )
                b = _apply_torque(b, i0, L)
                b = _apply_torque(b, i1, -L)
        return b
    raise ValueError(f"unknown articulation kind {a.kind}")


def _apply_one(b: RigidBodies, a: Articulation, dt) -> RigidBodies:
    if a.kind == "motor":
        # torque impulse along the axis (MotorArticulation::apply)
        if b.dim == 2:
            L = a.power * dt
        else:
            L = _world_axis(b, a) * (a.power * dt)
        b = _apply_torque(b, a.obj[0], L)
        b = _apply_torque(b, a.obj[1], -L)
    return b


def _penalize_one(b: RigidBodies, a: Articulation, dt) -> RigidBodies:
    if a.kind == "distance":
        return _distance_penalize(
            b, a.obj[0], a.obj[1], a.offset0, a.offset1, a.target_distance, a.penalty, dt
        )
    if a.kind in ("axial_rotation", "motor", "stepper"):
        for (o0, o1) in a.anchors0:
            b = _distance_penalize(b, a.obj[0], a.obj[1], o0, o1, 0.0, a.penalty, dt)
    return b


def articulate(
    b: RigidBodies, articulations: Tuple[Articulation, ...], dt, iterations: int = 100
) -> RigidBodies:
    """apply -> iterations x project -> penalize (mpm.h:308-318).

    The Gauss-Seidel iteration count exists for CHAINS of coupled
    constraints; a lone rotation/frozen/single-anchor-distance
    articulation is an exact idempotent projection, so one pass
    converges and the remaining 99 trips would only replay ~30 tiny
    (3,3) device ops each (~3000 launches/substep — this dominated the
    r5 res-256 water_wheel trace's unattributed op tail)."""
    for a in articulations:
        b = _apply_one(b, a, dt)

    if len(articulations) == 1 and (
        articulations[0].kind in ("rotation", "frozen", "distance")
    ):
        iterations = 1

    def body(_, bb):
        for a in articulations:
            bb = _project_one(bb, a)
        return bb

    b = jax.lax.fori_loop(0, iterations, body, b)
    for a in articulations:
        b = _penalize_one(b, a, dt)
    return b


# ---------------------------------------------------------------------------
# Host-side construction (body-frame conversion at scene-build time)
# ---------------------------------------------------------------------------


def _to_body_np(rot_np, v, dim):
    """World direction -> body frame (host, numpy)."""
    v = np.asarray(v, np.float64)
    if dim == 2:
        c, s = math_cos_sin(-float(rot_np[0]))
        return (c * v[0] - s * v[1], s * v[0] + c * v[1])
    # quaternion conjugate rotate
    w, x, y, z = [float(q) for q in rot_np]
    q = np.array([w, -x, -y, -z])
    return tuple(_quat_rot_np(q, v))


def math_cos_sin(a):
    import math

    return math.cos(a), math.sin(a)


def _quat_rot_np(q, v):
    w, xyz = q[0], q[1:]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def build_articulation(kind: str, obj0: int, obj1: int, bodies_np: dict, dim: int, **kw) -> Articulation:
    """Create an Articulation with body-frame parameters.

    bodies_np: dict with numpy 'pos' (R,d) and 'rot' (R,4|1) at build time
    (mirrors DistanceArticulation::initialize's inverse transforms).
    """
    pos, rot = bodies_np["pos"], bodies_np["rot"]
    if kind == "rotation" or kind == "frozen":
        return Articulation(kind=kind, obj=(obj0, obj1))
    penalty = float(kw.get("penalty", 1e3))
    if kind == "distance":
        off0_w = np.asarray(kw.get("offset0", np.zeros(dim)), np.float64)
        off1_w = np.asarray(kw.get("offset1", np.zeros(dim)), np.float64)
        p0 = pos[obj0] + off0_w
        p1 = pos[obj1] + off1_w
        target = float(kw.get("target_distance", np.linalg.norm(p0 - p1)))
        return Articulation(
            kind=kind,
            obj=(obj0, obj1),
            offset0=_to_body_np(rot[obj0], off0_w, dim),
            offset1=_to_body_np(rot[obj1], off1_w, dim),
            target_distance=target,
            penalty=penalty,
        )
    if kind in ("axial_rotation", "motor", "stepper"):
        off0_w = np.asarray(kw.get("offset0", np.zeros(dim)), np.float64)
        # anchor offset of obj1 so both world anchors coincide at build
        off1_w = pos[obj0] + off0_w - pos[obj1]
        anchors = []
        if dim == 3:
            axis_w = np.asarray(kw["axis"], np.float64)
            axis_w = axis_w / np.linalg.norm(axis_w)
            alen = float(kw.get("axis_length", 0.1))
            for sgn in (1.0, -1.0):
                ao = axis_w * alen * sgn
                anchors.append(
                    (
                        _to_body_np(rot[obj0], off0_w + ao, dim),
                        _to_body_np(rot[obj1], off1_w + ao, dim),
                    )
                )
            axis_body = _to_body_np(rot[obj1], axis_w, dim)
        else:
            anchors.append(
                (
                    _to_body_np(rot[obj0], off0_w, dim),
                    _to_body_np(rot[obj1], off1_w, dim),
                )
            )
            axis_body = ()
        return Articulation(
            kind=kind,
            obj=(obj0, obj1),
            anchors0=tuple(anchors),
            axis_body=axis_body,
            penalty=penalty,
            power=float(kw.get("power", 0.0)),
            angular_velocity=float(kw.get("angular_velocity", 0.0)),
        )
    raise ValueError(f"unknown articulation kind {kind}")
