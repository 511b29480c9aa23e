"""Rigid-body state and dynamics (replicated small-N math).

TPU-native re-design of taichi's ``RigidBody<dim>`` as used by the
reference (creation: /root/reference/src/mpm_rigid_body.cpp:58-133;
advection: :273-304; impulse API used from transfer.cpp:228-254,671-682).
All R <= 12 bodies live in one batched pytree, replicated across shards;
per-shard coupling impulses are psum-reduced before application
(mirroring apply_tmp_impulse / apply_tmp_velocity).

Scripted motion: the reference passes raw C function pointers from
Python (mpm_rigid_body.cpp:81-95); here scripted position/rotation are
jax-traceable Python callables of t, closed over statically at jit time,
with velocities from forward differences.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.math.quat import (
    quat_integrate,
    quat_rotate,
    quat_to_mat,
    rot2d,
)
from taichi_mpm_tpu.utils import pytree_dataclass


@pytree_dataclass
class RigidBodies:
    """Batched rigid-body state + constant params (leading axis R).

    3D: rot is a wxyz quaternion (R, 4), omega (R, 3), inertia_inv the
    body-frame inverse inertia tensor (R, 3, 3).
    2D: rot is an angle (R, 1), omega (R, 1), inertia_inv (R, 1).
    Scripted (infinite-mass) bodies have mass_inv = 0 / inertia_inv = 0
    (reference set_infinity_mass, mpm_rigid_body.cpp:199-204).
    """

    pos: jnp.ndarray  # (R, d)
    vel: jnp.ndarray  # (R, d)
    rot: jnp.ndarray  # (R, 4) quat | (R, 1) angle
    omega: jnp.ndarray  # (R, 3) | (R, 1)
    mass_inv: jnp.ndarray  # (R,)
    inertia_inv: jnp.ndarray  # (R, 3, 3) | (R, 1) body frame
    friction: jnp.ndarray  # (R, 2) two-sided friction
    restitution: jnp.ndarray  # (R,)
    rotation_axis: jnp.ndarray  # (R, 3) zero = unconstrained (3D only)
    linear_damping: jnp.ndarray  # (R,)
    angular_damping: jnp.ndarray  # (R,)

    @property
    def num(self) -> int:
        return self.pos.shape[0]

    @property
    def dim(self) -> int:
        return self.pos.shape[1]


def rotate(rot, v):
    """Body-frame -> world-frame vectors. rot (R,4)|(R,1), v (R?,..,d)."""
    if v.shape[-1] == 2:
        return rot2d(rot, v)
    return quat_rotate(rot, v)


def world_inertia_inv(b: RigidBodies):
    """World-frame inverse inertia: R I_b^-1 R^T (3D), scalar in 2D."""
    if b.dim == 2:
        return b.inertia_inv  # (R, 1)
    Rm = quat_to_mat(b.rot)
    return Rm @ b.inertia_inv @ jnp.swapaxes(Rm, -1, -2)


def cross_omega(omega, r):
    """omega x r with 2D omega as scalar z-component."""
    if r.shape[-1] == 2:
        w = omega[..., 0]
        return jnp.stack([-w * r[..., 1], w * r[..., 0]], -1)
    return jnp.cross(omega, r)


def velocity_at(b: RigidBodies, rid, x):
    """Velocity of body `rid` (int array (...)) at world points x (..., d):
    v + omega x (x - pos). Matches RigidBody::get_velocity_at."""
    pos = b.pos[rid]
    vel = b.vel[rid]
    omega = b.omega[rid]
    return vel + cross_omega(omega, x - pos)


def _torque_of(r, J):
    """r x J; scalar z-component in 2D, shape (..., 1)."""
    if r.shape[-1] == 2:
        return (r[..., 0] * J[..., 1] - r[..., 1] * J[..., 0])[..., None]
    return jnp.cross(r, J)


# Unroll threshold for the masked (gather/scatter-free) small-R forms
# below: per-row gathers/scatters cost ~14 ns/row on TPU regardless of
# locality (CLAUDE.md), so on budget-sized CPIC sets a static unroll of
# R masked elementwise passes is far cheaper than indexed access. Past
# this many bodies the indexed forms win again.
R_UNROLL_MAX = 6


def velocity_at_masked(b: RigidBodies, rid, x):
    """velocity_at without the per-row pos/vel/omega gathers: a static
    unroll over the R <= R_UNROLL_MAX bodies with rid == r masks.
    Rows with rid outside [0, R) get 0 (callers mask on rid >= 0)."""
    out = jnp.zeros_like(x)
    for r in range(b.num):
        vr = b.vel[r] + cross_omega(b.omega[r], x - b.pos[r])
        out = jnp.where((rid == r)[..., None], vr, out)
    return out


def accumulate_impulses_masked(b: RigidBodies, rid, J, at, valid):
    """accumulate_impulses without the segment-sum scatters: per-body
    masked reductions (static unroll), exact same totals."""
    R = b.num
    rid_flat = rid.reshape(-1)
    J_flat = J.reshape(-1, b.dim)
    at_flat = at.reshape(-1, b.dim)
    v_flat = valid.reshape(-1)
    Js, taus = [], []
    for r in range(R):
        m = (v_flat & (rid_flat == r))[:, None]
        Jm = jnp.where(m, J_flat, 0.0)
        Js.append(jnp.sum(Jm, axis=0))
        taus.append(jnp.sum(
            jnp.where(m, _torque_of(at_flat - b.pos[r], Jm), 0.0), axis=0
        ))
    return jnp.stack(Js), jnp.stack(taus)


def accumulate_impulses(b: RigidBodies, rid, J, at, valid):
    """Segment-sum impulses J (..., d) applied at world points `at` to
    bodies rid (...) where valid. Returns (J_tot (R,d), tau_tot (R,w))."""
    R = b.num
    rid_flat = rid.reshape(-1)
    J_flat = jnp.where(valid.reshape(-1)[:, None], J.reshape(-1, b.dim), 0.0)
    at_flat = at.reshape(-1, b.dim)
    safe_rid = jnp.clip(rid_flat, 0, R - 1)
    r = at_flat - b.pos[safe_rid]
    tau = _torque_of(r, J_flat)
    J_tot = jnp.zeros((R, b.dim), J_flat.dtype).at[safe_rid].add(J_flat)
    tau_tot = jnp.zeros((R, tau.shape[-1]), tau.dtype).at[safe_rid].add(tau)
    return J_tot, tau_tot


def apply_impulses(b: RigidBodies, J_tot, tau_tot) -> RigidBodies:
    """vel += J/m ; omega += I_world^-1 tau (apply_tmp_velocity analog)."""
    import dataclasses

    vel = b.vel + J_tot * b.mass_inv[:, None]
    Iinv = world_inertia_inv(b)
    if b.dim == 2:
        omega = b.omega + Iinv * tau_tot
    else:
        omega = b.omega + jnp.einsum("rij,rj->ri", Iinv, tau_tot)
    return dataclasses.replace(b, vel=vel, omega=omega)


def apply_impulse_single(b: RigidBodies, rid, J, at) -> RigidBodies:
    """Apply one impulse to one body (used by articulations/collisions)."""
    valid = jnp.ones((), bool)
    J_tot, tau_tot = accumulate_impulses(
        b, jnp.asarray(rid)[None], J[None], at[None], valid[None]
    )
    return apply_impulses(b, J_tot, tau_tot)


def impulse_contribution(b: RigidBodies, rid, r, direction):
    """K = 1/m + dir . ((I^-1 (r x dir)) x r): the scalar effective
    inverse mass along `direction` at offset r from the center of mass
    (RigidBody::get_impulse_contribution, used at mpm_rigid_body.cpp:365)."""
    minv = b.mass_inv[rid]
    Iinv = world_inertia_inv(b)
    if b.dim == 2:
        rxd = r[..., 0] * direction[..., 1] - r[..., 1] * direction[..., 0]
        return minv + Iinv[rid][..., 0] * rxd * rxd
    rxd = jnp.cross(r, direction)
    ang = jnp.einsum("...ij,...j->...i", Iinv[rid], rxd)
    return minv + jnp.sum(jnp.cross(ang, r) * direction, -1)


def enforce_rotation_axis(b: RigidBodies) -> RigidBodies:
    """Project omega onto rotation_axis for constrained bodies
    (RigidBody::enforce_angular_velocity_parallel_to, used at
    mpm_rigid_body.cpp:277-286). 3D only; no-op when axis is zero."""
    import dataclasses

    if b.dim == 2:
        return b
    axis = b.rotation_axis
    norm2 = jnp.sum(axis * axis, -1, keepdims=True)
    constrained = jnp.max(jnp.abs(axis), -1, keepdims=True) > 0.1
    proj = axis * (jnp.sum(b.omega * axis, -1, keepdims=True) / jnp.maximum(norm2, 1e-30))
    return dataclasses.replace(b, omega=jnp.where(constrained, proj, b.omega))


def advance(
    b: RigidBodies,
    t,
    dt,
    pos_funcs: Tuple[Optional[Callable], ...],
    rot_funcs: Tuple[Optional[Callable], ...],
    gravity,
) -> RigidBodies:
    """Symplectic advance + scripted overrides + gravity impulse.

    Mirrors MPM::advect_rigid_bodies (mpm_rigid_body.cpp:273-304):
    axis constraint -> damped advance -> gravity -> axis constraint.
    Scripted bodies take position/rotation from their functions with
    forward-difference velocities.
    """
    import dataclasses

    b = enforce_rotation_axis(b)

    lin_k = jnp.exp(-b.linear_damping * dt)[:, None]
    ang_k = jnp.exp(-b.angular_damping * dt)[:, None]
    vel = b.vel * lin_k
    omega = b.omega * ang_k
    pos = b.pos + dt * vel
    if b.dim == 2:
        rot = b.rot + dt * omega
    else:
        rot = quat_integrate(b.rot, omega, dt)

    # Scripted overrides (static python loop over <=12 bodies).
    pos_list, vel_list = list(jnp.unstack(pos)), list(jnp.unstack(vel))
    rot_list, omg_list = list(jnp.unstack(rot)), list(jnp.unstack(omega))
    for i, f in enumerate(pos_funcs):
        if f is None:
            continue
        p0 = jnp.asarray(f(t), jnp.float32)
        p1 = jnp.asarray(f(t + dt), jnp.float32)
        pos_list[i] = p1
        vel_list[i] = (p1 - p0) / dt
    for i, g in enumerate(rot_funcs):
        if g is None:
            continue
        if b.dim == 2:
            a0 = jnp.deg2rad(jnp.asarray(g(t), jnp.float32)).reshape(1)
            a1 = jnp.deg2rad(jnp.asarray(g(t + dt), jnp.float32)).reshape(1)
            rot_list[i] = a1
            omg_list[i] = (a1 - a0) / dt
        else:
            from taichi_mpm_tpu.math.quat import quat_from_euler_xyz

            e0 = jnp.deg2rad(jnp.asarray(g(t), jnp.float32))
            e1 = jnp.deg2rad(jnp.asarray(g(t + dt), jnp.float32))
            rot_list[i] = quat_from_euler_xyz(e1)
            # world angular velocity ~ euler rate (valid for the
            # single-axis scripted rotations the scenes use)
            omg_list[i] = (e1 - e0) / dt
    pos, vel = jnp.stack(pos_list), jnp.stack(vel_list)
    rot, omega = jnp.stack(rot_list), jnp.stack(omg_list)

    # Gravity impulse at the center of mass (no torque); infinite-mass
    # (scripted) bodies have mass_inv = 0 but the reference applies
    # gravity*mass*dt -> for finite bodies this is vel += g dt.
    finite = (b.mass_inv > 0.0)[:, None]
    vel = jnp.where(finite, vel + jnp.asarray(gravity, vel.dtype) * dt, vel)

    b = dataclasses.replace(b, pos=pos, vel=vel, rot=rot, omega=omega)
    return enforce_rotation_axis(b)


def boundary_particle_world(b: RigidBodies, bp_rid, bp_offset, bp_normal, bp_elem):
    """World-space boundary-particle positions, normals, and element
    vertices from body-frame statics (RigidBoundaryParticle::
    align_with_rigid_body / get_world_space_element,
    boundary_particle.h:48-75)."""
    rot = b.rot[bp_rid]
    pos = b.pos[bp_rid]
    x = pos + rotate(rot, bp_offset)
    n = rotate(rot, bp_normal)
    elem = pos[:, None, :] + rotate(rot[:, None, :], bp_elem)
    return x, n, elem
