"""Rigid-rigid collision + rigid-vs-levelset collision.

Reference behavior (/root/reference/src/rigid_body_solver.h +
mpm_rigid_body.cpp:306-387):
  * detect penetration between all non-(both-)scripted pairs via libccd
    MPR over the convex hulls of mesh vertices (:120-198);
  * resolve with `rigid_body_iterations` (default 5) rounds of
    positional penalty + sequential velocity impulses with sqrt-combined
    friction/restitution (Collision::project_*, :39-87), then 5 more
    velocity rounds (rigidify, mpm_rigid_body.cpp:306-345);
  * rigid_body_levelset_collision: boundary-particle impulses against
    the domain SDF with restitution + Coulomb friction (:347-387).

TPU-native redesign: MPR's sequential portal refinement is replaced by a
*sampled-support separating-axis test*: penetration depth along K fixed
icosphere directions d is s(d) = max_a d.a - min_b d.b over the two
vertex sets; the origin-in-Minkowski-difference test and the minimum
translation vector become one batched einsum over (pairs, K, verts) —
exact for directions in the sample set, ~2% depth error otherwise, and
fully vectorized/deterministic (no data-dependent loops for XLA).
Contact point = midpoint of the two witness vertices (MPR's portal
barycenter approximated).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from taichi_mpm_tpu.rigid.body import (
    RigidBodies,
    accumulate_impulses,
    apply_impulses,
    impulse_contribution,
    rotate,
    velocity_at,
)


def icosphere_directions(subdiv: int = 2) -> np.ndarray:
    """Unit direction samples (K, 3) from an icosphere (K=162 at subdiv 2)."""
    from taichi_mpm_tpu.rigid.mesh import sphere_mesh

    tris = sphere_mesh(1.0, subdiv=subdiv)
    verts = np.unique(tris.reshape(-1, 3).round(6), axis=0)
    return (verts / np.linalg.norm(verts, axis=1, keepdims=True)).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class CollisionConfig:
    """Static collision setup: candidate pairs + padded hull vertices."""

    pairs: Tuple[Tuple[int, int], ...]  # (i, j), i < j, background excluded
    iterations: int = 5
    penalty: float = 1e3


def build_collision_config(builder, scripted: Tuple[bool, ...], max_verts: int = 256):
    """Host-side: candidate pairs (skip both-scripted, skip background)
    and per-rigid padded hull vertex arrays in body frame."""
    R = builder.num
    pairs = []
    for i in range(1, R):
        for j in range(i + 1, R):
            if scripted[i] and scripted[j]:
                continue
            pairs.append((i, j))
    return CollisionConfig(pairs=tuple(pairs))


def hull_vertices(bp_list, dim: int, max_verts: int = 512) -> np.ndarray:
    """Per-rigid deduplicated mesh vertices (R, V, d), padded by repeating
    the first vertex (harmless for support functions)."""
    out = []
    for elems in bp_list:
        v = np.unique(np.asarray(elems, np.float32).reshape(-1, dim).round(7), axis=0)
        if len(v) > max_verts:
            idx = np.linspace(0, len(v) - 1, max_verts).astype(int)
            v = v[idx]
        out.append(v)
    V = max(len(v) for v in out) if out else 1
    padded = np.zeros((len(out), V, dim), np.float32)
    for r, v in enumerate(out):
        padded[r, : len(v)] = v
        padded[r, len(v) :] = v[0]
    return padded


def detect(bodies: RigidBodies, verts_body, pairs, dirs):
    """Sampled-SAT penetration for all candidate pairs.

    Returns (hit (P,), depth (P,), normal (P,3), point (P,3)); normal
    points from body i toward body j (translating j along +normal
    separates), matching the impulse convention in Collision::project_*.
    """
    ii = jnp.asarray([p[0] for p in pairs], jnp.int32)
    jj = jnp.asarray([p[1] for p in pairs], jnp.int32)
    # world vertices for each pair's two bodies: (P, V, 3)
    va = bodies.pos[ii][:, None, :] + rotate(bodies.rot[ii][:, None, :], verts_body[ii])
    vb = bodies.pos[jj][:, None, :] + rotate(bodies.rot[jj][:, None, :], verts_body[jj])
    # support values along all K dirs: (P, K)
    da = jnp.einsum("pvd,kd->pkv", va, dirs)
    db = jnp.einsum("pvd,kd->pkv", vb, dirs)
    s = jnp.max(da, -1) - jnp.min(db, -1)  # penetration along each dir
    depth = jnp.min(s, axis=1)
    kstar = jnp.argmin(s, axis=1)
    normal = dirs[kstar]
    # Witness contact point: mean of all vertices on each support plane
    # (argmax alone returns an arbitrary corner for face-face contact,
    # injecting spurious torque; MPR's portal barycenter is central).
    pk = jnp.arange(len(pairs))
    pa = da[pk, kstar]  # (P, V) projections of body i verts on n
    pb = db[pk, kstar]
    band = 1e-5 + 0.1 * jnp.maximum(depth, 0.0)[:, None]
    wa = (pa >= jnp.max(pa, -1, keepdims=True) - band).astype(jnp.float32)
    wb = (pb <= jnp.min(pb, -1, keepdims=True) + band).astype(jnp.float32)
    a_star = jnp.sum(wa[..., None] * va, 1) / jnp.sum(wa, 1)[:, None]
    b_star = jnp.sum(wb[..., None] * vb, 1) / jnp.sum(wb, 1)[:, None]
    point = 0.5 * (a_star + b_star)
    return depth > 0.0, depth, normal, point


def _pair_impulse(bodies, i, j, p, n, J):
    """Apply -J*n at p to body i and +J*n at p to body j."""
    imp = J[..., None] * n
    rid = jnp.stack([i, j])
    Js = jnp.stack([-imp, imp])
    at = jnp.stack([p, p])
    valid = jnp.ones((2,), bool)
    J_tot, tau_tot = accumulate_impulses(bodies, rid, Js, at, valid)
    return apply_impulses(bodies, J_tot, tau_tot)


def _project_velocity(bodies, i, j, p, n, hit):
    """Collision::project_velocity (rigid_body_solver.h:39-71)."""
    fric = jnp.sqrt(bodies.friction[i, 0] * bodies.friction[j, 0])
    rest = jnp.sqrt(bodies.restitution[i] * bodies.restitution[j])
    v10 = velocity_at(bodies, j, p) - velocity_at(bodies, i, p)
    r0 = p - bodies.pos[i]
    r1 = p - bodies.pos[j]
    v0 = -jnp.sum(n * v10)
    K = impulse_contribution(bodies, i, r0, n) + impulse_contribution(bodies, j, r1, n)
    J = (1.0 + rest) * v0 / jnp.maximum(K, 1e-30)
    J = jnp.where(hit & (J > 0), J, 0.0)
    bodies = _pair_impulse(bodies, i, j, p, n, J)
    # Coulomb friction clamp
    v10 = velocity_at(bodies, j, p) - velocity_at(bodies, i, p)
    tao = v10 - n * jnp.sum(n * v10)
    tlen = jnp.linalg.norm(tao)
    tao = tao / jnp.maximum(tlen, 1e-30)
    Kt = impulse_contribution(bodies, i, r0, tao) + impulse_contribution(bodies, j, r1, tao)
    jt = -jnp.sum(v10 * tao) / jnp.maximum(Kt, 1e-30)
    jt = jnp.clip(jt, -fric * J, fric * J)
    jt = jnp.where(hit & (tlen > 1e-7) & (J > 0), jt, 0.0)
    return _pair_impulse(bodies, i, j, p, tao, jt)


def _project_position(bodies, i, j, p, n, depth, hit, dt, penalty):
    """Collision::project_position (rigid_body_solver.h:73-87)."""
    r0 = p - bodies.pos[i]
    r1 = p - bodies.pos[j]
    K = impulse_contribution(bodies, i, r0, n) + impulse_contribution(bodies, j, r1, n)
    J = penalty * dt * depth / jnp.maximum(K, 1e-30)
    J = jnp.where(hit & (J > 0), J, 0.0)
    return _pair_impulse(bodies, i, j, p, n, J)


def rigidify(bodies: RigidBodies, verts_body, cconf: CollisionConfig, dirs, dt):
    """Detect + resolve rigid-rigid collisions (MPM::rigidify,
    mpm_rigid_body.cpp:306-345): iterations x (position + velocity),
    then iterations x velocity."""
    if not cconf.pairs:
        return bodies
    hit, depth, normal, point = detect(bodies, verts_body, cconf.pairs, dirs)
    ii = jnp.asarray([p[0] for p in cconf.pairs], jnp.int32)
    jj = jnp.asarray([p[1] for p in cconf.pairs], jnp.int32)

    def round1(_, b):
        for k in range(len(cconf.pairs)):
            b = _project_position(
                b, ii[k], jj[k], point[k], normal[k], depth[k], hit[k], dt, cconf.penalty
            )
            b = _project_velocity(b, ii[k], jj[k], point[k], normal[k], hit[k])
        return b

    def round2(_, b):
        for k in range(len(cconf.pairs)):
            b = _project_velocity(b, ii[k], jj[k], point[k], normal[k], hit[k])
        return b

    bodies = jax.lax.fori_loop(0, cconf.iterations, round1, bodies)
    bodies = jax.lax.fori_loop(0, cconf.iterations, round2, bodies)
    return bodies


def rigid_levelset_collision(bodies: RigidBodies, xb, bp_rid, colliders, t, dt):
    """Rigid boundary particles vs domain level set
    (rigid_body_levelset_collision, mpm_rigid_body.cpp:347-387):
    restitution impulse along the SDF gradient + clamped friction
    impulse, accumulated per rigid (the reference applies sequentially;
    batching the accumulation keeps it deterministic and psum-able)."""
    if not colliders:
        return bodies
    R = bodies.num
    fric = bodies.friction[bp_rid, 0]
    rest = bodies.restitution[bp_rid]
    for c in colliders:
        phi = c.sdf(xb, t)
        grad = c.normal(xb, t, eps=1e-4)
        inside = phi < 0.0
        v10 = velocity_at(bodies, bp_rid, xb)
        r0 = xb - bodies.pos[bp_rid]
        v0 = jnp.sum(grad * v10, -1)
        K = impulse_contribution(bodies, bp_rid, r0, grad)
        J = -(1.0 + rest) * v0 / jnp.maximum(K, 1e-30)
        ok = inside & (J > 0)
        imp = J[:, None] * grad
        J_tot, tau_tot = accumulate_impulses(bodies, bp_rid, imp, xb, ok)
        bodies = apply_impulses(bodies, J_tot, tau_tot)
        # friction from the post-impulse velocity (the reference applies
        # the normal impulse first, then recomputes v10, :371-381)
        v10 = velocity_at(bodies, bp_rid, xb)
        tao = v10 - grad * jnp.sum(grad * v10, -1, keepdims=True)
        tlen = jnp.linalg.norm(tao, axis=-1)
        tao = tao / jnp.maximum(tlen, 1e-30)[:, None]
        Kt = impulse_contribution(bodies, bp_rid, r0, tao)
        jt = -jnp.sum(v10 * tao, -1) / jnp.maximum(Kt, 1e-30)
        jt = jnp.clip(jt, -fric * J, fric * J)
        fok = ok & (tlen > 1e-7)
        J_tot, tau_tot = accumulate_impulses(
            bodies, bp_rid, jt[:, None] * tao, xb, fok
        )
        bodies = apply_impulses(bodies, J_tot, tau_tot)
    return bodies
