"""CPIC two-way coupled P2G/G2P transfers and the coupled substep.

Semantics of the coloring branches in /root/reference/src/transfer.cpp:
  * P2G (:222-254): a grid node whose color tags are incompatible with
    the particle's affinity does not receive the scatter; instead the
    friction-projected velocity change becomes an impulse on the rigid
    body that owns the node.
  * G2P (:620-646): incompatible nodes are replaced by a "ghost"
    velocity (the particle's own velocity friction-projected against the
    rigid surface, plus a pushing force along the boundary normal), and
    penetrating particles get a penalty impulse exchanged with the rigid
    (:671-682).

Thread-local impulse accumulators (apply_tmp_impulse/apply_tmp_velocity)
become masked segment-sums into (R, d) arrays, applied once per pass —
deterministic and psum-able across shards.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.levelset import friction_project
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.core.transfer import _ravel, g2p_finish, stencil_offsets
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.math.kernels import bspline_weights, inv_D
from taichi_mpm_tpu.rigid import cdf
from taichi_mpm_tpu.rigid.body import (
    RigidBodies,
    accumulate_impulses,
    apply_impulses,
    boundary_particle_world,
    velocity_at,
)
from taichi_mpm_tpu.utils import outer, mv as mv_small


def _compatible(grid_state, p_state, smask):
    """Color compatibility test (transfer.cpp:228-230)."""
    mask = (grid_state & p_state & smask) >> 1
    return (grid_state & mask) == (p_state & mask)


def _friction_of(bodies: RigidBodies, rid, p_state):
    """Side-dependent rigid friction: frictions[negative_bit]
    (transfer.cpp:248)."""
    safe = jnp.clip(rid, 0, bodies.num - 1)
    neg = (p_state >> (2 * safe)) & 1
    return jnp.where(rid >= 0, bodies.friction[safe, neg], 0.0)


def _friction_of_masked(bodies: RigidBodies, rid, p_state):
    """_friction_of without the per-row (rid, neg) gather: static
    unroll over small R with rid == r masks (rid < 0 -> 0, as above)."""
    out = jnp.zeros(rid.shape, jnp.float32)
    for r in range(bodies.num):
        neg = (p_state >> (2 * r)) & 1
        fr = jnp.where(neg == 1, bodies.friction[r, 1],
                       bodies.friction[r, 0])
        out = jnp.where(rid == r, fr, out)
    return out


def p2g_cpic(p: Particles, bodies: RigidBodies, grid_rid, grid_states, cfg: SimConfig, dt):
    """CPIC P2G. Returns (grid (nodes..., d+1), J_tot (R,d), tau_tot)."""
    d = cfg.dim
    nodes = cfg.grid_nodes
    R = bodies.num
    smask = cdf.state_mask(R)
    invD = inv_D(cfg.kernel_order)

    pos = p.x * cfg.inv_dx
    base, w, dw = bspline_weights(cfg.kernel_order, pos)

    vel = p.v
    if cfg.particle_gravity:
        vel = vel + jnp.asarray(cfg.gravity, vel.dtype) * dt
    force = materials.dispatch_force(
        cfg.active_materials, p.mat, p.F, p.aux, p.params, p.vol
    )
    force = jnp.where(p.active[:, None, None], force, 0.0)
    affine = invD * p.mass[:, None, None] * p.C - (invD * cfg.inv_dx * dt) * force
    affine = jnp.where(p.active[:, None, None], affine, 0.0)
    mass = jnp.where(p.active, p.mass, 0.0)
    mv = mass[:, None] * vel

    N = 1
    for n in nodes:
        N *= n
    flat = jnp.zeros((N, d + 1), jnp.float32)
    J_tot = jnp.zeros((R, d), jnp.float32)
    tau_w = 1 if d == 2 else 3
    tau_tot = jnp.zeros((R, tau_w), jnp.float32)

    for off in stencil_offsets(d, cfg.kernel_order):
        idx = base + jnp.asarray(off, jnp.int32)
        dpos = pos - idx.astype(pos.dtype)
        wo = w[:, 0, off[0]]
        for k in range(1, d):
            wo = wo * w[:, k, off[k]]
        # world-space kernel gradient (kernel.h:33-35 convention)
        gradw = []
        for k in range(d):
            g = dw[:, k, off[k]]
            for j in range(d):
                if j != k:
                    g = g * w[:, j, off[j]]
            gradw.append(g * cfg.inv_dx)
        gradw = jnp.stack(gradw, -1)

        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        s = jnp.where(inb, grid_states[lin], 0)
        nrid = jnp.where(inb, grid_rid[lin], -1)
        compat = _compatible(s, p.states, smask)

        # -- compatible: normal MLS-MPM scatter --------------------------
        woa = wo * p.active
        mom = mv + mv_small(affine, dpos)
        val = jnp.concatenate([mom, mass[:, None]], -1) * woa[:, None]
        write = inb & compat
        flat = flat.at[lin].add(jnp.where(write[:, None], val, 0.0))

        # -- incompatible: impulse onto the owning rigid ------------------
        hit = inb & (~compat) & (nrid >= 0) & p.active
        xg = idx.astype(jnp.float32) * cfg.dx
        rid_safe = jnp.clip(nrid, 0, R - 1)
        rigid_v = velocity_at(bodies, rid_safe, xg)
        fric = _friction_of(bodies, nrid, p.states)
        dv = vel - friction_project(vel, rigid_v, p.bnormal, fric)
        impulse = (mass * wo)[:, None] * dv + dt * mv_small(force, gradw)
        Jo, tauo = accumulate_impulses(bodies, rid_safe, impulse, xg, hit)
        J_tot = J_tot + Jo
        tau_tot = tau_tot + tauo

    return flat.reshape(nodes + (d + 1,)), J_tot, tau_tot


def g2p_cpic(p: Particles, bodies: RigidBodies, grid_v, grid_rid, grid_states, cfg: SimConfig, dt):
    """CPIC G2P. Returns (particles', J_tot, tau_tot) with the boundary
    penalty impulses accumulated for the rigid update."""
    d = cfg.dim
    nodes = cfg.grid_nodes
    R = bodies.num
    smask = cdf.state_mask(R)

    pos = p.x * cfg.inv_dx
    base, w, _ = bspline_weights(cfg.kernel_order, pos)
    flat_v = grid_v.reshape(-1, d)

    v_new = jnp.zeros_like(p.v)
    b_new = jnp.zeros_like(p.C)
    rid_last = jnp.full((p.capacity,), -1, jnp.int32)

    for off in stencil_offsets(d, cfg.kernel_order):
        idx = base + jnp.asarray(off, jnp.int32)
        dpos = pos - idx.astype(pos.dtype)
        wo = w[:, 0, off[0]]
        for k in range(1, d):
            wo = wo * w[:, k, off[k]]
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        gv = jnp.where(inb[:, None], flat_v[lin], 0.0)
        s = jnp.where(inb, grid_states[lin], 0)
        nrid = jnp.where(inb, grid_rid[lin], -1)
        compat = _compatible(s, p.states, smask)
        incompat = inb & ~compat

        # ghost velocity for incompatible nodes (transfer.cpp:620-646)
        xg = idx.astype(jnp.float32) * cfg.dx
        rid_safe = jnp.clip(nrid, 0, R - 1)
        v_g = jnp.where(
            (nrid >= 0)[:, None], velocity_at(bodies, rid_safe, xg), 0.0
        )
        fric = _friction_of(bodies, nrid, p.states)
        fake_v = jnp.where(
            p.near_b[:, None],
            friction_project(p.v, v_g, p.bnormal, fric)
            + p.bnormal * (dt * cfg.dx * cfg.pushing_force),
            p.v,
        )
        gv_eff = jnp.where(incompat[:, None], fake_v, gv)
        rid_last = jnp.where(incompat & (nrid >= 0), nrid, rid_last)

        v_new = v_new + wo[:, None] * gv_eff
        b_new = b_new + outer(wo[:, None] * gv_eff, dpos)

    act = p.active[:, None]
    v_new = jnp.where(act, v_new, 0.0)
    b_new = jnp.where(act[..., None], b_new, 0.0)
    # near-boundary particles zero their APIC B but keep cdg from b
    # (transfer.cpp:649-655)
    p = g2p_finish(p, v_new, b_new, cfg, dt, zero_C=p.near_b)

    # boundary penetration penalty (transfer.cpp:671-682)
    pen = (
        p.active
        & p.near_b
        & (p.bdist < -0.05 * cfg.dx)
        & (p.bdist > -0.3 * cfg.dx)
    )
    dv = p.bdist[:, None] * p.bnormal * cfg.penalty
    v_fixed = jnp.where(pen[:, None], p.v - dv, p.v)
    J = dv * p.mass[:, None]
    valid = pen & (rid_last >= 0)
    J_tot, tau_tot = accumulate_impulses(
        bodies, jnp.clip(rid_last, 0, R - 1), J, p.x, valid
    )
    return dataclasses.replace(p, v=v_fixed), J_tot, tau_tot


def cpic_substep(p: Particles, bodies: RigidBodies, t, cfg: SimConfig, scene, dt):
    """One fully coupled substep (reference substep order, mpm.cpp:452-575):

      advance rigid collision/articulation -> rasterize rigid CDF ->
      gather particle CDF -> CPIC P2G (+impulses) -> grid ops -> CPIC G2P
      (+penalty impulses) -> advect rigid bodies.

    `scene` is a CPICScene (static boundary-particle data + scripted
    motion callables + colliders + articulations).
    """
    from taichi_mpm_tpu.core import transfer
    from taichi_mpm_tpu.rigid import articulation as artic
    from taichi_mpm_tpu.rigid import collision as coll
    from taichi_mpm_tpu.rigid.body import advance

    R = bodies.num

    # coupling_iterations x {rigidify, articulate, rasterize}
    # (mpm.cpp:467-471)
    for _ in range(max(1, cfg.coupling_iterations)):
        if scene.collision is not None:
            dirs = jnp.asarray(coll.icosphere_directions())
            bodies = coll.rigidify(
                bodies, scene.hull_verts, scene.collision, dirs, dt
            )
        if scene.articulations:
            bodies = artic.articulate(bodies, scene.articulations, dt)
        xb, _, elem_w = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        grid_dist, grid_rid, grid_states = cdf.rasterize_rigid_boundary(
            xb, elem_w, scene.bp_rid, R, cfg
        )
    states, bdist, bnormal, near_b = cdf.gather_cdf(
        p.x, p.states, grid_dist, grid_rid, grid_states, R, cfg
    )
    p = dataclasses.replace(
        p, states=states, bdist=bdist, bnormal=bnormal, near_b=near_b
    )

    grid, J1, tau1 = p2g_cpic(p, bodies, grid_rid, grid_states, cfg, dt)
    bodies = apply_impulses(bodies, J1, tau1)

    # rigid vs domain level set (between normalize and grid BCs in the
    # reference substep, mpm.cpp:452-575)
    if scene.colliders:
        bodies = coll.rigid_levelset_collision(
            bodies, xb, scene.bp_rid, scene.colliders, t, dt
        )

    grid_v, _ = transfer.grid_update(grid, cfg, scene.colliders, t, dt)

    p, J2, tau2 = g2p_cpic(p, bodies, grid_v, grid_rid, grid_states, cfg, dt)
    bodies = apply_impulses(bodies, J2, tau2)

    if cfg.particle_collision:
        p = transfer.particle_collision_resolution(p, cfg, scene.colliders, t)
    if cfg.clean_boundary:
        from taichi_mpm_tpu.core.solver import clear_boundary_particles

        p = clear_boundary_particles(p, cfg)

    bodies = advance(bodies, t, dt, scene.pos_funcs, scene.rot_funcs, cfg.gravity)
    return p, bodies, t + dt
