"""P2G / G2P transfer operators — portable XLA path.

This is the framework's *reference* transfer implementation: a pure-JAX
scatter-add / gather formulation of the fused MLS-MPM transfers
(semantics of /root/reference/src/transfer.cpp:193-278 "rasterize" and
:585-687 "resample"). It runs on any backend, serves as the numerical
oracle for the blocked Pallas kernels (mirroring the reference's
optimized-vs-generic differential-testing strategy, SURVEY.md §4), and
is the fallback where the Pallas path is unavailable.

Key quantities (grid-unit convention, identical to the reference):
  pos   = x / dx                       (grid units)
  dpos  = pos - node                   (grid units)
  B     = sum_i w_i v_i dpos_i         ("apic_b")
  P2G value_i = w_i * (m v + [invD m B - invD inv_dx dt force] dpos_i, m)
  G2P   cdg   = I - invD dt inv_dx B   (the MLS-MPM F-update)
with invD = 6 - order = 4 for the quadratic default (kernel.h:68-70),
force = -vol P F^T (materials).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.math.kernels import bspline_weights, inv_D
from taichi_mpm_tpu.utils import outer, mv as mv_small


def stencil_offsets(dim: int, order: int):
    return tuple(itertools.product(range(order + 1), repeat=dim))


def _weights(cfg: SimConfig, x):
    pos = x * cfg.inv_dx
    base, w, _ = bspline_weights(cfg.kernel_order, pos)
    return pos, base, w


def _offset_weight(w, off):
    """Tensor-product weight of one stencil offset: prod_k w[:, k, off_k]."""
    wo = w[:, 0, off[0]]
    for k in range(1, len(off)):
        wo = wo * w[:, k, off[k]]
    return wo


def _ravel(idx, nodes):
    lin = idx[..., 0]
    for k in range(1, len(nodes)):
        lin = lin * nodes[k] + idx[..., k]
    return lin


def p2g(p: Particles, cfg: SimConfig, dt) -> jnp.ndarray:
    """Particle-to-grid scatter of (momentum, mass).

    Returns grid array of shape cfg.grid_nodes + (dim+1,).
    """
    d = cfg.dim
    nodes = cfg.grid_nodes
    invD = inv_D(cfg.kernel_order)
    pos, base, w = _weights(cfg, p.x)

    vel = p.v
    if cfg.particle_gravity:
        vel = vel + jnp.asarray(cfg.gravity, vel.dtype) * dt

    force = materials.dispatch_force(
        cfg.active_materials, p.mat, p.F, p.aux, p.params, p.vol
    )
    # affine momentum + fused MLS force (transfer.cpp:261-265):
    # value = w * (m v + (invD m B - invD inv_dx dt force) dpos, m)
    affine = invD * p.mass[:, None, None] * p.C - (invD * cfg.inv_dx * dt) * force
    # Inactive slots may hold garbage F -> NaN force; hard-zero them
    # (0 * NaN would still poison the scatter).
    affine = jnp.where(p.active[:, None, None], affine, 0.0)

    mass = jnp.where(p.active, p.mass, 0.0)
    mv = mass[:, None] * vel

    num = 1
    for n in nodes:
        num *= n
    flat = jnp.zeros((num, d + 1), jnp.float32)

    for off in stencil_offsets(d, cfg.kernel_order):
        idx = base + jnp.asarray(off, jnp.int32)
        dpos = pos - idx.astype(pos.dtype)
        wo = _offset_weight(w, off) * p.active
        mom = mv + mv_small(affine, dpos)
        val = jnp.concatenate([mom, mass[:, None]], -1) * wo[:, None]
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        flat = flat.at[lin].add(jnp.where(inb[:, None], val, 0.0))

    return flat.reshape(nodes + (d + 1,))


def grid_update(grid, cfg: SimConfig, colliders, t, dt):
    """Normalize momentum -> velocity, apply gravity and boundary colliders.

    Mirrors normalize_grid_and_apply_external_force (mpm.cpp:277-294) and
    apply_grid_boundary_conditions (mpm.cpp:296-372). Returns node
    velocities, shape nodes + (d,), plus the mass channel untouched.
    """
    from taichi_mpm_tpu.core.levelset import DirichletRegion, friction_project

    d = cfg.dim
    mass = grid[..., d]
    has_mass = mass > 0.0
    inv_mass = jnp.where(has_mass, 1.0 / jnp.maximum(mass, 1e-30), 0.0)
    v = grid[..., :d] * inv_mass[..., None]
    if not cfg.particle_gravity:
        v = jnp.where(
            has_mass[..., None],
            v + jnp.asarray(cfg.gravity, v.dtype) * dt,
            v,
        )

    if colliders:
        # Node physical positions.
        axes = [jnp.arange(n, dtype=jnp.float32) * cfg.dx for n in cfg.grid_nodes]
        mesh = jnp.meshgrid(*axes, indexing="ij")
        xg = jnp.stack(mesh, -1)
        for c in colliders:
            if isinstance(c, DirichletRegion):
                # pinned-velocity region (mpm.cpp:374-412)
                v = c.apply(v, xg, t)
                continue
            phi = c.sdf(xg, t)
            band = (phi > c.band_lo * cfg.dx) & (phi <= c.band_hi * cfg.dx)
            n = c.normal(xg, t, eps=0.5 * cfg.dx)
            bv = c.boundary_velocity(xg, t)
            v_proj = friction_project(v, bv, n, c.friction)
            v = jnp.where((band & has_mass)[..., None], v_proj, v)

    return v, mass


def particle_collision_resolution(p: Particles, cfg: SimConfig, colliders, t) -> Particles:
    """Per-particle levelset projection: push penetrating particles to
    the surface and remove their normal velocity
    (MPM::particle_collision_resolution, mpm.cpp:414-427)."""
    import dataclasses

    from taichi_mpm_tpu.core.levelset import DirichletRegion

    x, v = p.x, p.v
    for c in colliders:
        if isinstance(c, DirichletRegion):
            continue
        phi = c.sdf(x, t)
        grad = c.normal(x, t, eps=0.5 * cfg.dx)
        hit = p.active & (phi < 0.0)
        x = jnp.where(hit[:, None], x - grad * phi[:, None], x)
        vn = jnp.sum(grad * v, -1, keepdims=True)
        v = jnp.where(hit[:, None], v - vn * grad, v)
    return dataclasses.replace(p, x=x, v=v)


def g2p(p: Particles, grid_v, cfg: SimConfig, dt) -> Particles:
    """Grid-to-particle gather + F-update + plasticity + advection.

    Mirrors resample (transfer.cpp:585-687): gather velocity and APIC B,
    MLS-MPM velocity-gradient F-update, material return map, advect,
    position clamp, and RPIC/APIC damping (mpm.h:465-469).
    """
    d = cfg.dim
    nodes = cfg.grid_nodes
    pos, base, w = _weights(cfg, p.x)

    flat_v = grid_v.reshape(-1, d)
    v_new = jnp.zeros_like(p.v)
    b_new = jnp.zeros_like(p.C)

    for off in stencil_offsets(d, cfg.kernel_order):
        idx = base + jnp.asarray(off, jnp.int32)
        dpos = pos - idx.astype(pos.dtype)
        wo = _offset_weight(w, off)
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        gv = jnp.where(inb[:, None], flat_v[lin], 0.0)
        v_new = v_new + wo[:, None] * gv
        b_new = b_new + outer(wo[:, None] * gv, dpos)

    return g2p_finish(p, v_new, b_new, cfg, dt)


def g2p_finish(p: Particles, v_new, b_new, cfg: SimConfig, dt, zero_C=None,
               return_count: bool = False):
    """Shared tail of G2P: damping, MLS F-update, plasticity, advection,
    clamping, NaN robustness. Used by both the XLA gather path above and
    the blocked Pallas path (ops.substep). `zero_C` optionally masks
    particles whose APIC B is reset (CPIC near-boundary particles,
    transfer.cpp:649-655) while the F-update still uses b_new.
    `return_count=True` additionally returns the summed plasticity/
    cutting event count (the reference's work counters, mpm.h:111-112)."""
    import dataclasses

    d = cfg.dim
    invD = inv_D(cfg.kernel_order)

    # RPIC/APIC damping (mpm.h:465-469).
    b_sym = 0.5 * (b_new + jnp.swapaxes(b_new, -1, -2))
    b_skew = b_new - b_sym
    C_new = (1.0 - cfg.rpic_damping) * b_sym + (1.0 - cfg.apic_damping) * b_skew
    if not cfg.apic:
        C_new = jnp.zeros_like(C_new)
    if zero_C is not None:
        C_new = jnp.where(zero_C[:, None, None], 0.0, C_new)

    # MLS-MPM F-update: cdg = I - invD dt inv_dx B (transfer.cpp:659-661).
    eye = jnp.eye(d, dtype=b_new.dtype)
    cdg = eye - (invD * dt * cfg.inv_dx) * b_new

    F_new, aux_new, cnt = materials.dispatch_plasticity(
        cfg.active_materials, p.mat, p.F, cdg, p.aux, p.params, dt
    )

    x_new = p.x + dt * v_new
    # Position clamp (transfer.cpp:667-670).
    hi = (jnp.asarray(cfg.res, jnp.float32) - cfg.clamp_eps) * cfg.dx
    x_new = jnp.clip(x_new, 0.0, hi)

    # Keep inactive slots inert.
    act = p.active
    sel = act[:, None]
    selm = act[:, None, None]
    new = dataclasses.replace(
        p,
        x=jnp.where(sel, x_new, p.x),
        v=jnp.where(sel, v_new, p.v),
        F=jnp.where(selm, F_new, p.F),
        C=jnp.where(selm, C_new, p.C),
        aux=jnp.where(act, aux_new, p.aux),
    )
    # Robustness: deactivate NaN particles (reference deletes them,
    # mpm.cpp:582-633).
    finite = (
        jnp.all(jnp.isfinite(new.x), -1)
        & jnp.all(jnp.isfinite(new.v), -1)
        & jnp.all(jnp.isfinite(new.F), (-2, -1))
    )
    out = dataclasses.replace(new, active=new.active & finite)
    if return_count:
        return out, jnp.sum(jnp.where(out.active, cnt, 0))
    return out
