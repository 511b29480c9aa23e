"""The blocked high-performance substep: sort -> Pallas P2G -> dense grid
ops -> Pallas G2P -> plasticity/advection.

This is the performance path of the framework (the analog of the
reference's ``optimized=true`` pipeline, mpm.cpp:452-575 with
rasterize_optimized/resample_optimized); core/transfer.py is the
generic oracle it is differential-tested against, exactly like the
reference tests its SIMD path against the generic one (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.levelset import friction_project
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.core.transfer import g2p_finish
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.math.kernels import inv_D
from taichi_mpm_tpu.ops import blocked
from taichi_mpm_tpu.ops.blocked import BLOCK, block_starts, num_blocks, sort_particles
from taichi_mpm_tpu.ops.g2p_pallas import g2p_blocked
from taichi_mpm_tpu.ops.p2g_pallas import CHUNK, p2g_blocked


def _decode_block_origin(keys, cfg: SimConfig):
    """Block id -> block origin in grid units (float), per particle."""
    nbx, nby, nbz = num_blocks(cfg)
    bz = keys % nbz
    by = (keys // nbz) % nby
    bx = keys // (nbz * nby)
    return jnp.stack([bx, by, bz], -1).astype(jnp.float32) * float(BLOCK)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def prep_p2g(p: Particles, keys, cfg: SimConfig, dt):
    """Build the P2G operand pdata (16, Pw + CHUNK)."""
    invD = inv_D(cfg.kernel_order)
    origin = _decode_block_origin(keys, cfg)
    pos_local = p.x * cfg.inv_dx - origin

    vel = p.v
    if cfg.particle_gravity:
        vel = vel + jnp.asarray(cfg.gravity, vel.dtype) * dt
    force = materials.dispatch_force(
        cfg.active_materials, p.mat, p.F, p.aux, p.params, p.vol
    )
    affine = invD * p.mass[:, None, None] * p.C - (invD * cfg.inv_dx * dt) * force
    affine = jnp.where(p.active[:, None, None], affine, 0.0)
    mass = jnp.where(p.active, p.mass, 0.0)
    mv = mass[:, None] * vel

    n = p.capacity
    pw = _round_up(n, CHUNK)
    pdata = jnp.concatenate(
        [mv, mass[:, None], affine.reshape(n, 9), pos_local], axis=1
    ).T  # (16, P)
    return jnp.pad(pdata, ((0, 0), (0, pw + CHUNK - n)))


def grid_update_blocked(G, cfg: SimConfig, colliders, t, dt):
    """Normalize + gravity + boundary projection on the blocked dense grid
    (same semantics as core.transfer.grid_update, different layout)."""
    mass = G[..., 3]
    has_mass = mass > 0.0
    inv_mass = jnp.where(has_mass, 1.0 / jnp.maximum(mass, 1e-30), 0.0)
    v = G[..., :3] * inv_mass[..., None]
    if not cfg.particle_gravity:
        v = jnp.where(
            has_mass[..., None], v + jnp.asarray(cfg.gravity, v.dtype) * dt, v
        )
    if colliders:
        gx, gy, gz = blocked.node_coords_blocked(cfg)
        xg = jnp.stack([gx, gy, gz], -1)
        for c in colliders:
            phi = c.sdf(xg, t)
            band = (phi > c.band_lo * cfg.dx) & (phi <= c.band_hi * cfg.dx)
            n = c.normal(xg, t, eps=0.5 * cfg.dx)
            bv = c.boundary_velocity(xg, t)
            v_proj = friction_project(v, bv, n, c.friction)
            v = jnp.where((band & has_mass)[..., None], v_proj, v)
    return v


def blocked_substep(
    p: Particles, t, cfg: SimConfig, colliders, dt, interpret: bool = False
):
    """One full substep on the blocked path. Returns (particles, t+dt).

    Particles come back sorted by block (a new permutation every substep,
    mirroring the reference's per-substep sort, mpm.cpp:770-918).
    """
    nbx, nby, nbz = num_blocks(cfg)
    nb_total = nbx * nby * nbz
    n = p.capacity
    pw = _round_up(n, CHUNK)

    p, keys, _ = sort_particles(p, cfg)
    starts = block_starts(keys, nb_total)

    pdata = prep_p2g(p, keys, cfg, dt)
    tiles = p2g_blocked(starts, pdata, nb_total, interpret=interpret)
    G = blocked.merge_tiles(tiles.reshape(nb_total, 7, 4, 7, 7), cfg)
    gv = grid_update_blocked(G, cfg, colliders, t, dt)
    gtiles = blocked.extract_tiles(gv, cfg)

    keys2d = jnp.pad(
        keys[None, :], ((0, 0), (0, pw - n)), constant_values=nb_total
    )
    posg = jnp.pad((p.x * cfg.inv_dx).T, ((0, 5), (0, pw - n)))  # (8, Pw)
    nb_dims = jnp.asarray([nb_total, nby, nbz], jnp.int32)
    pout = g2p_blocked(keys2d, posg, gtiles, nb_dims, interpret=interpret)

    pout = pout[:, :n].T  # (P, 16)
    v_new = pout[:, 0:3]
    b_new = pout[:, 3:12].reshape(n, 3, 3)
    act = p.active[:, None]
    v_new = jnp.where(act, v_new, 0.0)
    b_new = jnp.where(act[..., None], b_new, 0.0)
    p = g2p_finish(p, v_new, b_new, cfg, dt)
    return p, t + dt
