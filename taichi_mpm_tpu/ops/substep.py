"""The blocked high-performance substep: packed sort -> Pallas P2G halo
tiles -> gather-based sparse node records -> grid ops on records ->
window assembly -> Pallas G2P -> plasticity/advection.

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
from taichi_mpm_tpu.ops.blocked import BLOCK, block_starts, sort_particles
from taichi_mpm_tpu.ops.g2p_pallas import g2p_blocked
from taichi_mpm_tpu.ops.p2g_pallas import CHUNK, p2g_blocked


def _decode_block_origin(keys, cfg: SimConfig):
    """Padded block id -> block origin in grid units (float), per particle."""
    nbx, nby, nbz = blocked.num_blocks_padded(cfg)
    bz = keys % nbz
    by = (keys // nbz) % nby
    bx = keys // (nbz * nby)
    return jnp.stack([bx, by, bz], -1).astype(jnp.float32) * float(BLOCK)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def prep_p2g(p: Particles, keys, cfg: SimConfig, dt, origin=None):
    """Build the P2G operand pdata (16, Pw + CHUNK)."""
    invD = inv_D(cfg.kernel_order)
    if origin is None:
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
    # build channel-major directly: 16 (P,) rows stacked, instead of a
    # (P, 16) concat followed by a 512 MB relayout transpose at 8M
    rows = [mv[:, 0], mv[:, 1], mv[:, 2], mass]
    rows += [affine[:, i, j] for i in range(3) for j in range(3)]
    rows += [pos_local[:, 0], pos_local[:, 1], pos_local[:, 2]]
    pdata = jnp.stack(rows, 0)  # (16, P)
    return jnp.pad(pdata, ((0, 0), (0, pw + CHUNK - n)))


def grid_update_flat(rec, ids, cfg: SimConfig, colliders, t, dt):
    """Normalize + gravity + boundary projection on flat node records
    (K, 256) [c-major lanes: c*64 + l] -> velocity records (K, 192).

    Everything runs on layout-clean (K, 64)-lane slabs; the only
    (..., 3)-shaped arrays are the collider SDF/normal inputs (one
    materialization each — analytic normals avoid the 6 central-diff
    SDF evaluations)."""
    from taichi_mpm_tpu.core.levelset import DirichletRegion

    mass = rec[:, 192:256]
    has_mass = mass > 0.0
    inv = jnp.where(has_mass, 1.0 / jnp.maximum(mass, 1e-30), 0.0)
    v = [rec[:, c * 64 : (c + 1) * 64] * inv for c in range(3)]
    if not cfg.particle_gravity:
        for c in range(3):
            v[c] = jnp.where(has_mass, v[c] + cfg.gravity[c] * dt, v[c])
    if colliders:
        bx, by, bz, _ = blocked._decode_ids(ids, cfg)
        li = jnp.arange(64, dtype=jnp.int32)
        lx, ly, lz = li // 16, (li // 4) % 4, li % 4
        gx = (bx[:, None] * 4 + lx).astype(jnp.float32) * cfg.dx
        gy = (by[:, None] * 4 + ly).astype(jnp.float32) * cfg.dx
        gz = (bz[:, None] * 4 + lz).astype(jnp.float32) * cfg.dx
        xg = jnp.stack([gx, gy, gz], -1)  # (K, 64, 3)
        for c in colliders:
            if isinstance(c, DirichletRegion):
                m = c.mask(xg, t)
                vel = jnp.asarray(
                    c.velocity if c.velocity else (0.0, 0.0, 0.0), jnp.float32
                )
                for k in range(3):
                    v[k] = jnp.where(m, vel[k], v[k])
                continue
            phi = c.sdf(xg, t)
            band = (phi > c.band_lo * cfg.dx) & (phi <= c.band_hi * cfg.dx) & has_mass
            nrm = c.normal(xg, t, eps=0.5 * cfg.dx)
            bv = c.boundary_velocity(xg, t)
            n_c = [nrm[..., k] for k in range(3)]
            bv_c = [bv[..., k] for k in range(3)]
            # componentwise friction projection (mpm_fwd.h:26-57)
            mu = float(c.friction)
            sticky = mu == -1.0
            slip = mu <= -2.0
            mu_eff = -mu - 2.0 if slip else mu
            rel = [v[k] - bv_c[k] for k in range(3)]
            vn = sum(n_c[k] * rel[k] for k in range(3))
            vt = [rel[k] - vn * n_c[k] for k in range(3)]
            vt_norm = jnp.sqrt(
                jnp.maximum(sum(vt[k] * vt[k] for k in range(3)), 1e-30)
            )
            scale = jnp.maximum(vt_norm + jnp.minimum(vn, 0.0) * mu_eff, 0.0) / vt_norm
            keep_n = 0.0 if slip else jnp.maximum(vn, 0.0)
            for k in range(3):
                proj = bv_c[k] if sticky else scale * vt[k] + keep_n * n_c[k] + bv_c[k]
                v[k] = jnp.where(band, proj, v[k])
    return jnp.concatenate(v, axis=1)


def grid_update_records(rec, ids, cfg: SimConfig, colliders, t, dt):
    """Normalize + gravity + boundary projection on active block node
    records (K, 4, 4, 4, 4) — each grid node updated exactly once."""
    from taichi_mpm_tpu.core.levelset import DirichletRegion

    mass = rec[..., 3]
    has_mass = mass > 0.0
    inv_mass = jnp.where(has_mass, 1.0 / jnp.maximum(mass, 1e-30), 0.0)
    v = rec[..., :3] * inv_mass[..., None]
    if not cfg.particle_gravity:
        v = jnp.where(
            has_mass[..., None], v + jnp.asarray(cfg.gravity, v.dtype) * dt, v
        )
    if colliders:
        bx, by, bz, _ = blocked._decode_ids(ids, cfg)
        o = jnp.arange(4, dtype=jnp.float32)
        gx = (bx[:, None].astype(jnp.float32) * 4.0 + o) * cfg.dx
        gy = (by[:, None].astype(jnp.float32) * 4.0 + o) * cfg.dx
        gz = (bz[:, None].astype(jnp.float32) * 4.0 + o) * cfg.dx
        xg = jnp.stack(
            [
                jnp.broadcast_to(gx[:, :, None, None], mass.shape),
                jnp.broadcast_to(gy[:, None, :, None], mass.shape),
                jnp.broadcast_to(gz[:, None, None, :], mass.shape),
            ],
            -1,
        )
        for c in colliders:
            if isinstance(c, DirichletRegion):
                v = c.apply(v, xg, t)
                continue
            phi = c.sdf(xg, t)
            band = (phi > c.band_lo * cfg.dx) & (phi <= c.band_hi * cfg.dx)
            n = c.normal(xg, t, eps=0.5 * cfg.dx)
            bv = c.boundary_velocity(xg, t)
            v_proj = friction_project(v, bv, n, c.friction)
            v = jnp.where((band & has_mass)[..., None], v_proj, v)
    return v


def blocked_substep(
    p: Particles,
    t,
    cfg: SimConfig,
    colliders,
    dt,
    interpret: bool = False,
    max_active_blocks: int = 0,
):
    """One full substep on the blocked path. Returns
    ((particles, t+dt), n_active_blocks).

    Particles come back sorted by block (a new permutation every substep,
    mirroring the reference's per-substep sort, mpm.cpp:770-918).
    max_active_blocks (static) caps the compacted active-block set — the
    page-map capacity; 0 = dense (every block a program). The returned
    occupancy lets the driver detect overflow and re-jit larger.
    """
    K = max_active_blocks or blocked.total_blocks_padded(cfg)
    p, keys, _ = sort_particles(p, cfg)
    pm = build_page_map_full(keys, cfg, K)
    (p, t), n_act = substep_presorted(
        p, keys, pm, t, cfg, colliders, dt, interpret=interpret
    )
    return (p, t), n_act


def build_page_map_full(keys, cfg: SimConfig, K: int):
    """Page map + neighbor table + precomputed slot keys, built once per
    (re)sort and reused across substeps while particles stay within half
    a cell of their sort-time block."""
    nb_total = blocked.total_blocks_padded(cfg)
    ids, n_act, slot_map, s_arr, e_arr = blocked.build_page_map(keys, cfg, K)
    nbr = blocked.neighbor_slots(ids, slot_map, cfg)
    slot_keys = slot_map[jnp.minimum(keys, nb_total)]
    origin = _decode_block_origin(jnp.minimum(keys, nb_total - 1), cfg)
    return dict(
        ids=ids, n_act=n_act, s_arr=s_arr, e_arr=e_arr, nbr=nbr,
        slot_keys=slot_keys, origin=origin, slot_map=slot_map,
    )


def substep_presorted(
    p: Particles, keys, pm, t, cfg: SimConfig, colliders, dt,
    interpret: bool = False,
):
    """One substep against a frozen sort/page map.

    Exact as long as every particle is within half a cell of its
    sort-time block: the 7-node halo tile covers local positions in
    [-0.5, 4.5) (stencil nodes -1..5), so the per-substep re-sort the
    reference does (mpm.cpp:770-918, cheap on CPU, ~1/3 of the substep
    on TPU) is replaced by a drift-triggered lazy re-sort."""
    K = pm["ids"].shape[0]
    n = p.capacity
    pw = _round_up(n, CHUNK)

    pdata = prep_p2g(p, keys, cfg, dt, origin=pm["origin"])
    tiles = p2g_blocked(pm["s_arr"], pm["e_arr"], pdata, interpret=interpret)
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
    vrec = grid_update_flat(rec, pm["ids"], cfg, colliders, t, dt)
    gtiles = blocked.windows_mm(vrec, pm["nbr"])

    keys2d = jnp.pad(
        pm["slot_keys"][None, :], ((0, 0), (0, pw - n)), constant_values=K
    )
    posg = jnp.pad(pdata[13:16, :pw], ((0, 5), (0, 0)))  # block-local pos
    nb_dims = jnp.asarray([K], jnp.int32)
    pout = g2p_blocked(keys2d, posg, gtiles, nb_dims, interpret=interpret)

    pout = pout[:, :n].T  # (P, 16)
    v_new = pout[:, 0:3]
    b_new = pout[:, 3:12].reshape(n, 3, 3)
    act = p.active[:, None]
    v_new = jnp.where(act, v_new, 0.0)
    b_new = jnp.where(act[..., None], b_new, 0.0)
    p = g2p_finish(p, v_new, b_new, cfg, dt)
    if cfg.particle_collision:
        from taichi_mpm_tpu.core.transfer import particle_collision_resolution

        p = particle_collision_resolution(p, cfg, colliders, t)
    if cfg.clean_boundary:
        from taichi_mpm_tpu.core.solver import clear_boundary_particles

        p = clear_boundary_particles(p, cfg)
    return (p, t + dt), pm["n_act"]


def blocked_frame(
    p: Particles, t, cfg: SimConfig, colliders, dt, n_substeps: int, K: int,
    interpret: bool = False,
):
    """A frame with drift-triggered lazy re-sorting: sort once, run
    substeps against the frozen page map, and re-sort inside the scan
    (lax.cond) only when the accumulated max displacement approaches
    half a cell. Returns (p, t, max n_act, n_sorts)."""

    def resort(p):
        p, keys, _ = sort_particles(p, cfg)
        return p, keys, build_page_map_full(keys, cfg, K)

    p, keys, pm = resort(p)

    def body(carry, _):
        p, keys, pm, drift, t, nmax, nsorts = carry
        (p, t), n_act = substep_presorted(
            p, keys, pm, t, cfg, colliders, dt, interpret=interpret
        )
        # conservative per-substep drift bound from the post-update
        # velocities that advect this step
        vmax = jnp.max(jnp.where(p.active[:, None], jnp.abs(p.v), 0.0))
        drift = drift + dt * cfg.inv_dx * vmax
        need = drift >= 0.45

        def do_resort(p):
            # the barrier stops XLA from speculatively hoisting the
            # page-map segment ops out of the conditional (they showed
            # up every substep in traces otherwise)
            p = jax.lax.optimization_barrier(p)
            return resort(p)

        def keep(p):
            return p, keys, pm

        p, keys, pm = jax.lax.cond(need, do_resort, keep, p)
        drift = jnp.where(need, 0.0, drift)
        nsorts = nsorts + need.astype(jnp.int32)
        return (p, keys, pm, drift, t, jnp.maximum(nmax, n_act), nsorts), None

    carry = (p, keys, pm, jnp.float32(0.0), t, pm["n_act"], jnp.int32(1))
    (p, keys, pm, _, t, nmax, nsorts), _ = jax.lax.scan(
        body, carry, None, length=n_substeps
    )
    return p, t, nmax, nsorts
