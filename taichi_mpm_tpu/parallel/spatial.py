"""Stage-2 multi-chip execution: spatial domain decomposition.

The reference is single-node shared-memory; its only decomposition is
TBB-over-blocks (SURVEY.md §2.3). This module is the distributed
backend the reference never had, designed for ICI:

  * the domain is split into S slabs along x (the analog of the
    reference's block-level decomposition, promoted to the chip level);
  * every shard keeps its resident particles plus a *node-window* grid:
    its slab's node columns plus a halo of H=2 columns each side — the
    quadratic-stencil support of its particles (the role of the
    reference's fat_page_map one-block halo, mpm.cpp:832-865);
  * after local P2G, overlapping window columns are summed with one
    symmetric ppermute exchange in each direction (each shard sends its
    2H+1 boundary columns both ways and adds what it receives) — after
    which every shard's whole window holds complete sums, so grid ops
    and G2P are purely local, with no second exchange;
  * after advection, particles that crossed a slab boundary migrate to
    the neighbor shard via ppermute of fixed-capacity buffers (the
    distributed analog of the reference's per-substep resort,
    mpm.cpp:770-918). CFL limits movement to < 1 cell/substep, so only
    adjacent-shard migration can occur.

Everything runs inside one shard_map-jitted frame; collectives ride ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.utils import mv as mv_small
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.core.transfer import (
    _offset_weight,
    _ravel,
    g2p_finish,
    stencil_offsets,
)
from taichi_mpm_tpu.core.levelset import friction_project
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.math.kernels import bspline_weights, inv_D

HALO = 2  # node columns of stencil support each side of a slab


def slab_cells(cfg: SimConfig, n_shards: int) -> int:
    assert cfg.res[0] % n_shards == 0, (
        f"res[0]={cfg.res[0]} must divide by n_shards={n_shards}"
    )
    return cfg.res[0] // n_shards


def window_nodes(cfg: SimConfig, n_shards: int) -> int:
    """Local node columns: slab width + (2H+1) shared/halo columns."""
    return slab_cells(cfg, n_shards) + 2 * HALO + 1


# ---------------------------------------------------------------------------
# Local (per-shard) transfer operators on the node window
# ---------------------------------------------------------------------------


def _local_nodes(cfg: SimConfig, n_shards: int) -> Tuple[int, ...]:
    return (window_nodes(cfg, n_shards),) + cfg.grid_nodes[1:]


def p2g_local(p: Particles, x_start, cfg: SimConfig, dt, n_shards: int):
    """Local scatter into the shard's node window. x_start is the global
    node column of window column 0 (traced, shard-dependent)."""
    d = cfg.dim
    nodes = _local_nodes(cfg, n_shards)
    invD = inv_D(cfg.kernel_order)
    pos = p.x * cfg.inv_dx
    base, w, _ = bspline_weights(cfg.kernel_order, pos)
    # localize the x axis
    base = base.at[:, 0].add(-x_start)

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

    num = int(np.prod(nodes))
    flat = jnp.zeros((num, d + 1), jnp.float32)
    # global in-domain bound per axis; x bound checked in window coords
    for off in stencil_offsets(d, cfg.kernel_order):
        idx = base + jnp.asarray(off, jnp.int32)
        gx = idx[:, 0] + x_start  # global x node
        dpos = pos - idx.astype(pos.dtype)
        dpos = dpos.at[:, 0].add(-x_start.astype(pos.dtype))
        wo = _offset_weight(w, off) * p.active
        mom = mv + mv_small(affine, dpos)
        val = jnp.concatenate([mom, mass[:, None]], -1) * wo[:, None]
        inb = (
            (idx[:, 0] >= 0)
            & (idx[:, 0] < nodes[0])
            & (gx >= 0)
            & (gx < cfg.grid_nodes[0])
        )
        for k in range(1, d):
            inb = inb & (idx[:, k] >= 0) & (idx[:, k] < nodes[k])
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        flat = flat.at[lin].add(jnp.where(inb[:, None], val, 0.0))
    return flat.reshape(nodes + (d + 1,))


def grid_update_local(grid, x_start, cfg: SimConfig, colliders, t, dt, n_shards: int):
    """Normalize + gravity + colliders on the window (global coords)."""
    d = cfg.dim
    nodes = _local_nodes(cfg, n_shards)
    mass = grid[..., d]
    has_mass = mass > 0.0
    inv_mass = jnp.where(has_mass, 1.0 / jnp.maximum(mass, 1e-30), 0.0)
    v = grid[..., :d] * inv_mass[..., None]
    if not cfg.particle_gravity:
        v = jnp.where(
            has_mass[..., None], v + jnp.asarray(cfg.gravity, v.dtype) * dt, v
        )
    if colliders:
        ax_x = (x_start.astype(jnp.float32) + jnp.arange(nodes[0], dtype=jnp.float32)) * cfg.dx
        axes = [ax_x] + [
            jnp.arange(n, dtype=jnp.float32) * cfg.dx for n in nodes[1:]
        ]
        mesh = jnp.meshgrid(*axes, indexing="ij")
        xg = jnp.stack(mesh, -1)
        for c in colliders:
            phi = c.sdf(xg, t)
            band = (phi > c.band_lo * cfg.dx) & (phi <= c.band_hi * cfg.dx)
            nrm = c.normal(xg, t, eps=0.5 * cfg.dx)
            bv = c.boundary_velocity(xg, t)
            v = jnp.where(
                (band & has_mass)[..., None],
                friction_project(v, bv, nrm, c.friction),
                v,
            )
    return v


def g2p_local(p: Particles, grid_v, x_start, cfg: SimConfig, dt, n_shards: int):
    d = cfg.dim
    nodes = _local_nodes(cfg, n_shards)
    pos = p.x * cfg.inv_dx
    base, w, _ = bspline_weights(cfg.kernel_order, pos)
    base = base.at[:, 0].add(-x_start)
    flat_v = grid_v.reshape(-1, d)
    v_new = jnp.zeros_like(p.v)
    b_new = jnp.zeros_like(p.C)
    for off in stencil_offsets(d, cfg.kernel_order):
        idx = base + jnp.asarray(off, jnp.int32)
        dpos = pos - idx.astype(pos.dtype)
        dpos = dpos.at[:, 0].add(-x_start.astype(pos.dtype))
        wo = _offset_weight(w, off)
        inb = (idx[:, 0] >= 0) & (idx[:, 0] < nodes[0])
        for k in range(1, d):
            inb = inb & (idx[:, k] >= 0) & (idx[:, k] < nodes[k])
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        gv = jnp.where(inb[:, None], flat_v[lin], 0.0)
        v_new = v_new + wo[:, None] * gv
        b_new = b_new + gv[:, :, None] * dpos[:, None, :] * wo[:, None, None]
    return g2p_finish(p, v_new, b_new, cfg, dt)


# ---------------------------------------------------------------------------
# Collectives: halo all-reduce + particle migration
# ---------------------------------------------------------------------------


def halo_allreduce(grid, axis: str, n_shards: int):
    """Sum the 2H+1 overlapping window columns between neighbors.

    Window of shard s covers global node columns
    [s*Wc - H, s*Wc + Wc + H]; adjacent windows overlap in exactly
    2H+1 columns. Each shard sends its low overlap left and its high
    overlap right (pre-exchange values), adds what arrives; afterwards
    every column holds the complete sum."""
    K = 2 * HALO + 1
    lo = grid[:K]
    hi = grid[-K:]
    right = [(i, i + 1) for i in range(n_shards - 1)]  # s -> s+1
    left = [(i + 1, i) for i in range(n_shards - 1)]  # s -> s-1
    from_left = jax.lax.ppermute(hi, axis, right)  # neighbor's hi -> my lo
    from_right = jax.lax.ppermute(lo, axis, left)  # neighbor's lo -> my hi
    grid = grid.at[:K].add(from_left)
    grid = grid.at[-K:].add(from_right)
    return grid


def _take(tree, idx):
    return jax.tree.map(lambda a: a[idx], tree)


def migrate(p: Particles, s, axis: str, cfg: SimConfig, n_shards: int, budget: int,
            count_only_overflow: bool = True, dest=None):
    """Move particles whose cell column left the slab to the neighbor.

    Fixed-size buffers of `budget` particles each direction; overflow
    beyond the budget is deactivated and counted. Buffers ride
    ppermute; inactive buffer slots are zero and merge as no-ops.

    `dest` (per-particle target shard, int32) overrides the uniform
    column->shard map — the load-balanced slab path passes ownership
    derived from its dynamic boundaries. Only +-1-shard moves are
    representable (one ppermute round); callers must bound boundary
    shifts accordingly (spatial_blocked.DMAX <= MINW).

    Returns (merged, n): with count_only_overflow=True (legacy), n =
    particles dropped; with False, n = the max per-direction migrant
    count (the budget DEMAND — callers re-jit with budget >= n and
    re-run the frame so nothing is ever lost, VERDICT r1 #7).
    """
    budget = min(budget, p.capacity // 2)
    if dest is None:
        Wc = slab_cells(cfg, n_shards)
        cx = jnp.floor(p.x[:, 0] * cfg.inv_dx).astype(jnp.int32)
        dest = jnp.clip(cx // Wc, 0, n_shards - 1)
    go_left = p.active & (dest < s)
    go_right = p.active & (dest > s)

    def pack(mask):
        order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
        buf = _take(p, order[:budget])
        sent = mask[order[:budget]]  # which buffer slots hold migrants
        buf = dataclasses.replace(buf, active=sent)
        n_over = jnp.sum(mask) - jnp.sum(sent)
        return buf, n_over

    buf_l, over_l = pack(go_left)
    buf_r, over_r = pack(go_right)

    left = [(i + 1, i) for i in range(n_shards - 1)]
    right = [(i, i + 1) for i in range(n_shards - 1)]
    recv_from_right = jax.tree.map(
        lambda a: jax.lax.ppermute(a, axis, left), buf_l
    )  # their left-goers arrive at me
    recv_from_left = jax.tree.map(
        lambda a: jax.lax.ppermute(a, axis, right), buf_r
    )

    # drop all departures (sent or over-budget) locally
    p = dataclasses.replace(p, active=p.active & ~(go_left | go_right))

    # merge arrivals into free slots (distinct by argsort; arrivals
    # beyond the free-slot count are dropped and counted)
    both = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], 0), recv_from_left, recv_from_right
    )
    # compact arrivals to the FRONT so buffer position == arrival rank:
    # slots[j] is only guaranteed free for j < n_free, so an arrival
    # sitting at a later buffer index (e.g. the right-buffer half) must
    # not write through slots[j >= n_free] — that's a LIVE particle
    both = _take(both, jnp.argsort(jnp.where(both.active, 0, 1),
                                   stable=True))
    free_order = jnp.argsort(jnp.where(p.active, 1, 0), stable=True)  # free first
    slots = free_order[: 2 * budget]
    n_free = jnp.sum(~p.active)
    ok = both.active & (jnp.arange(2 * budget) < n_free)
    merged = jax.tree.map(
        lambda dst, src: dst.at[slots].set(
            jnp.where(ok.reshape((-1,) + (1,) * (src.ndim - 1)), src, dst[slots])
        ),
        p,
        both,
    )
    if count_only_overflow:
        return merged, over_l + over_r + jnp.sum(both.active & ~ok)
    demand = jnp.maximum(jnp.sum(go_left), jnp.sum(go_right))
    demand = jnp.maximum(demand, jnp.sum(both.active))
    # arrivals beyond local free capacity also force a re-run (rare:
    # means the shard's slack is exhausted, grow via budget anyway)
    demand = jnp.where(
        jnp.sum(both.active & ~ok) > 0, jnp.int32(p.capacity), demand
    )
    return merged, demand.astype(jnp.int32)


# ---------------------------------------------------------------------------
# The sharded substep / frame
# ---------------------------------------------------------------------------


def spatial_substep(p: Particles, t, cfg: SimConfig, colliders, dt, axis: str, n_shards: int, budget: int):
    s = jax.lax.axis_index(axis)
    Wc = slab_cells(cfg, n_shards)
    x_start = s * Wc - HALO  # global node column of window col 0

    grid = p2g_local(p, x_start, cfg, dt, n_shards)
    grid = halo_allreduce(grid, axis, n_shards)
    gv = grid_update_local(grid, x_start, cfg, colliders, t, dt, n_shards)
    p = g2p_local(p, gv, x_start, cfg, dt, n_shards)
    p, dropped = migrate(p, s, axis, cfg, n_shards, budget)
    return p, t + dt, dropped


def build_spatial_frame(
    cfg: SimConfig,
    colliders,
    n_substeps: int,
    mesh: Mesh,
    axis: str = "x",
    budget: int | None = None,
):
    """Jitted shard_map frame over a 1-D mesh: S slabs along x."""
    from jax import shard_map

    n_shards = mesh.shape[axis]
    if budget is None:
        budget = 256

    def local_frame(p: Particles, t):
        def body(carry, _):
            pp, tt, dr = carry
            pp, tt, d2 = spatial_substep(
                pp, tt, cfg, colliders, cfg.base_dt, axis, n_shards, budget
            )
            return (pp, tt, dr + d2), None

        (p, t, dropped), _ = jax.lax.scan(
            body, (p, t, jnp.int32(0)), None, length=n_substeps
        )
        return p, t, jax.lax.psum(dropped, axis)

    pspec = P(axis)
    p_specs = jax.tree.map(lambda _: pspec, _particles_struct())
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, P()),
        out_specs=(p_specs, P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _particles_struct():
    """A Particles skeleton for tree-mapping specs."""
    return Particles(
        x=0, v=0, F=0, C=0, aux=0, mass=0, vol=0, mat=0, params=0,
        active=0, states=0, bdist=0, bnormal=0, near_b=0,
    )


def shard_spatially(p: Particles, cfg: SimConfig, mesh: Mesh, axis: str = "x", slack: float = 1.0):
    """Host-side: bin particles into slabs, pad every slab to the same
    local capacity, and device_put sharded along the mesh axis.

    slack >= 1 adds per-slab free capacity for migration/emission.
    Returns the sharded Particles with capacity S * C_local."""
    n_shards = mesh.shape[axis]
    Wc = slab_cells(cfg, n_shards)
    x = np.asarray(p.x)
    act = np.asarray(p.active)
    cx = np.clip((x[:, 0] / cfg.dx).astype(np.int64), 0, cfg.res[0] - 1)
    slab = np.clip(cx // Wc, 0, n_shards - 1)
    counts = np.bincount(slab[act], minlength=n_shards)
    C_local = int(np.ceil(counts.max() * slack))
    C_local = max(C_local, 8)

    def reorganize(a):
        a = np.asarray(a)
        out = np.zeros((n_shards * C_local,) + a.shape[1:], a.dtype)
        for sh in range(n_shards):
            sel = act & (slab == sh)
            n = sel.sum()
            out[sh * C_local : sh * C_local + n] = a[sel]
        return out

    arrays = {
        f.name: reorganize(getattr(p, f.name))
        for f in dataclasses.fields(p)
        if f.name != "active"
    }
    active = np.zeros(n_shards * C_local, bool)
    for sh in range(n_shards):
        active[sh * C_local : sh * C_local + int(counts[sh])] = True
    # inactive F must stay identity-ish to keep plasticity math finite
    eye = np.eye(cfg.dim, dtype=np.float32)
    arrays["F"][~active] = eye
    p_new = Particles(active=jnp.asarray(active), **{k: jnp.asarray(v) for k, v in arrays.items()})
    spec = P(axis)
    put = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    )
    return jax.tree.map(put, p_new)
