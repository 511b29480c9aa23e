"""Multi-chip spatial decomposition over the BLOCKED performance path.

`parallel/spatial.py` decomposes the domain with the portable XLA
transfers; this module runs the Pallas/record machinery per shard:

  * each shard simulates its x-slab in a LOCAL block-id frame shifted
    by one ghost block (local cell x = global x - s*Wc + 4), with a
    local SimConfig of res_x = Wc + 8. Particle POSITIONS stay global
    in the carry; only the sort keys, page map and block origins live
    in the local frame (prep takes explicit per-particle origins, so
    the kernels never see a coordinate conversion);
  * after the record merge, the two overlapping block columns at each
    slab boundary are summed with ONE symmetric ppermute exchange per
    direction (both copies end up with identical complete sums, so the
    nonlinear grid update may run redundantly and windows need no
    second exchange — same invariant as spatial.halo_allreduce);
  * the sort is LAZY (drift-triggered), exactly like the single-chip
    frame (ops.substep.blocked_frame): the re-sort predicate is the
    pmax of per-shard drift so every shard takes the same branch, and
    cross-boundary particle migration happens at re-sort time (drift
    < 0.5 cells + the one-block ghost region keeps not-yet-migrated
    particles exact in the meantime — their halo tiles land in the
    exchanged boundary columns);
  * migration is budgeted; the frame returns the pmax budget demand so
    the driver can re-jit with a larger budget and re-run instead of
    dropping particles (`run_spatial_blocked_frames`) — the overflow
    discipline the page map already uses (MPM.step), VERDICT r1 #7.

Remaining (documented) gap: 1-D slab mesh only.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.core.transfer import g2p_finish
from taichi_mpm_tpu.ops import blocked
from taichi_mpm_tpu.ops.blocked import sort_particles_by_keys
from taichi_mpm_tpu.ops.g2p_pallas import g2p_blocked
from taichi_mpm_tpu.ops.p2g_pallas import CHUNK, p2g_blocked
from taichi_mpm_tpu.ops.substep import (
    _round_up,
    build_page_map_full,
    grid_update_flat,
    prep_p2g,
)
from taichi_mpm_tpu.parallel.spatial import migrate

GHOST_CELLS = 4  # one ghost block each side of a slab


def slab_cells(cfg: SimConfig, n_shards: int) -> int:
    assert cfg.res[0] % (4 * n_shards) == 0, (
        f"res[0]={cfg.res[0]} must divide by 4*n_shards={4 * n_shards}"
    )
    return cfg.res[0] // n_shards


def local_config(cfg: SimConfig, n_shards: int) -> SimConfig:
    """Per-shard config: the slab plus one ghost block on each side."""
    Wc = slab_cells(cfg, n_shards)
    return dataclasses.replace(
        cfg, res=(Wc + 2 * GHOST_CELLS,) + cfg.res[1:], dx=cfg.dx
    )


def shard_offset_cells(s, cfg: SimConfig, n_shards: int):
    """Global cell coordinate of local cell 0 (traced, per shard)."""
    Wc = slab_cells(cfg, n_shards)
    return (s * Wc - GHOST_CELLS).astype(jnp.float32)


def _local_keys(p: Particles, s, cfg: SimConfig, lcfg: SimConfig, n_shards: int):
    """LOCAL-frame block ids from global positions."""
    off = shard_offset_cells(s, cfg, n_shards) * cfg.dx
    x_loc = p.x - jnp.stack(
        [off, jnp.zeros_like(off), jnp.zeros_like(off)], -1
    )
    total = blocked.total_blocks_padded(lcfg)
    return jnp.where(p.active, blocked.block_id_of(x_loc, lcfg), total)


def _boundary_planes(rec, pm, lcfg: SimConfig, cols):
    """Gather the records of the given local block columns into a dense
    (len(cols), nbyp, nbzp, 256) plane (zeros where inactive)."""
    nbp = blocked.num_blocks_padded(lcfg)
    K = pm["ids"].shape[0]
    by = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
    bz = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
    planes = []
    for col in cols:
        bid = (col * nbp[1] + by) * nbp[2] + bz
        slot = pm["slot_map"][bid]
        ok = slot < K
        vals = jnp.where(
            ok[..., None],
            rec[jnp.minimum(slot, K - 1)],
            0.0,
        )
        planes.append(vals)
    return jnp.stack(planes, 0)


def _add_planes(rec, pm, lcfg: SimConfig, cols, planes):
    """Scatter-add incoming boundary planes into the local records."""
    nbp = blocked.num_blocks_padded(lcfg)
    K = pm["ids"].shape[0]
    by = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
    bz = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
    for i, col in enumerate(cols):
        bid = (col * nbp[1] + by) * nbp[2] + bz
        slot = pm["slot_map"][bid]
        ok = (slot < K)[..., None]
        rec = rec.at[jnp.minimum(slot, K - 1).reshape(-1)].add(
            jnp.where(ok, planes[i], 0.0).reshape(-1, rec.shape[-1])
        )
    return rec


def exchange_boundary_records(rec, pm, lcfg: SimConfig, axis: str, n_shards: int, Wb: int):
    """Symmetric sum of the two overlapping block columns per boundary.

    Local col L maps to global col s*Wb - 1 + L: my high cols
    {Wb, Wb+1} overlap the right neighbor's low cols {0, 1}."""
    lo_cols = (0, 1)
    hi_cols = (Wb, Wb + 1)
    lo_planes = _boundary_planes(rec, pm, lcfg, lo_cols)
    hi_planes = _boundary_planes(rec, pm, lcfg, hi_cols)
    right = [(i, i + 1) for i in range(n_shards - 1)]
    left = [(i + 1, i) for i in range(n_shards - 1)]
    from_left = jax.lax.ppermute(hi_planes, axis, right)   # their hi -> my lo
    from_right = jax.lax.ppermute(lo_planes, axis, left)   # their lo -> my hi
    rec = _add_planes(rec, pm, lcfg, lo_cols, from_left)
    rec = _add_planes(rec, pm, lcfg, hi_cols, from_right)
    return rec


def zero_domain_edge_ghosts(rec, pm, lcfg: SimConfig, s, n_shards: int):
    """Shard 0's low / shard S-1's high ghost column is outside the
    global domain (the single-chip path has no owner for those nodes
    and drops them) — zero it so multi-chip matches exactly."""
    nbp = blocked.num_blocks_padded(lcfg)
    K = pm["ids"].shape[0]
    by = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
    bz = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
    bid0 = (0 * nbp[1] + by) * nbp[2] + bz
    slot0 = pm["slot_map"][bid0]
    ok0 = ((slot0 < K) & (s == 0))[..., None]
    rec = rec.at[jnp.minimum(slot0, K - 1).reshape(-1)].multiply(
        jnp.where(ok0, 0.0, 1.0).reshape(-1, 1)
    )
    return rec


def shifted_colliders(colliders, xoff):
    """Colliders evaluated at x + xoff (grid ops run in local coords)."""
    return tuple(
        dataclasses.replace(
            c,
            sdf=(lambda c_: lambda x, tt: c_.sdf(
                x + jnp.asarray([xoff, 0.0, 0.0], x.dtype), tt))(c),
            normal_fn=(lambda c_: (
                (lambda x, tt: c_.normal_fn(
                    x + jnp.asarray([xoff, 0.0, 0.0], x.dtype), tt))
                if c_.normal_fn is not None else None))(c),
            velocity=(lambda c_: (
                (lambda x, tt: c_.velocity(
                    x + jnp.asarray([xoff, 0.0, 0.0], x.dtype), tt))
                if c_.velocity is not None else None))(c),
        )
        for c in colliders
    )


def spatial_blocked_substep_presorted(
    p: Particles, keys, pm, t, cfg: SimConfig, lcfg: SimConfig, colliders,
    dt, axis: str, s, n_shards: int, interpret: bool = False,
    off_cells=None, wcols=None,
):
    """One substep against a frozen local sort/page map. Positions are
    GLOBAL; pm['origin'] is local, so prep gets origin + shard offset
    (block-local coordinates are then identical to single-chip).

    off_cells / wcols override the uniform-slab offset and owned width
    (in block columns) — the load-balanced path passes traced values
    derived from its dynamic boundaries."""
    K = pm["ids"].shape[0]
    Wb = slab_cells(cfg, n_shards) // 4 if wcols is None else wcols
    n = p.capacity
    pw = _round_up(n, CHUNK)
    if off_cells is None:
        off_cells = shard_offset_cells(s, cfg, n_shards)
    origin_g = pm["origin"] + jnp.stack(
        [off_cells, jnp.zeros_like(off_cells), jnp.zeros_like(off_cells)], -1
    )

    pdata = prep_p2g(p, keys, cfg, dt, origin=origin_g)
    tiles = p2g_blocked(pm["s_arr"], pm["e_arr"], pdata, interpret=interpret)
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
    rec = exchange_boundary_records(rec, pm, lcfg, axis, n_shards, Wb)
    rec = zero_domain_edge_ghosts(rec, pm, lcfg, s, n_shards)

    xoff = off_cells * cfg.dx
    vrec = grid_update_flat(
        rec, pm["ids"], lcfg, shifted_colliders(colliders, xoff), t, dt
    )
    gtiles = blocked.windows_mm(vrec, pm["nbr"])

    keys2d = jnp.pad(
        pm["slot_keys"][None, :], ((0, 0), (0, pw - n)), constant_values=K
    )
    posg = jnp.pad(pdata[13:16, :pw], ((0, 5), (0, 0)))
    pout = g2p_blocked(keys2d, posg, gtiles, jnp.asarray([K], jnp.int32),
                       interpret=interpret)
    pout = pout[:, :n].T
    v_new = jnp.where(p.active[:, None], pout[:, 0:3], 0.0)
    b_new = jnp.where(p.active[:, None, None], pout[:, 3:12].reshape(n, 3, 3), 0.0)
    p = g2p_finish(p, v_new, b_new, cfg, dt)  # GLOBAL clamp
    vmax = jnp.max(jnp.where(p.active[:, None], jnp.abs(p.v), 0.0))
    return p, t + dt, vmax, pm["n_act"]


def build_spatial_blocked_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget: int = 256,
    interpret: bool = False,
):
    """Jitted shard_map frame over a 1-D mesh using the blocked pipeline
    with lazy re-sort + migration-at-resort.

    Returns fn(p, t) -> (p, t, needed, n_act): `needed` is the pmax
    migration-budget demand (re-jit with budget >= needed and re-run if
    it exceeded `budget` — run_spatial_blocked_frames does this)."""
    n_shards = mesh.shape[axis]
    lcfg = local_config(cfg, n_shards)

    def local_frame(p: Particles, t):
        s = jax.lax.axis_index(axis)

        def resort(p):
            p, needed = migrate(p, s, axis, cfg, n_shards, budget,
                                count_only_overflow=False)
            keys = _local_keys(p, s, cfg, lcfg, n_shards)
            p, keys, _ = sort_particles_by_keys(p, keys)
            return p, keys, build_page_map_full(keys, lcfg, K), needed

        p, keys, pm, needed0 = resort(p)

        def body(carry, _):
            p, keys, pm, drift, t, need_max, na = carry
            p, t, vmax, n_act = spatial_blocked_substep_presorted(
                p, keys, pm, t, cfg, lcfg, colliders, cfg.base_dt, axis, s,
                n_shards, interpret=interpret,
            )
            drift = drift + cfg.base_dt * cfg.inv_dx * vmax
            # uniform predicate across shards: collective max
            need = jax.lax.pmax(drift, axis) >= 0.45

            def do_resort(p):
                p = jax.lax.optimization_barrier(p)
                return resort(p)

            def keep(p):
                return p, keys, pm, jnp.int32(0)

            p, keys, pm, needed = jax.lax.cond(need, do_resort, keep, p)
            drift = jnp.where(need, 0.0, drift)
            return (p, keys, pm, drift, t, jnp.maximum(need_max, needed),
                    jnp.maximum(na, n_act)), None

        carry = (p, keys, pm, jnp.float32(0.0), t, needed0, pm["n_act"])
        (p, keys, pm, _, t, need_max, n_act), _ = jax.lax.scan(
            body, carry, None, length=n_substeps
        )
        return (
            p, t, jax.lax.pmax(need_max, axis), jax.lax.pmax(n_act, axis)
        )

    pspec = P(axis)
    p_specs = jax.tree.map(
        lambda _: pspec,
        Particles(
            x=0, v=0, F=0, C=0, aux=0, mass=0, vol=0, mat=0, params=0,
            active=0, states=0, bdist=0, bnormal=0, near_b=0,
        ),
    )
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, P()),
        out_specs=(p_specs, P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def build_spatial_cpic_frame(
    cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget: int = 256,
    near_budget: int = 4096, b1: int = 0, Kr: int = 0,
    interpret: bool = False,
):
    """Jitted shard_map CPIC frame: the coupled (colored) transfers on
    the blocked pipeline per shard (VERDICT r1 #2). Rigid bodies are
    REPLICATED; per-shard impulse partial sums combine with psum inside
    the substep (the reference's apply_tmp_impulse pattern,
    transfer.cpp:195-197,578-580); the CDF rasterizes the replicated
    boundary-particle set into each shard's local grid window; the
    re-sort is lazy with a pmax-shared predicate and migration at
    re-sort time.

    Returns fn(p, bodies, t) -> (p, bodies, t, needed, n_act, n_near,
    n_coarse) — the driver grows budget / K / near budgets and re-runs
    the frame on overflow."""
    from taichi_mpm_tpu.rigid.cpic_blocked import (
        cpic_blocked_substep_presorted,
    )

    n_shards = mesh.shape[axis]
    lcfg = local_config(cfg, n_shards)
    Wb = slab_cells(cfg, n_shards) // 4

    def local_frame(p: Particles, bodies, t):
        s = jax.lax.axis_index(axis)
        off_cells = shard_offset_cells(s, cfg, n_shards)
        xoff = off_cells * cfg.dx
        world_off = jnp.stack(
            [xoff, jnp.zeros_like(xoff), jnp.zeros_like(xoff)]
        )
        gcolls = shifted_colliders(scene.colliders, xoff)

        # exchange() needs the substep's CURRENT page map; it is threaded
        # through a one-slot cell written at the top of each (traced-once)
        # scan body before the substep runs.
        pm_cell = [None]

        def exchange(rec):
            rec = exchange_boundary_records(rec, pm_cell[0], lcfg, axis,
                                            n_shards, Wb)
            return zero_domain_edge_ghosts(rec, pm_cell[0], lcfg, s, n_shards)

        def resort(p):
            p, needed = migrate(p, s, axis, cfg, n_shards, budget,
                                count_only_overflow=False)
            keys = _local_keys(p, s, cfg, lcfg, n_shards)
            p, keys, _ = sort_particles_by_keys(p, keys)
            return p, keys, build_page_map_full(keys, lcfg, K), needed

        p, keys, pm, needed0 = resort(p)

        def body(carry, _):
            p, keys, pm, bodies, drift, t, need_max, na, nn, nc, nr = carry
            pm_cell[0] = pm
            origin_g = pm["origin"] + jnp.stack(
                [off_cells, jnp.zeros_like(off_cells),
                 jnp.zeros_like(off_cells)], -1
            )
            (p, bodies, t), n_near, n_coarse, n_r, vmax, _ = (
                cpic_blocked_substep_presorted(
                    p, keys, pm, bodies, t, cfg, scene, cfg.base_dt,
                    near_budget, b1, Kr, interpret=interpret, lcfg=lcfg,
                    world_off=world_off, axis=axis, origin=origin_g,
                    grid_colliders=gcolls, exchange_fn=exchange,
                )
            )
            drift = drift + cfg.base_dt * cfg.inv_dx * vmax
            need = jax.lax.pmax(drift, axis) >= 0.45

            def do_resort(p):
                return resort(jax.lax.optimization_barrier(p))

            def keep(p):
                return p, keys, pm, jnp.int32(0)

            p, keys, pm, needed = jax.lax.cond(need, do_resort, keep, p)
            drift = jnp.where(need, 0.0, drift)
            return (p, keys, pm, bodies, drift, t,
                    jnp.maximum(need_max, needed),
                    jnp.maximum(na, pm["n_act"]),
                    jnp.maximum(nn, n_near), jnp.maximum(nc, n_coarse),
                    jnp.maximum(nr, n_r)), None

        carry = (p, keys, pm, bodies, jnp.float32(0.0), t, needed0,
                 pm["n_act"], jnp.int32(0), jnp.int32(0), jnp.int32(0))
        (p, keys, pm, bodies, _, t, need_max, na, nn, nc, nr), _ = (
            jax.lax.scan(body, carry, None, length=n_substeps)
        )
        return (
            p, bodies, t,
            jax.lax.pmax(need_max, axis), jax.lax.pmax(na, axis),
            jax.lax.pmax(nn, axis), jax.lax.pmax(nc, axis),
            jax.lax.pmax(nr, axis),
        )

    pspec = P(axis)
    p_specs = jax.tree.map(
        lambda _: pspec,
        Particles(
            x=0, v=0, F=0, C=0, aux=0, mass=0, vol=0, mat=0, params=0,
            active=0, states=0, bdist=0, bnormal=0, near_b=0,
        ),
    )
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, P(), P()),  # bodies replicated (prefix spec)
        out_specs=(p_specs, P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def build_spatial_cpic_packed_frame(
    cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget: int = 256,
    near_budget: int = 4096, b1: int = 0, Kr: int = 0,
    interpret: bool = False,
):
    """The multichip CPIC frame over the PACKED carry: per-shard fused
    bulk transfers (rigid/cpic_packed) with the same record-plane
    exchange, replicated-rigid psum coupling, lazy sort and
    migration-at-resort as build_spatial_cpic_frame. Same signature
    and return tuple; equal to single-chip CPIC (differential-tested).

    The resort converts packed->pytree->packed around the battle-tested
    migrate() (rare, drift-triggered); keys/page map live in the local
    block frame while positions and the RORG origin rows stay global
    (origin = local block origin + shard offset, so the kernels see
    single-chip coordinates)."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.rigid.cpic_packed import (
        cpic_packed_substep_presorted,
    )

    n_shards = mesh.shape[axis]
    lcfg = local_config(cfg, n_shards)
    Wb = slab_cells(cfg, n_shards) // 4
    total_l = blocked.total_blocks_padded(lcfg)

    def local_frame(p: Particles, bodies, t):
        s = jax.lax.axis_index(axis)
        off_cells = shard_offset_cells(s, cfg, n_shards)
        xoff = off_cells * cfg.dx
        world_off = jnp.stack(
            [xoff, jnp.zeros_like(xoff), jnp.zeros_like(xoff)]
        )
        gcolls = shifted_colliders(scene.colliders, xoff)
        cap = p.x.shape[0]

        pm_cell = [None]

        def exchange(rec):
            rec = exchange_boundary_records(rec, pm_cell[0], lcfg, axis,
                                            n_shards, Wb)
            return zero_domain_edge_ghosts(rec, pm_cell[0], lcfg, s, n_shards)

        def resort_fn(st, extra):
            bodies, need_max, na, nn, nc, nr = extra
            p2 = packed.unpack_particles(st, cap)
            p2, needed = migrate(p2, s, axis, cfg, n_shards, budget,
                                 count_only_overflow=False)
            keys = _local_keys(p2, s, cfg, lcfg, n_shards)
            p2, keys, _ = sort_particles_by_keys(p2, keys)
            st, keys_pw, pm = _pack_with_origins(p2, keys, off_cells,
                                                 lcfg, K)
            extra = (bodies, jnp.maximum(need_max, needed),
                     jnp.maximum(na, pm["n_act"]), nn, nc, nr)
            return st, keys_pw, pm, extra

        def substep_fn(st, keys, pm, extra, t):
            bodies, need_max, na, nn, nc, nr = extra
            pm_cell[0] = pm
            (st, bodies, t), n_near, n_coarse, n_r, vmax, _ = (
                cpic_packed_substep_presorted(
                    st, keys, pm, bodies, t, cfg, scene, cfg.base_dt,
                    near_budget, b1, Kr, interpret=interpret, lcfg=lcfg,
                    world_off=world_off, axis=axis, grid_colliders=gcolls,
                    exchange_fn=exchange,
                )
            )
            extra = (bodies, need_max, na, jnp.maximum(nn, n_near),
                     jnp.maximum(nc, n_coarse), jnp.maximum(nr, n_r))
            dinc = cfg.base_dt * cfg.inv_dx * jax.lax.pmax(vmax, axis)
            return st, extra, t, dinc

        z = jnp.int32(0)
        st, keys, pm, extra = resort_fn(
            packed.pack_particles(p), (bodies, z, z, z, z, z)
        )
        st, keys, pm, extra, t = _two_level_loop(
            st, keys, pm, extra, t, n_substeps, substep_fn, resort_fn
        )
        bodies, need_max, na, nn, nc, nr = extra
        return (
            packed.unpack_particles(st, cap), bodies, t,
            jax.lax.pmax(need_max, axis), jax.lax.pmax(na, axis),
            jax.lax.pmax(nn, axis), jax.lax.pmax(nc, axis),
            jax.lax.pmax(nr, axis),
        )

    pspec = P(axis)
    p_specs = jax.tree.map(
        lambda _: pspec,
        Particles(
            x=0, v=0, F=0, C=0, aux=0, mass=0, vol=0, mat=0, params=0,
            active=0, states=0, bdist=0, bnormal=0, near_b=0,
        ),
    )
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, P(), P()),  # bodies replicated
        out_specs=(p_specs, P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Load-balanced slabs: dynamic boundaries in block-column units
# ---------------------------------------------------------------------------
#
# The reference's TBB scheduler load-balances blocks across threads by
# work stealing (mpm.cpp:919-1014 block dispatch); at chip level the
# TPU-native analog is moving the slab BOUNDARIES so each shard owns a
# roughly equal particle count, while every shard keeps a static-shape
# local window wide enough for any allowed boundary position:
#
#   * bounds (S+1,) int32, replicated: shard s owns global block
#     columns [bounds[s], bounds[s+1]). bounds[0]=0, bounds[S]=CB fixed;
#     interior boundaries stay within +-r columns of the uniform split
#     (r sized so neighbor ranges cannot collide) and move at most DMAX
#     columns per rebalance, which keeps migration one-hop (a particle
#     can only change owner when ONE boundary sweeps past it);
#   * rebalancing happens at the lazy re-sorts, from a psum'd global
#     per-column particle histogram built off the page map (K-scaled,
#     never P-scaled) at the PREVIOUS re-sort — one resort of lag, which
#     a balancing heuristic tolerates by construction;
#   * everything downstream is the uniform-slab machinery with traced
#     offset/width (the record exchange's overlap columns are the same
#     two global columns on both sides of each boundary by definition).

MINW = 2  # min owned block columns per shard
DMAX = 2  # max boundary move per rebalance; <= MINW keeps migration 1-hop


def balanced_params(cfg: SimConfig, n_shards: int, r: int):
    """(CB, uniform bounds, static local config) for max-shift r."""
    assert cfg.res[0] % 4 == 0
    CB = cfg.res[0] // 4
    u = np.round(np.linspace(0.0, CB, n_shards + 1)).astype(np.int32)
    gaps = u[1:] - u[:-1]
    r_max = (int(gaps.min()) - MINW) // 2
    assert 0 < r <= r_max, (
        f"balance radius r={r} must be in [1, {r_max}] for "
        f"res[0]={cfg.res[0]}, n_shards={n_shards}"
    )
    maxw = int(gaps.max()) + 2 * r
    lcfg = dataclasses.replace(cfg, res=((maxw + 2) * 4,) + cfg.res[1:])
    return CB, u, lcfg


def rebalance_bounds(hist, bounds, uniform, r: int, n_shards: int):
    """New boundaries from the global column histogram: ideal equal-
    count splits, clamped to +-DMAX per step and +-r of uniform."""
    c = jnp.cumsum(hist.astype(jnp.float32))
    total = c[-1]
    q = jnp.arange(1, n_shards, dtype=jnp.float32) * total / n_shards
    ideal = jnp.searchsorted(c, q, side="left").astype(jnp.int32) + 1
    old = bounds[1:-1]
    new = jnp.clip(ideal, old - DMAX, old + DMAX)
    new = jnp.clip(new, uniform[1:-1] - r, uniform[1:-1] + r)
    new = jnp.where(total > 0, new, old)
    return jnp.concatenate([bounds[:1], new, bounds[-1:]])


def col_hist_from_pm(pm, b0, lcfg: SimConfig, CB: int, axis: str):
    """Global per-block-column particle counts from the page map
    (K-scaled: per-slot counts scattered onto CB columns, then psum)."""
    nbp = blocked.num_blocks_padded(lcfg)
    per = nbp[1] * nbp[2]
    counts = (pm["e_arr"] - pm["s_arr"]).astype(jnp.int32)
    gcol = pm["ids"] // per - 1 + b0
    hist = jnp.zeros((CB,), jnp.int32).at[jnp.clip(gcol, 0, CB - 1)].add(
        counts
    )
    return jax.lax.psum(hist, axis)


def _dest_from_bounds(p: Particles, bounds, cfg: SimConfig, n_shards: int):
    cx = jnp.clip(
        jnp.floor(p.x[:, 0] * cfg.inv_dx).astype(jnp.int32),
        0, cfg.res[0] - 1,
    )
    return jnp.clip(
        jnp.searchsorted(bounds, cx // 4, side="right").astype(jnp.int32) - 1,
        0, n_shards - 1,
    )


def balanced_bounds_host(p: Particles, cfg: SimConfig, n_shards: int, r: int):
    """Host-side initial boundaries: the same equal-count split the
    device rebalance computes, without the DMAX rate limit."""
    CB, u, _ = balanced_params(cfg, n_shards, r)
    x = np.asarray(p.x)
    act = np.asarray(p.active)
    col = np.clip((x[act, 0] / cfg.dx).astype(np.int64), 0, cfg.res[0] - 1) // 4
    hist = np.bincount(col, minlength=CB).astype(np.float64)
    c = np.cumsum(hist)
    q = np.arange(1, n_shards) * c[-1] / n_shards
    ideal = np.searchsorted(c, q, side="left").astype(np.int32) + 1
    new = np.clip(ideal, u[1:-1] - r, u[1:-1] + r)
    if c[-1] <= 0:
        new = u[1:-1]
    return np.concatenate([u[:1], new, u[-1:]]).astype(np.int32)


def shard_spatially_bounds(p: Particles, cfg: SimConfig, mesh: Mesh,
                           bounds, axis: str = "x", slack: float = 1.0):
    """shard_spatially for explicit block-column boundaries."""
    n_shards = mesh.shape[axis]
    bounds = np.asarray(bounds, np.int64)
    x = np.asarray(p.x)
    act = np.asarray(p.active)
    col = np.clip((x[:, 0] / cfg.dx).astype(np.int64), 0, cfg.res[0] - 1) // 4
    slab = np.clip(np.searchsorted(bounds, col, side="right") - 1, 0,
                   n_shards - 1)
    counts = np.bincount(slab[act], minlength=n_shards)
    C_local = max(int(np.ceil(counts.max() * slack)), 8)

    def reorganize(a):
        a = np.asarray(a)
        out = np.zeros((n_shards * C_local,) + a.shape[1:], a.dtype)
        for sh in range(n_shards):
            sel = act & (slab == sh)
            out[sh * C_local : sh * C_local + sel.sum()] = a[sel]
        return out

    arrays = {
        f.name: reorganize(getattr(p, f.name))
        for f in dataclasses.fields(p) if f.name != "active"
    }
    active = np.zeros(n_shards * C_local, bool)
    for sh in range(n_shards):
        active[sh * C_local : sh * C_local + int(counts[sh])] = True
    arrays["F"][~active] = np.eye(cfg.dim, dtype=np.float32)
    p_new = Particles(active=jnp.asarray(active),
                      **{k: jnp.asarray(v) for k, v in arrays.items()})
    put = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    )
    return jax.tree.map(put, p_new)


def build_spatial_balanced_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget: int = 256, r: int = 1,
    interpret: bool = False,
):
    """The blocked-pipeline frame over LOAD-BALANCED slabs.

    fn(p, t, bounds, hist) -> (p, t, bounds, hist, needed, n_act):
    bounds/hist are replicated and thread frame-to-frame (the histogram
    feeds the NEXT rebalance); rebalancing runs at the frame-start
    resort and at every drift-triggered mid-frame resort."""
    n_shards = mesh.shape[axis]
    CB, uniform_np, lcfg = balanced_params(cfg, n_shards, r)
    uniform = jnp.asarray(uniform_np, jnp.int32)

    def local_frame(p: Particles, t, bounds, hist):
        s = jax.lax.axis_index(axis)

        def resort(p, bounds, hist):
            bounds = rebalance_bounds(hist, bounds, uniform, r, n_shards)
            dest = _dest_from_bounds(p, bounds, cfg, n_shards)
            p, needed = migrate(p, s, axis, cfg, n_shards, budget,
                                count_only_overflow=False, dest=dest)
            off_cells = ((bounds[s] - 1) * 4).astype(jnp.float32)
            off = off_cells * cfg.dx
            x_loc = p.x - jnp.stack(
                [off, jnp.zeros_like(off), jnp.zeros_like(off)], -1
            )
            total = blocked.total_blocks_padded(lcfg)
            keys = jnp.where(
                p.active, blocked.block_id_of(x_loc, lcfg), total
            )
            p, keys, _ = sort_particles_by_keys(p, keys)
            pm = build_page_map_full(keys, lcfg, K)
            hist = col_hist_from_pm(pm, bounds[s], lcfg, CB, axis)
            return p, keys, pm, bounds, hist, needed

        p, keys, pm, bounds, hist, needed0 = resort(p, bounds, hist)

        def body(carry, _):
            p, keys, pm, bounds, hist, drift, t, need_max, na = carry
            off_cells = ((bounds[s] - 1) * 4).astype(jnp.float32)
            wcols = bounds[s + 1] - bounds[s]
            p, t, vmax, n_act = spatial_blocked_substep_presorted(
                p, keys, pm, t, cfg, lcfg, colliders, cfg.base_dt, axis, s,
                n_shards, interpret=interpret, off_cells=off_cells,
                wcols=wcols,
            )
            drift = drift + cfg.base_dt * cfg.inv_dx * vmax
            need = jax.lax.pmax(drift, axis) >= 0.45

            def do_resort(args):
                p, bounds, hist = args
                return resort(jax.lax.optimization_barrier(p), bounds, hist)

            def keep(args):
                p, _, _ = args
                return p, keys, pm, bounds, hist, jnp.int32(0)

            p, keys2, pm2, bounds, hist, needed = jax.lax.cond(
                need, do_resort, keep, (p, bounds, hist)
            )
            drift = jnp.where(need, 0.0, drift)
            return (p, keys2, pm2, bounds, hist, drift, t,
                    jnp.maximum(need_max, needed),
                    jnp.maximum(na, n_act)), None

        carry = (p, keys, pm, bounds, hist, jnp.float32(0.0), t, needed0,
                 pm["n_act"])
        (p, keys, pm, bounds, hist, _, t, need_max, n_act), _ = jax.lax.scan(
            body, carry, None, length=n_substeps
        )
        return (
            p, t, bounds, hist,
            jax.lax.pmax(need_max, axis), jax.lax.pmax(n_act, axis),
        )

    pspec = P(axis)
    p_specs = jax.tree.map(
        lambda _: pspec,
        Particles(
            x=0, v=0, F=0, C=0, aux=0, mass=0, vol=0, mat=0, params=0,
            active=0, states=0, bdist=0, bnormal=0, near_b=0,
        ),
    )
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, P(), P(), P()),
        out_specs=(p_specs, P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def run_spatial_balanced_frames(
    p, t, cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    n_frames: int = 1, axis: str = "x", K: int = 1024, budget: int = 256,
    r: int = 1, bounds=None, hist=None, interpret: bool = False,
):
    """Load-balanced frame driver with the same overflow auto-grow
    discipline as run_spatial_blocked_frames. Returns (p, t, state) —
    pass state's bounds/hist back in to continue."""
    n_shards = mesh.shape[axis]
    CB, _, _ = balanced_params(cfg, n_shards, r)
    if bounds is None:
        bounds = jnp.asarray(
            balanced_bounds_host(
                jax.tree.map(np.asarray, p), cfg, n_shards, r
            ), jnp.int32,
        )
    if hist is None:
        hist = jnp.zeros((CB,), jnp.int32)
    frame = build_spatial_balanced_frame(
        cfg, colliders, n_substeps, mesh, axis, K, budget, r, interpret
    )
    local_cap = p.x.shape[0] // n_shards
    for _ in range(n_frames):
        while True:
            p2, t2, bounds2, hist2, needed, n_act = frame(p, t, bounds, hist)
            needed, n_act = int(needed), int(n_act)
            grow_budget = needed > budget
            grow_K = n_act > K
            if not (grow_budget or grow_K):
                p, t, bounds, hist = p2, t2, bounds2, hist2
                break
            if needed >= local_cap:
                raise RuntimeError(
                    f"shard capacity exhausted ({needed} arrivals vs "
                    f"{local_cap} local slots); reshard with more slack"
                )
            if grow_budget:
                budget = -(-2 * needed // 64) * 64
            if grow_K:
                K = -(-2 * n_act // 64) * 64
            frame = build_spatial_balanced_frame(
                cfg, colliders, n_substeps, mesh, axis, K, budget, r,
                interpret,
            )
    return p, t, dict(K=K, budget=budget, bounds=bounds, hist=hist)


def run_spatial_blocked_frames(
    p, t, cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    n_frames: int = 1, axis: str = "x", K: int = 1024, budget: int = 256,
    interpret: bool = False,
):
    """Frame driver with migration-budget AND page-map overflow
    auto-grow: on overflow, re-jit with a doubled capacity and re-run
    the frame from the intact pre-frame state — zero particles lost
    (the reference never loses particles to threading, mpm.cpp:770-918;
    VERDICT r1 #7)."""
    frame = build_spatial_blocked_frame(
        cfg, colliders, n_substeps, mesh, axis, K, budget, interpret
    )
    n_shards = mesh.shape[axis]
    local_cap = p.x.shape[0] // n_shards
    for _ in range(n_frames):
        while True:
            p2, t2, needed, n_act = frame(p, t)
            needed, n_act = int(needed), int(n_act)
            grow_budget = needed > budget
            grow_K = n_act > K
            if not (grow_budget or grow_K):
                p, t = p2, t2
                break
            if needed >= local_cap:
                raise RuntimeError(
                    f"shard capacity exhausted ({needed} arrivals vs "
                    f"{local_cap} local slots); reshard with more slack"
                )
            if grow_budget:
                budget = -(-2 * needed // 64) * 64
            if grow_K:
                K = -(-2 * n_act // 64) * 64
            frame = build_spatial_blocked_frame(
                cfg, colliders, n_substeps, mesh, axis, K, budget, interpret
            )
    return p, t, dict(K=K, budget=budget)


def build_spatial_cpic_packed_balanced_frame(
    cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget: int = 256,
    near_budget: int = 4096, b1: int = 0, Kr: int = 0, r: int = 1,
    interpret: bool = False,
):
    """The PACKED-carry multichip CPIC frame over LOAD-BALANCED slabs:
    build_spatial_cpic_packed_frame with dynamic block-column bounds
    rebalanced at the lazy re-sorts (build_spatial_balanced_frame's
    machinery) — the flagship coupled scenes get the work-stealing
    analog too (mpm.cpp:919-1014).

    fn(p, bodies, t, bounds, hist) -> (p, bodies, t, bounds, hist,
    needed, n_act, n_near, n_coarse, n_r); bounds/hist thread
    frame-to-frame, the driver grows budgets and re-runs on overflow
    (run_spatial_cpic_packed_balanced_frames)."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.rigid.cpic_packed import (
        cpic_packed_substep_presorted,
    )

    n_shards = mesh.shape[axis]
    CB, uniform_np, lcfg = balanced_params(cfg, n_shards, r)
    uniform = jnp.asarray(uniform_np, jnp.int32)
    total_l = blocked.total_blocks_padded(lcfg)

    def local_frame(p: Particles, bodies, t, bounds, hist):
        s = jax.lax.axis_index(axis)
        cap = p.x.shape[0]

        # exchange() needs the substep's CURRENT page map and owned
        # width; threaded through a one-slot cell written at the top of
        # each (traced-once) scan body before the substep runs.
        pm_cell = [None, None]  # [pm, Wb]

        def exchange(rec):
            rec = exchange_boundary_records(rec, pm_cell[0], lcfg, axis,
                                            n_shards, pm_cell[1])
            return zero_domain_edge_ghosts(rec, pm_cell[0], lcfg, s, n_shards)

        def resort_fn(st, extra):
            bounds, hist, bodies, need_max, na, nn, nc, nr = extra
            bounds = rebalance_bounds(hist, bounds, uniform, r, n_shards)
            p2 = packed.unpack_particles(st, cap)
            dest = _dest_from_bounds(p2, bounds, cfg, n_shards)
            p2, needed = migrate(p2, s, axis, cfg, n_shards, budget,
                                 count_only_overflow=False, dest=dest)
            off_cells = ((bounds[s] - 1) * 4).astype(jnp.float32)
            off = off_cells * cfg.dx
            x_loc = p2.x - jnp.stack(
                [off, jnp.zeros_like(off), jnp.zeros_like(off)], -1
            )
            keys = jnp.where(
                p2.active, blocked.block_id_of(x_loc, lcfg), total_l
            )
            p2, keys, _ = sort_particles_by_keys(p2, keys)
            st, keys_pw, pm = _pack_with_origins(p2, keys, off_cells,
                                                 lcfg, K)
            hist = col_hist_from_pm(pm, bounds[s], lcfg, CB, axis)
            extra = (bounds, hist, bodies, jnp.maximum(need_max, needed),
                     jnp.maximum(na, pm["n_act"]), nn, nc, nr)
            return st, keys_pw, pm, extra

        def substep_fn(st, keys, pm, extra, t):
            bounds, hist, bodies, need_max, na, nn, nc, nr = extra
            off_cells = ((bounds[s] - 1) * 4).astype(jnp.float32)
            xoff = off_cells * cfg.dx
            world_off = jnp.stack(
                [xoff, jnp.zeros_like(xoff), jnp.zeros_like(xoff)]
            )
            gcolls = shifted_colliders(scene.colliders, xoff)
            pm_cell[0] = pm
            pm_cell[1] = bounds[s + 1] - bounds[s]
            (st, bodies, t), n_near, n_coarse, n_r, vmax, _ = (
                cpic_packed_substep_presorted(
                    st, keys, pm, bodies, t, cfg, scene, cfg.base_dt,
                    near_budget, b1, Kr, interpret=interpret, lcfg=lcfg,
                    world_off=world_off, axis=axis, grid_colliders=gcolls,
                    exchange_fn=exchange,
                )
            )
            extra = (bounds, hist, bodies, need_max, na,
                     jnp.maximum(nn, n_near), jnp.maximum(nc, n_coarse),
                     jnp.maximum(nr, n_r))
            dinc = cfg.base_dt * cfg.inv_dx * jax.lax.pmax(vmax, axis)
            return st, extra, t, dinc

        z = jnp.int32(0)
        st, keys, pm, extra = resort_fn(
            packed.pack_particles(p),
            (bounds, hist, bodies, z, z, z, z, z),
        )
        st, keys, pm, extra, t = _two_level_loop(
            st, keys, pm, extra, t, n_substeps, substep_fn, resort_fn
        )
        bounds, hist, bodies, need_max, na, nn, nc, nr = extra
        return (
            packed.unpack_particles(st, cap), bodies, t, bounds, hist,
            jax.lax.pmax(need_max, axis), jax.lax.pmax(na, axis),
            jax.lax.pmax(nn, axis), jax.lax.pmax(nc, axis),
            jax.lax.pmax(nr, axis),
        )

    pspec = P(axis)
    p_specs = jax.tree.map(
        lambda _: pspec,
        Particles(
            x=0, v=0, F=0, C=0, aux=0, mass=0, vol=0, mat=0, params=0,
            active=0, states=0, bdist=0, bnormal=0, near_b=0,
        ),
    )
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, P(), P(), P(), P()),  # bodies/bounds replicated
        out_specs=(p_specs, P(), P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def run_spatial_cpic_packed_balanced_frames(
    p, bodies, t, cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    n_frames: int = 1, axis: str = "x", K: int = 1024, budget: int = 256,
    near_budget: int = 4096, b1: int = 1024, Kr: int = 0, r: int = 1,
    bounds=None, hist=None, interpret: bool = False,
):
    """Balanced packed-CPIC frame driver: migration/page-map/near-set
    overflow all auto-grow (re-jit + exact re-run from the intact
    pre-frame state). Returns (p, bodies, t, state)."""
    n_shards = mesh.shape[axis]
    CB, _, _ = balanced_params(cfg, n_shards, r)
    if bounds is None:
        bounds = jnp.asarray(
            balanced_bounds_host(
                jax.tree.map(np.asarray, p), cfg, n_shards, r
            ), jnp.int32,
        )
    if hist is None:
        hist = jnp.zeros((CB,), jnp.int32)

    def build():
        return build_spatial_cpic_packed_balanced_frame(
            cfg, scene, n_substeps, mesh, axis, K, budget, near_budget,
            b1, Kr, r, interpret,
        )

    frame = build()
    local_cap = p.x.shape[0] // n_shards
    for _ in range(n_frames):
        while True:
            (p2, b2, t2, bounds2, hist2, needed, n_act, n_near, n_coarse,
             n_r) = frame(p, bodies, t, bounds, hist)
            needed, n_act = int(needed), int(n_act)
            n_near, n_coarse, n_r = int(n_near), int(n_coarse), int(n_r)
            grow = False
            if needed > budget:
                if needed >= local_cap:
                    raise RuntimeError(
                        f"shard capacity exhausted ({needed} arrivals vs "
                        f"{local_cap} local slots); reshard with more slack"
                    )
                budget = -(-2 * needed // 64) * 64
                grow = True
            if n_act > K:
                K = -(-2 * n_act // 64) * 64
                grow = True
            if n_near > near_budget:
                near_budget = -(-2 * n_near // 64) * 64
                grow = True
            if n_coarse > b1:
                b1 = -(-2 * n_coarse // 64) * 64
                grow = True
            if Kr > 0 and n_r > Kr:  # record-sparse CDF overflow
                Kr = -(-2 * n_r // 64) * 64
                grow = True
            if not grow:
                p, bodies, t, bounds, hist = p2, b2, t2, bounds2, hist2
                break
            frame = build()
    return p, bodies, t, dict(K=K, budget=budget, near_budget=near_budget,
                              b1=b1, Kr=Kr, bounds=bounds, hist=hist)


# ---------------------------------------------------------------------------
# Plain PACKED-carry multichip frame (the production fused pipeline per
# shard — the multichip twin of ops.packed.packed_frame)
# ---------------------------------------------------------------------------


def _pack_with_origins(p2: Particles, keys, off_cells, lcfg: SimConfig,
                       K: int, two_d: bool = True):
    """Pack a locally-sorted pytree, pad its keys, annotate the RORG
    origin rows in GLOBAL grid units (local block origin + shard
    offset, so the fused kernels see single-chip coordinates against
    the global positions in the carry), and build the local page map.
    `off_cells` is the shard's x-offset, or an (x, y) pair for pencil
    meshes.

    two_d=True (production) returns the (NCH, Pw) state form — the
    fused kernels' native layout, so the frame loop carries no
    per-substep flat<->2-D relayout (a ~77 ms copy at 8M, see
    ops.packed.fused_substep_presorted). The relayout-free reshape here
    runs once per RESORT, amortized like the sort itself."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.ops.rows import NCH, RORG

    if not isinstance(off_cells, tuple):
        off_cells = (off_cells, None)
    total_l = blocked.total_blocks_padded(lcfg)
    cap = p2.x.shape[0]
    st = packed.pack_particles(p2)
    pw = st.shape[0] // NCH
    keys_pw = jnp.concatenate(
        [keys, jnp.full((pw - cap,), total_l, jnp.int32)]
    )
    ox, oy, oz = packed._origin_rows(keys_pw, lcfg)
    ox = ox + off_cells[0]
    if off_cells[1] is not None:
        oy = oy + off_cells[1]
    if two_d:
        st = jax.lax.dynamic_update_slice(
            st.reshape(NCH, pw), jnp.stack([ox, oy, oz]), (RORG, 0)
        )
    else:
        st = jax.lax.dynamic_update_slice(
            st, jnp.concatenate([ox, oy, oz]), (RORG * pw,)
        )
    pm = packed.build_page_map_packed(keys_pw, lcfg, K)
    return st, keys_pw, pm


def _two_level_loop(st, keys, pm, extra, t, n_substeps, substep_fn,
                    resort_fn):
    """TWO-LEVEL multichip frame loop — the shard_map twin of
    ops.packed.packed_frame_carry's structure (commit 049ff4b): the
    inner while runs pure substeps until the 0.45-cell drift bound
    breaks, the outer loop re-sorts and re-enters. This removes the
    per-substep resort lax.cond the old scan bodies carried, whose
    untaken identity branch still copies the full state and flips the
    carry layout (~17 ms/substep at 8M, measured single-chip).

    Collective discipline: every loop predicate derives from values all
    shards agree on — substep_fn must return a GLOBALLY-REDUCED drift
    increment (pmax over the mesh axes) — so every shard runs identical
    trip counts and the collectives inside substep_fn/resort_fn stay
    lockstep (the same invariant parallel/async_spatial's tick loop
    rests on). The (substep, resort) event sequence is identical to the
    single-level scan.

    substep_fn(st, keys, pm, extra, t) -> (st, extra, t, drift_inc);
    resort_fn(st, extra) -> (st, keys, pm, extra), folding its own
    stats (migration overflow, n_act maxima) into extra.
    Returns (st, keys, pm, extra, t)."""

    def inner_cond(c):
        _st, _keys, _pm, _extra, drift, _t, n = c
        return (n < n_substeps) & (drift < 0.45)

    def inner_body(c):
        st, keys, pm, extra, drift, t, n = c
        st, extra, t, dinc = substep_fn(st, keys, pm, extra, t)
        return (st, keys, pm, extra, drift + dinc, t, n + 1)

    def outer_cond(c):
        _st, _keys, _pm, _extra, drift, _t, n = c
        return (n < n_substeps) | (drift >= 0.45)

    def outer_body(c):
        st, keys, pm, extra, drift, t, n = jax.lax.while_loop(
            inner_cond, inner_body, c
        )
        need = drift >= 0.45

        def do_resort(args):
            st, extra = args
            return resort_fn(jax.lax.optimization_barrier(st), extra)

        def keep(args):
            st, extra = args
            return st, keys, pm, extra

        st, keys, pm, extra = jax.lax.cond(need, do_resort, keep, (st, extra))
        drift = jnp.where(need, 0.0, drift)
        return (st, keys, pm, extra, drift, t, n)

    st, keys, pm, extra, _, t, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (st, keys, pm, extra, jnp.float32(0.0), t, jnp.int32(0)),
    )
    return st, keys, pm, extra, t


def build_spatial_packed_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget: int = 256, r: int = None,
    interpret: bool = False,
):
    """The PLAIN multichip frame over the PACKED carry: each shard runs
    the fully-fused production substep (ops.packed.fused_substep_presorted
    — prep inside P2G, finish inside G2P) on its slab, with the same
    record-plane boundary exchange, lazy sort and migration-at-resort
    as the pytree pipeline. This is what the flagship non-CPIC scenes
    (benchmark_3d) scale on.

    r=None: uniform slabs; fn(p, t) -> (p, t, needed, n_act).
    r=int:  LOAD-BALANCED slabs (dynamic block-column bounds within
    +-r of uniform, rebalanced at resorts); fn(p, t, bounds, hist) ->
    (p, t, bounds, hist, needed, n_act). Equal to single-chip
    (differential-tested); overflow discipline as the other runners."""
    from taichi_mpm_tpu.ops import packed

    n_shards = mesh.shape[axis]
    balanced = r is not None
    if balanced:
        CB, uniform_np, lcfg = balanced_params(cfg, n_shards, r)
        uniform = jnp.asarray(uniform_np, jnp.int32)
    else:
        lcfg = local_config(cfg, n_shards)
        Wb = slab_cells(cfg, n_shards) // 4
    total_l = blocked.total_blocks_padded(lcfg)

    def local_frame(p: Particles, t, bounds, hist):
        s = jax.lax.axis_index(axis)
        cap = p.x.shape[0]
        pm_cell = [None, None]  # [pm, owned width in block columns]

        def exchange(rec):
            rec = exchange_boundary_records(rec, pm_cell[0], lcfg, axis,
                                            n_shards, pm_cell[1])
            return zero_domain_edge_ghosts(rec, pm_cell[0], lcfg, s, n_shards)

        def off_of(bounds):
            if balanced:
                return ((bounds[s] - 1) * 4).astype(jnp.float32)
            return shard_offset_cells(s, cfg, n_shards)

        def resort_fn(st, extra):
            bounds, hist, need_max, na = extra
            p2 = packed.unpack_particles(st, cap)
            if balanced:
                bounds = rebalance_bounds(hist, bounds, uniform, r, n_shards)
                dest = _dest_from_bounds(p2, bounds, cfg, n_shards)
            else:
                dest = None
            p2, needed = migrate(p2, s, axis, cfg, n_shards, budget,
                                 count_only_overflow=False, dest=dest)
            off_cells = off_of(bounds)
            off = off_cells * cfg.dx
            x_loc = p2.x - jnp.stack(
                [off, jnp.zeros_like(off), jnp.zeros_like(off)], -1
            )
            keys = jnp.where(
                p2.active, blocked.block_id_of(x_loc, lcfg), total_l
            )
            p2, keys, _ = sort_particles_by_keys(p2, keys)
            st, keys_pw, pm = _pack_with_origins(p2, keys, off_cells,
                                                 lcfg, K)
            if balanced:
                hist = col_hist_from_pm(pm, bounds[s], lcfg, CB, axis)
            extra = (bounds, hist, jnp.maximum(need_max, needed),
                     jnp.maximum(na, pm["n_act"]))
            return st, keys_pw, pm, extra

        def substep_fn(st, keys, pm, extra, t):
            bounds = extra[0]
            off_cells = off_of(bounds)
            pm_cell[0] = pm
            pm_cell[1] = (bounds[s + 1] - bounds[s]) if balanced else Wb
            gcolls = shifted_colliders(colliders, off_cells * cfg.dx)
            (st, t), _, vmax, _ = packed.fused_substep_presorted(
                st, pm, t, cfg, colliders, cfg.base_dt,
                interpret=interpret, gcfg=lcfg, grid_colliders=gcolls,
                exchange_fn=exchange,
            )
            dinc = cfg.base_dt * cfg.inv_dx * jax.lax.pmax(vmax, axis)
            return st, extra, t, dinc

        st, keys, pm, extra = resort_fn(
            packed.pack_particles(p),
            (bounds, hist, jnp.int32(0), jnp.int32(0)),
        )
        st, keys, pm, extra, t = _two_level_loop(
            st, keys, pm, extra, t, n_substeps, substep_fn, resort_fn
        )
        bounds, hist, need_max, n_act = extra
        out = (packed.unpack_particles(st, cap), t)
        if balanced:
            out = out + (bounds, hist)
        return out + (
            jax.lax.pmax(need_max, axis), jax.lax.pmax(n_act, axis)
        )

    pspec = P(axis)
    p_specs = jax.tree.map(
        lambda _: pspec,
        Particles(
            x=0, v=0, F=0, C=0, aux=0, mass=0, vol=0, mat=0, params=0,
            active=0, states=0, bdist=0, bnormal=0, near_b=0,
        ),
    )
    n_extra = 2 if balanced else 0
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, P(), P(), P()),
        out_specs=(p_specs, P()) + (P(),) * (n_extra + 2),
        check_vma=False,
    )
    if balanced:
        return jax.jit(fn)
    zb = jnp.zeros((n_shards + 1,), jnp.int32)
    zh = jnp.zeros((1,), jnp.int32)
    jfn = jax.jit(fn)
    return lambda p, t: jfn(p, t, zb, zh)


def run_spatial_packed_frames(
    p, t, cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    n_frames: int = 1, axis: str = "x", K: int = 1024, budget: int = 256,
    r: int = None, bounds=None, hist=None, interpret: bool = False,
):
    """Driver for the packed multichip frame with the standard overflow
    auto-grow (re-jit + exact re-run from the intact pre-frame state).
    Returns (p, t, state); pass state's bounds/hist back to continue a
    balanced run."""
    n_shards = mesh.shape[axis]
    balanced = r is not None
    if balanced:
        CB, _, _ = balanced_params(cfg, n_shards, r)
        if bounds is None:
            bounds = jnp.asarray(
                balanced_bounds_host(
                    jax.tree.map(np.asarray, p), cfg, n_shards, r
                ), jnp.int32,
            )
        if hist is None:
            hist = jnp.zeros((CB,), jnp.int32)

    frame = build_spatial_packed_frame(
        cfg, colliders, n_substeps, mesh, axis, K, budget, r, interpret
    )
    local_cap = p.x.shape[0] // n_shards
    for _ in range(n_frames):
        while True:
            if balanced:
                p2, t2, bounds2, hist2, needed, n_act = frame(
                    p, t, bounds, hist
                )
            else:
                p2, t2, needed, n_act = frame(p, t)
            needed, n_act = int(needed), int(n_act)
            grow = False
            if needed > budget:
                if needed >= local_cap:
                    raise RuntimeError(
                        f"shard capacity exhausted ({needed} arrivals vs "
                        f"{local_cap} local slots); reshard with more slack"
                    )
                budget = -(-2 * needed // 64) * 64
                grow = True
            if n_act > K:
                K = -(-2 * n_act // 64) * 64
                grow = True
            if not grow:
                p, t = p2, t2
                if balanced:
                    bounds, hist = bounds2, hist2
                break
            frame = build_spatial_packed_frame(
                cfg, colliders, n_substeps, mesh, axis, K, budget, r,
                interpret,
            )
    return p, t, dict(K=K, budget=budget, bounds=bounds, hist=hist)
