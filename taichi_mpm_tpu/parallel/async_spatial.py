"""Per-block bucketed adaptive time stepping UNDER shard_map.

The reference's async scheduler is shared-memory single-node
(/root/reference/src/async/async_mpm.cpp:90-421); its TPU redesign
(ops/async_bucketed) runs per-block POT dt buckets on the packed
carry. This module scales that scheduler over a 1-D slab device mesh:

  * the tick loop runs in LOCKSTEP on every shard — the bucket-due
    predicates, resort predicate and tick increment are all global
    reductions (pmax/pmin), so every shard traces and takes the same
    branch and the collectives inside always pair up;
  * block dt LEVELS obey neighbor monotonicity ACROSS shard
    boundaries: each Jacobi sweep (ops.async_bucketed.monotonic_sweep)
    is interleaved with a ppermute exchange of the boundary
    block-column level planes, so the result equals the single-chip
    MAXLEV global sweeps exactly (same Jacobi reads);
  * each bucket advance extends its context across the boundary: the
    neighbor's in-bucket edge planes ride the same ppermute and
    dilate onto the local edge columns (the cross-shard half of the
    27-neighborhood), and the mini-substep's halo merge is followed by
    the standard symmetric two-column record exchange — both copies of
    the shared columns hold the full sums, the grid update runs
    redundantly-but-identically, and G2P stays local (the invariant of
    parallel/spatial_blocked);
  * the backup (time-consistent slower-neighbor state,
    async_mpm.h:79-103) is per-lane and therefore shard-local; resorts
    happen only at globally time-synchronous ticks, where backup := st
    is exact, and migration runs there (ghost blocks absorb the
    interim drift, exactly like the uniform-dt multichip frames).

Differential contract: equal to the single-chip bucketed_frame
(same levels, same tick/resort schedule, same committed updates) up to
summation-order noise — tests/test_async_spatial.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.ops import async_bucketed as ab
from taichi_mpm_tpu.ops import blocked, packed
from taichi_mpm_tpu.ops.async_bucketed import MAXLEV
from taichi_mpm_tpu.ops.blocked import sort_particles_by_keys
from taichi_mpm_tpu.parallel.spatial import migrate
from taichi_mpm_tpu.parallel.spatial_blocked import (
    _pack_with_origins,
    exchange_boundary_records,
    local_config,
    shard_offset_cells,
    shifted_colliders,
    slab_cells,
    zero_domain_edge_ghosts,
)


def _col_plane(vec, pm, lcfg: SimConfig, col: int, fill):
    """Dense (nby, nbz) plane of a per-slot vector at one local block
    column (fill where the block is inactive)."""
    nbp = blocked.num_blocks_padded(lcfg)
    K = pm["ids"].shape[0]
    by = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
    bz = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
    bid = (col * nbp[1] + by) * nbp[2] + bz
    slot = pm["slot_map"][bid]
    return jnp.where(slot < K, vec[jnp.minimum(slot, K - 1)], fill)


def _pool9(plane, fill, op):
    """3x3 min/max pool over (by, bz) with `fill` edge padding — the
    cross-boundary 9-neighborhood of an edge block."""
    p = jnp.pad(plane, 1, constant_values=fill)
    out = jnp.full_like(plane, fill)
    H, W = plane.shape
    for dy in range(3):
        for dz in range(3):
            out = op(out, p[dy:dy + H, dz:dz + W])
    return out


def _slot_levels_sharded(st, keys, pm, cfg: SimConfig, lcfg: SimConfig,
                         unit_dt, axis: str, n_shards: int, Wb: int,
                         strength_dt_mul=1.0, cfl_dt_mul=1.0):
    """slot_levels with cross-shard neighbor monotonicity: each Jacobi
    sweep first exchanges the CURRENT level planes of the boundary
    block columns (my col Wb <-> right neighbor's col 1; local col L is
    global col s*Wb - 1 + L, so my ghost col 0 IS the left neighbor's
    owned col Wb), then applies the local 27-sweep plus the 9-pooled
    cross constraint on the edge columns — identical reads to the
    single-chip global Jacobi sweeps."""
    lev = ab.slot_level_base(st, keys, pm, cfg, unit_dt,
                             strength_dt_mul, cfl_dt_mul)
    s = jax.lax.axis_index(axis)
    nbp = blocked.num_blocks_padded(lcfg)
    ids = pm["ids"]
    bx = ids // (nbp[1] * nbp[2])
    by = (ids // nbp[2]) % nbp[1]
    bz = ids % nbp[2]
    right = [(i, i + 1) for i in range(n_shards - 1)]
    left = [(i + 1, i) for i in range(n_shards - 1)]
    for _ in range(MAXLEV):
        pl_lo = _col_plane(lev, pm, lcfg, 1, MAXLEV)
        pl_hi = _col_plane(lev, pm, lcfg, Wb, MAXLEV)
        from_left = jax.lax.ppermute(pl_hi, axis, right)
        from_right = jax.lax.ppermute(pl_lo, axis, left)
        # domain-edge shards receive zeros from ppermute: no neighbor
        from_left = jnp.where(s == 0, MAXLEV, from_left)
        from_right = jnp.where(s == n_shards - 1, MAXLEV, from_right)
        m = ab.monotonic_sweep(lev, pm)
        cl = _pool9(from_left, MAXLEV, jnp.minimum)[by, bz] + 1
        cr = _pool9(from_right, MAXLEV, jnp.minimum)[by, bz] + 1
        m = jnp.where(bx == 1, jnp.minimum(m, cl), m)
        m = jnp.where(bx == Wb, jnp.minimum(m, cr), m)
        lev = m
    return lev


def build_bucketed_spatial_frame(
    cfg: SimConfig, colliders, frame_dt, unit_dt, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget=1024, K_ctx: int = 256,
    mig_budget: int = 256, strength_dt_mul=1.0, cfl_dt_mul=1.0,
    drift_trigger: float = 0.45, interpret: bool = False,
):
    """The bucketed (per-block adaptive dt) frame over uniform 1-D
    slabs, fused packed substeps per shard.

    fn(p, t) -> (p, t, n_updates, n_sel_max (MAXLEV+1,), namax_ctx,
    namax_main, needed_mig, n_resorts): n_updates is psum'd (the global
    committed-particle-advance count); the budget demands are pmax'd;
    the runner re-jits larger on overflow, as everywhere else."""
    if isinstance(budget, int):
        budget = (budget,) * (MAXLEV + 1)
    n_shards = mesh.shape[axis]
    lcfg = local_config(cfg, n_shards)
    Wb = slab_cells(cfg, n_shards) // 4
    total_l = blocked.total_blocks_padded(lcfg)
    n_units = int(round(frame_dt / unit_dt))
    assert n_units % (1 << MAXLEV) == 0, (
        f"frame_dt must be a multiple of unit_dt * 2^{MAXLEV}"
    )
    right = [(i, i + 1) for i in range(n_shards - 1)]
    left = [(i + 1, i) for i in range(n_shards - 1)]

    def pmaxa(v):
        return jax.lax.pmax(v, axis)

    def local_frame(p: Particles, t):
        s = jax.lax.axis_index(axis)
        cap = p.x.shape[0]
        off_cells = shard_offset_cells(s, cfg, n_shards)
        gcolls = shifted_colliders(colliders, off_cells * cfg.dx)

        def exchange(rec, mpm):
            rec = exchange_boundary_records(rec, mpm, lcfg, axis,
                                            n_shards, Wb)
            return zero_domain_edge_ghosts(rec, mpm, lcfg, s, n_shards)

        def ctx_extend(pm):
            def fn(in_bucket):
                ib = in_bucket.astype(jnp.int32)
                pl_lo = _col_plane(ib, pm, lcfg, 1, 0)
                pl_hi = _col_plane(ib, pm, lcfg, Wb, 0)
                from_left = jax.lax.ppermute(pl_hi, axis, right)
                from_right = jax.lax.ppermute(pl_lo, axis, left)
                nbp = blocked.num_blocks_padded(lcfg)
                ids = pm["ids"]
                bx = ids // (nbp[1] * nbp[2])
                by = (ids // nbp[2]) % nbp[1]
                bz = ids % nbp[2]
                ml = _pool9(from_left, 0, jnp.maximum)[by, bz]
                mr = _pool9(from_right, 0, jnp.maximum)[by, bz]
                return ((bx == 1) & (ml > 0)) | ((bx == Wb) & (mr > 0))
            return fn

        def resort(st, tz):
            p2 = packed.unpack_particles(st, cap)
            p2, needed = migrate(p2, s, axis, cfg, n_shards, mig_budget,
                                 count_only_overflow=False)
            off = off_cells * cfg.dx
            x_loc = p2.x - jnp.stack(
                [off, jnp.zeros_like(off), jnp.zeros_like(off)], -1
            )
            lkeys = jnp.where(
                p2.active, blocked.block_id_of(x_loc, lcfg), total_l
            )
            p2, lkeys, _ = sort_particles_by_keys(p2, lkeys)
            # flat form: the bucketed tick loop's compaction/backup
            # machinery (ops/async_bucketed) is still flat-indexed
            st, keys_pw, pm = _pack_with_origins(p2, lkeys, off_cells,
                                                 lcfg, K, two_d=False)
            lev = _slot_levels_sharded(
                st, keys_pw, pm, cfg, lcfg, unit_dt, axis, n_shards, Wb,
                strength_dt_mul, cfl_dt_mul,
            )
            lev = jnp.minimum(lev, tz)
            return st, keys_pw, pm, lev, needed

        st, keys, pm, lev, needed0 = resort(
            packed.pack_particles(p), jnp.int32(MAXLEV)
        )
        backup_st = st

        def _trailing_zeros(tick):
            low = (tick & -tick).astype(jnp.float32)
            return jnp.round(
                jnp.log2(jnp.maximum(low, 1.0))
            ).astype(jnp.int32)

        def tick_body(carry):
            (st, backup_st, keys, pm, lev, drifts, tick, t, nup,
             nselmax, namax, namain, needm, nsorts) = carry

            # global re-sort predicate at time-synchronous ticks
            occ = (pm["e_arr"] > pm["s_arr"]) & (pm["ids"] < total_l)
            lmax_occ = pmaxa(jnp.max(jnp.where(occ, lev, 0)))
            aligned = (tick % jnp.left_shift(jnp.int32(1), lmax_occ)) == 0
            want = pmaxa(jnp.max(drifts)) >= drift_trigger
            do = aligned & want & (tick > 0)

            def do_resort(args):
                st, _, _, _, _, _, needm = args
                st, keys, pm, lev, needed = resort(
                    jax.lax.optimization_barrier(st),
                    _trailing_zeros(tick),
                )
                return (st, st, keys, pm, lev,
                        jnp.zeros((MAXLEV + 1,), jnp.float32),
                        jnp.maximum(needm, needed))

            def keep(args):
                return args

            (st, backup_st, keys, pm, lev, drifts, needm) = jax.lax.cond(
                do, do_resort, keep,
                (st, backup_st, keys, pm, lev, drifts, needm),
            )
            nsorts = nsorts + do.astype(jnp.int32)
            namain = jnp.maximum(namain, pm["n_act"])

            for L in range(MAXLEV, -1, -1):
                due = (jnp.int32(tick) % (1 << L)) == 0
                has = pmaxa(jnp.any(lev == L).astype(jnp.int32)) > 0

                def advance(args, L=L):
                    st, backup_st, drifts, nup, nselmax, namax = args
                    dt_L = unit_dt * (1 << L)
                    st, backup_st, n_sel, n_act, n_up, vmax = (
                        ab.bucket_substep(
                            st, backup_st, keys, pm, lev, L, t, cfg,
                            colliders, dt_L, budget[L], K_ctx,
                            interpret=interpret, fused=True, lcfg=lcfg,
                            grid_colliders=gcolls, exchange_fn=exchange,
                            ctx_extend_fn=ctx_extend(pm),
                        )
                    )
                    # GLOBAL committed vmax: the drift accumulator must
                    # match the single-chip schedule exactly
                    drifts = drifts.at[L].add(
                        dt_L * cfg.inv_dx * pmaxa(vmax)
                    )
                    return (st, backup_st, drifts, nup + n_up,
                            nselmax.at[L].max(n_sel),
                            jnp.maximum(namax, n_act))

                def skip(args):
                    return args

                (st, backup_st, drifts, nup, nselmax, namax) = jax.lax.cond(
                    due & has, advance, skip,
                    (st, backup_st, drifts, nup, nselmax, namax),
                )
            step = jnp.left_shift(
                jnp.int32(1), jax.lax.pmin(jnp.min(lev), axis)
            )
            return (st, backup_st, keys, pm, lev, drifts, tick + step,
                    t + unit_dt * step.astype(jnp.float32), nup,
                    nselmax, namax, namain, needm, nsorts)

        def tick_cond(carry):
            return carry[6] < n_units

        carry = (st, backup_st, keys, pm, lev,
                 jnp.zeros((MAXLEV + 1,), jnp.float32), jnp.int32(0), t,
                 jnp.int32(0), jnp.zeros((MAXLEV + 1,), jnp.int32),
                 jnp.int32(0), pm["n_act"], needed0, jnp.int32(0))
        (st, backup_st, keys, pm, lev, drifts, _, t, nup, nselmax,
         namax, namain, needm, nsorts) = jax.lax.while_loop(
            tick_cond, tick_body, carry
        )
        return (packed.unpack_particles(st, cap), t,
                jax.lax.psum(nup, axis), pmaxa(nselmax), pmaxa(namax),
                pmaxa(namain), pmaxa(needm), nsorts)

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
        out_specs=(p_specs,) + (P(),) * 7,
        check_vma=False,
    )
    return jax.jit(fn)


def run_bucketed_spatial_frames(
    p, t, cfg: SimConfig, colliders, frame_dt, unit_dt, mesh: Mesh,
    n_frames: int = 1, axis: str = "x", K: int = 1024, budget=1024,
    K_ctx: int = 256, mig_budget: int = 256, strength_dt_mul=1.0,
    cfl_dt_mul=1.0, drift_trigger: float = 0.45,
    interpret: bool = False,
):
    """Frame driver with the standard overflow auto-grow (per-level
    context budgets, context page map K_ctx, main page map K, migration
    budget). Returns (p, t, n_updates_total, state)."""
    if isinstance(budget, int):
        budget = [budget] * (MAXLEV + 1)
    else:
        budget = list(budget)
    n_shards = mesh.shape[axis]

    def build():
        return build_bucketed_spatial_frame(
            cfg, colliders, frame_dt, unit_dt, mesh, axis, K,
            tuple(budget), K_ctx, mig_budget, strength_dt_mul,
            cfl_dt_mul, drift_trigger, interpret,
        )

    frame = build()
    local_cap = p.x.shape[0] // n_shards
    pw = -(-local_cap // packed.CHUNK) * packed.CHUNK
    nup_total = 0
    for _ in range(n_frames):
        while True:
            (p2, t2, nup, nselmax, namax, namain, needm,
             nsorts) = frame(p, t)
            nselmax = np.asarray(nselmax)
            namax, namain = int(namax), int(namain)
            needm = int(needm)
            grow = False
            for L in range(MAXLEV + 1):
                if int(nselmax[L]) > budget[L]:
                    budget[L] = min(
                        pw, -(-2 * int(nselmax[L]) // 64) * 64
                    )
                    grow = True
            if namax > K_ctx:
                K_ctx, grow = -(-2 * namax // 64) * 64, True
            if namain > K:
                K, grow = -(-2 * namain // 64) * 64, True
            if needm > mig_budget:
                if needm >= local_cap:
                    raise RuntimeError(
                        f"shard capacity exhausted ({needm} arrivals vs "
                        f"{local_cap} local slots); reshard with more "
                        "slack"
                    )
                mig_budget, grow = -(-2 * needm // 64) * 64, True
            if not grow:
                p, t = p2, t2
                nup_total += int(nup)
                break
            frame = build()
    return p, t, nup_total, dict(
        K=K, budget=tuple(budget), K_ctx=K_ctx, mig_budget=mig_budget,
    )
