"""Per-block (bucketed) adaptive time stepping on the packed path.

The TPU redesign of the reference's AsyncMPM scheduler
(/root/reference/src/async/async_mpm.cpp:90-373):

  * every active block (page-map slot) carries a power-of-two dt LEVEL:
    dt_slot = unit * 2^lev, lev from the min over the slot's particles
    of the material sound-speed CFL and the advection CFL
    (update_dt_limits, async_mpm.cpp:90-254), with neighbor
    monotonicity (adjacent blocks differ by <= 1 level);
  * the frame runs on integer unit ticks; at tick T every level L with
    2^L | T advances, largest level first (async_mpm.cpp:375-421);
  * one bucket advance = the packed substep over a COMPACTED working
    set: the bucket's blocks plus their 27-neighborhoods, read off the
    block sort as contiguous sorted ranges (the same shared-sort trick
    as the CPIC near-rigid set). Slower (higher-level) neighbor blocks
    contribute through their BACKUP state — the state at their own
    last advance time — exactly the reference's time-consistent backup
    pools (async_mpm.h:79-103); equal/faster neighbors are live (they
    are at time T). Only the bucket's own particles commit
    (async_mpm.cpp:346-370);
  * the work saved is real on TPU because the bucket substep runs on a
    budgeted dense mini-state (gather -> substep -> scatter-commit),
    so its cost scales with the bucket's context size, not the scene.

This trades the reference's exact per-block pools for fixed budgets
with driver growth — the same overflow discipline as the page map.
Like the reference, the mixed-time grid is an approximation; the
scheme is validated against a uniform fine-dt run within tolerance
plus a particle-update-count reduction (the paper's work metric).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.materials import cforms
from taichi_mpm_tpu.ops import blocked, packed
from taichi_mpm_tpu.ops.blocked import nbr_at
from taichi_mpm_tpu.ops.packed import (
    NCH,
    RACT,
    RAUX,
    RF,
    RMASS,
    RMAT,
    RPAR,
    RV,
    RVOL,
    row,
)

MAXLEV = 6  # levels 0..MAXLEV (dt spans a 64x range)


def slot_level_base(st, keys, pm, cfg: SimConfig, unit_dt: float,
                    strength_dt_mul=1.0, cfl_dt_mul=1.0):
    """Per-slot POT dt level BEFORE neighbor monotonicity: level =
    floor(log2(min-particle-limit / unit)), clamped to [0, MAXLEV],
    from the per-particle CFL limits (update_dt_limits,
    async_mpm.cpp:90-254)."""
    pw = st.shape[0] // NCH
    K = pm["ids"].shape[0]
    act = row(st, RACT, pw) > 0.5
    v = [row(st, RV + k, pw) for k in range(3)]
    speed = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    F = tuple(row(st, RF + k, pw) for k in range(9))
    aux = row(st, RAUX, pw)
    params = tuple(row(st, RPAR + k, pw) for k in range(8))
    mat = jax.lax.bitcast_convert_type(row(st, RMAT, pw), jnp.int32)
    a_dt = cforms.dispatch_allowed_dt(
        cfg.active_materials, mat, F, aux, params, row(st, RVOL, pw),
        row(st, RMASS, pw), speed, cfg.dx,
    ) * strength_dt_mul
    cfl = cfl_dt_mul * cfg.dx / jnp.maximum(speed, 1e-30)
    lim = jnp.where(act, jnp.minimum(a_dt, cfl), jnp.inf)

    seg = jnp.minimum(pm["slot_keys"], K)
    slot_lim = jax.ops.segment_min(lim, seg, num_segments=K + 1)[:K]
    # empty slots follow the max level (async_mpm.cpp:146-150)
    slot_lim = jnp.where(jnp.isfinite(slot_lim), slot_lim, jnp.inf)
    ratio = jnp.maximum(slot_lim / unit_dt, 1.0)
    return jnp.clip(
        jnp.floor(jnp.log2(ratio)).astype(jnp.int32), 0, MAXLEV
    )


def monotonic_sweep(lev, pm):
    """One Jacobi iteration of neighbor monotonicity: every slot's
    level drops to min over its 27-neighborhood + 1 (inactive
    neighbors count as MAXLEV). The multichip frame interleaves these
    with cross-shard boundary-plane exchanges."""
    K = pm["ids"].shape[0]
    m = lev
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                if (ox, oy, oz) == (1, 1, 1):
                    continue
                n = nbr_at(pm["nbr"], ox, oy, oz)
                ln = jnp.where(
                    n < K, lev[jnp.minimum(n, K - 1)], MAXLEV
                )
                m = jnp.minimum(m, ln + 1)
    return m


def slot_levels(st, keys, pm, cfg: SimConfig, unit_dt: float,
                strength_dt_mul=1.0, cfl_dt_mul=1.0):
    """Per-slot POT dt level from the per-particle CFL limits
    (update_dt_limits, async_mpm.cpp:90-254), then neighbor
    monotonicity (a block exceeds its neighbors by at most one level)
    via MAXLEV min-with-neighbor+1 sweeps."""
    lev = slot_level_base(st, keys, pm, cfg, unit_dt,
                          strength_dt_mul, cfl_dt_mul)
    for _ in range(MAXLEV):
        lev = monotonic_sweep(lev, pm)
    return lev


def _bucket_ranges(pm, slot_sel, budget: int, capacity: int):
    """Concatenate the sorted-particle ranges of the selected slots
    into a fixed-budget index buffer (shared-sort compaction)."""
    K = pm["ids"].shape[0]
    counts = jnp.where(slot_sel, pm["e_arr"] - pm["s_arr"], 0)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    n_sel = offs[-1]
    j = jnp.arange(budget, dtype=jnp.int32)
    slot = jnp.clip(
        jnp.searchsorted(offs, j, side="right").astype(jnp.int32) - 1,
        0, K - 1,
    )
    idx = jnp.clip(pm["s_arr"][slot] + j - offs[slot], 0, capacity - 1)
    valid = j < jnp.minimum(n_sel, budget)
    # route invalid lanes to the last PAD lane (capacity here is the
    # padded width; real particles never live there), so the commit
    # scatter cannot collide a no-op write onto a committed lane
    idx = jnp.where(valid, idx, capacity - 1)
    return idx, valid, n_sel




def _scatter_rows(st, nch, idx, mini, commit):
    """Scatter committed mini-state lanes back into the flat vector."""
    pw = st.shape[0] // nch
    B = idx.shape[0]
    rows = []
    for r in range(nch):
        dst = row(st, r, pw)
        src = row(mini, r, B)
        rows.append(dst.at[idx].set(jnp.where(commit, src, dst[idx])))
    return jnp.concatenate(rows)


def bucket_substep(
    st, backup_st, keys, pm, lev, L: int, t, cfg: SimConfig, colliders,
    dt, budget: int, K_ctx: int, interpret: bool = False,
    fused: bool = False, lcfg: SimConfig = None, grid_colliders=None,
    exchange_fn=None, ctx_extend_fn=None,
):
    """Advance the level-L bucket by dt: gather its context (bucket
    blocks + 27-neighbors, slower neighbors from backup), run the
    packed substep on the mini-state, commit only bucket particles,
    refresh their backup (async_mpm.cpp:256-373).

    Multichip (shard_map) hooks, mirroring ops.packed.
    fused_substep_presorted: `lcfg` is the shard-LOCAL grid config
    (keys/page map live in the local block frame; positions and RORG
    origins stay global); `grid_colliders` the locally-shifted scene
    colliders; `exchange_fn(rec, mini_pm)` sums the boundary record
    columns of the MINI page map between halo merge and grid update;
    `ctx_extend_fn(in_bucket)` ORs in local blocks adjacent to a
    NEIGHBOR shard's in-bucket blocks across the slab boundary (the
    cross-shard half of the 27-dilation). Multichip requires
    fused=True (the production path)."""
    pw = st.shape[0] // NCH
    K = pm["ids"].shape[0]
    gcfg = cfg if lcfg is None else lcfg

    in_bucket = lev == L
    # context slots: bucket + its 27-neighborhood
    ctx = in_bucket
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                if (ox, oy, oz) == (1, 1, 1):
                    continue
                n = nbr_at(pm["nbr"], ox, oy, oz)
                ctx = ctx | jnp.where(
                    n < K, in_bucket[jnp.minimum(n, K - 1)], False
                )
    if ctx_extend_fn is not None:
        ctx = ctx | ctx_extend_fn(in_bucket)
    ctx = ctx & (pm["ids"] < blocked.total_blocks_padded(gcfg))

    idx, valid, n_sel = _bucket_ranges(pm, ctx, budget, pw)

    # per-lane source: slower (higher-level) blocks via their backup
    lane_lev = jnp.where(
        pm["slot_keys"] < K, lev[jnp.minimum(pm["slot_keys"], K - 1)], 0
    )
    from_backup = lane_lev > L
    mini = jnp.concatenate([
        jnp.where(
            from_backup[idx],
            row(backup_st, r, pw)[idx],
            row(st, r, pw)[idx],
        )
        for r in range(NCH)
    ])
    # deactivate invalid (overflow) lanes in the mini-state
    B = idx.shape[0]
    act_row = row(mini, RACT, B) * valid
    mini = jax.lax.dynamic_update_slice(mini, act_row, (RACT * B,))

    mini_keys = jnp.where(
        valid, keys[idx], blocked.total_blocks_padded(gcfg)
    )
    mini_pm = packed.build_page_map_packed(mini_keys, gcfg, K_ctx)
    if lcfg is not None:
        assert fused, "multichip bucketed runs the fused substep only"
        (mini_new, _), n_act, _, _ = packed.fused_substep_presorted(
            mini, mini_pm, t, cfg, colliders, dt, interpret=interpret,
            gcfg=lcfg, grid_colliders=grid_colliders,
            exchange_fn=(
                (lambda rec: exchange_fn(rec, mini_pm))
                if exchange_fn is not None else None
            ),
        )
    else:
        (mini_new, _), n_act, _, _ = packed.packed_substep_presorted(
            mini, mini_keys, mini_pm, t, cfg, colliders, dt,
            interpret=interpret, fused=fused,
        )

    commit = valid & in_bucket[jnp.minimum(pm["slot_keys"][idx], K - 1)] & (
        pm["slot_keys"][idx] < K
    )
    # drift vmax over the COMMITTED lanes only: context (and empty-
    # bucket) lanes advance without committing, so their motion must
    # not charge this bucket's drift accumulator — with context vmax,
    # empty high-level buckets would fire spurious re-sorts and break
    # the exact single-level parity with packed_frame's schedule
    mnact = (row(mini_new, RACT, B) > 0.5) & commit
    vmax = jnp.max(
        jnp.stack([
            jnp.max(jnp.where(mnact, jnp.abs(row(mini_new, RV + k, B)), 0.0))
            for k in range(3)
        ])
    )
    # backup := pre-advance state of committing lanes (time t)
    backup_st = _scatter_rows(backup_st, NCH, idx, mini, commit)
    st = _scatter_rows(st, NCH, idx, mini_new, commit)
    n_updates = jnp.sum(commit & (row(mini, RACT, B) > 0.5))
    return st, backup_st, n_sel, n_act, n_updates, vmax


def bucketed_frame(
    p: Particles, t, cfg: SimConfig, colliders, frame_dt, unit_dt,
    K: int, budget, K_ctx: int, strength_dt_mul=1.0, cfl_dt_mul=1.0,
    interpret: bool = False, lev_fn=None, fused: bool = False,
    drift_trigger: float = 0.45,
):
    """One frame of per-block bucketed time stepping. frame_dt must be
    an integer multiple of unit_dt * 2^MAXLEV for POT alignment (the
    driver snaps it). dt levels are computed at the frame-start sort
    and at every mid-frame re-sort, like the reference's
    update_dt_limits-per-step (async_mpm.cpp:383).

    `budget` is either one int or a per-level tuple (MAXLEV+1,): each
    level's bucket substep costs O(budget[L]), so fine levels (which
    advance often) get budgets sized to their own small context while
    the big coarse bucket (which advances rarely) gets a large one —
    this is what makes the per-block scheme actually SAVE work on TPU
    (fixed shapes scale with the bucket, not the scene).

    Mid-frame LAZY RE-SORT: per-level drift accumulators track each
    bucket's max cell displacement since the last sort; when any
    exceeds `drift_trigger`, the frame re-sorts, rebuilds the page map
    and levels, and resets backups — but only at a tick where every
    occupied block is time-synchronous (tick divisible by 2^max level),
    so `backup := st` is exact. Re-computed levels are clamped to the
    tick's trailing zero count so every level's power-of-two due-ticks
    stay consistent with the frame tick base (a level-L block advances
    at multiples of 2^L, which must divide the resort tick). The
    trigger matches the uniform-dt frames' 0.45 — in the exact
    (single-level) regime every tick is aligned, so the resort schedule
    is identical to packed_frame's and bitwise parity holds across
    resorts; at mixed levels the trigger->alignment sync delay can
    overshoot the 0.5-cell bound slightly, consistent with the scheme's
    approximate mixed-time grid. Frames no longer need splitting to
    keep drift < 0.5 cells.

    Returns (p, t, n_updates, n_sel_max (MAXLEV+1,), max n_act_ctx,
    info): n_updates is the reference's update_counter (committed
    particle advances); n_sel_max reports each level's context-budget
    demand (driver re-jits with larger budgets on overflow); info is
    {'n_substeps', 'n_resorts'}."""
    if isinstance(budget, int):
        budget = (budget,) * (MAXLEV + 1)
    cap = p.capacity
    total = blocked.total_blocks_padded(cfg)

    def sort_and_level(st, tz):
        """Sort + origin annotation + page map + (tz-clamped) level
        assignment (origins feed the fused kernels' in-kernel prep)."""
        st, keys, pm = packed.sort_and_map(st, cfg, K)
        if lev_fn is None:
            lev = slot_levels(st, keys, pm, cfg, unit_dt,
                              strength_dt_mul, cfl_dt_mul)
        else:
            lev = lev_fn(pm)  # testing hook: explicit level assignment
        lev = jnp.minimum(lev, tz)
        return st, keys, pm, lev

    st, keys, pm, lev = sort_and_level(
        packed.pack_particles(p), jnp.int32(MAXLEV)
    )
    backup_st = st

    n_units = int(round(frame_dt / unit_dt))
    assert n_units % (1 << MAXLEV) == 0, (
        f"frame_dt must be a multiple of unit_dt * 2^{MAXLEV}"
    )

    def _trailing_zeros(tick):
        low = (tick & -tick).astype(jnp.float32)
        return jnp.round(jnp.log2(jnp.maximum(low, 1.0))).astype(jnp.int32)

    def tick_body(carry):
        (st, backup_st, keys, pm, lev, drifts, tick, t, nup, nselmax,
         namax, nsub, nsorts) = carry

        # lazy mid-frame re-sort at time-synchronous ticks
        occ = (pm["e_arr"] > pm["s_arr"]) & (pm["ids"] < total)
        lmax_occ = jnp.max(jnp.where(occ, lev, 0))
        aligned = (tick % jnp.left_shift(jnp.int32(1), lmax_occ)) == 0
        want = jnp.max(drifts) >= drift_trigger
        do = aligned & want & (tick > 0)

        def resort(args):
            st, _, _, _, _, _ = args
            st, keys, pm, lev = sort_and_level(
                jax.lax.optimization_barrier(st), _trailing_zeros(tick)
            )
            return (st, st, keys, pm, lev,
                    jnp.zeros((MAXLEV + 1,), jnp.float32))

        def keep(args):
            return args

        st, backup_st, keys, pm, lev, drifts = jax.lax.cond(
            do, resort, keep, (st, backup_st, keys, pm, lev, drifts)
        )
        nsorts = nsorts + do.astype(jnp.int32)

        for L in range(MAXLEV, -1, -1):
            due = (jnp.int32(tick) % (1 << L)) == 0
            has = jnp.any(lev == L)

            def advance(args, L=L):
                st, backup_st, drifts, nup, nselmax, namax, nsub = args
                dt_L = unit_dt * (1 << L)
                st, backup_st, n_sel, n_act, n_up, vmax = bucket_substep(
                    st, backup_st, keys, pm, lev, L, t, cfg,
                    colliders, dt_L, budget[L], K_ctx,
                    interpret=interpret, fused=fused,
                )
                drifts = drifts.at[L].add(dt_L * cfg.inv_dx * vmax)
                return (st, backup_st, drifts, nup + n_up,
                        nselmax.at[L].max(n_sel),
                        jnp.maximum(namax, n_act), nsub + 1)

            def skip(args):
                return args

            st, backup_st, drifts, nup, nselmax, namax, nsub = jax.lax.cond(
                due & has, advance, skip,
                (st, backup_st, drifts, nup, nselmax, namax, nsub),
            )
        step = jnp.left_shift(jnp.int32(1), jnp.min(lev))
        return (st, backup_st, keys, pm, lev, drifts, tick + step,
                t + unit_dt * step.astype(jnp.float32), nup, nselmax,
                namax, nsub, nsorts)

    def tick_cond(carry):
        return carry[6] < n_units

    carry = (st, backup_st, keys, pm, lev,
             jnp.zeros((MAXLEV + 1,), jnp.float32), jnp.int32(0), t,
             jnp.int32(0), jnp.zeros((MAXLEV + 1,), jnp.int32),
             jnp.int32(0), jnp.int32(0), jnp.int32(0))
    (st, backup_st, keys, pm, lev, drifts, _, t, nup, nselmax, namax,
     nsub, nsorts) = jax.lax.while_loop(tick_cond, tick_body, carry)
    return (packed.unpack_particles(st, cap), t, nup, nselmax, namax,
            dict(n_substeps=nsub, n_resorts=nsorts))
