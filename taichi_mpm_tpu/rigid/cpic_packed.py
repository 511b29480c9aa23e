"""CPIC on the PACKED performance path.

rigid/cpic_blocked.py implements compute-then-correct CPIC over the
Particles pytree — its bulk transfers pay the (N, 3)/(N, 3, 3) layout
tax the plain path eliminated in round 2 (CLAUDE.md invariants). This
module runs the same algorithm over the flat channel-major packed
state (ops/rows.py):

  * bulk P2G = the fused prep+P2G kernel (ops/fused_pallas.p2g_fused)
    — identical values to prep_p2g (transfer.cpp:452-454);
  * bulk G2P = the packed window kernel + finish_packed, with the CPIC
    G2P correction added into the (16, Pw) output rows BETWEEN gather
    and finish (the F-update must see the corrected B, exactly like
    g2p_finish after g2p_correction in the pytree path);
  * the near-rigid compaction, CDF gather and the sparse correction
    passes (transfer.cpp:222-254, 620-682) run on a budget-sized MINI
    pytree gathered from the packed rows — budget-sized (B, 3)/(B, 3,
    3) arrays are fine, it is only capacity-sized ones that blow up;
  * the CDF result (states/bdist/bnormal/near_b) is scattered back
    into rows 37-42 before P2G (the colored transfers read affinity).

Algebraically identical to cpic_blocked_substep_presorted — pinned by
tests/test_cpic_packed.py differentials.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.ops import blocked, packed
from taichi_mpm_tpu.ops.g2p_pallas import g2p_blocked
from taichi_mpm_tpu.ops.packed import row
from taichi_mpm_tpu.ops.rows import (
    NCH,
    RACT,
    RAUX,
    RBDIST,
    RBN,
    RC,
    RF,
    RMASS,
    RMAT,
    RNEARB,
    RORG,
    RPAR,
    RSTATES,
    RV,
    RVOL,
    RX,
)
from taichi_mpm_tpu.ops.substep import grid_update_flat
from taichi_mpm_tpu.rigid import cdf
from taichi_mpm_tpu.rigid.body import accumulate_impulses, apply_impulses
from taichi_mpm_tpu.rigid.cpic_blocked import (
    g2p_correction,
    p2g_correction,
    rigid_prologue,
)
from taichi_mpm_tpu.math.kernels import bspline_weights
from taichi_mpm_tpu.core.transfer import stencil_offsets


def _bits_i(a):
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def _bits_f(a):
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def gather_mini(st, idx, pw):
    """Budget-sized Particles view gathered from packed rows at idx.
    Downstream correction passes index it with arange (identity), so
    the pytree-form correction code runs unchanged on packed state.

    Per-row 1-D gathers, deliberately: a single (48*B,) flat-index
    gather was tried in r5 and measured NET-NEGATIVE — the gathers are
    row-cost-bound (~14 ns/row), so batching saves no row work and the
    wider index arithmetic costs more than the launch overhead it
    removes."""
    g = lambda r: row(st, r, pw)[idx]
    m33 = lambda r0: jnp.stack(
        [jnp.stack([g(r0 + 3 * i + j) for j in range(3)], -1)
         for i in range(3)], -2,
    )
    return Particles(
        x=jnp.stack([g(RX + k) for k in range(3)], -1),
        v=jnp.stack([g(RV + k) for k in range(3)], -1),
        F=m33(RF),
        C=m33(RC),
        aux=g(RAUX),
        mass=g(RMASS),
        vol=g(RVOL),
        mat=_bits_i(g(RMAT)),
        params=jnp.stack([g(RPAR + k) for k in range(8)], -1),
        active=g(RACT) > 0.5,
        states=_bits_i(g(RSTATES)),
        bdist=g(RBDIST),
        bnormal=jnp.stack([g(RBN + k) for k in range(3)], -1),
        near_b=g(RNEARB) > 0.5,
    )


def compact_near_rigid_packed(
    st, pm, node_states, cfg: SimConfig, budget: int, b1: int = 0,
    world_off=None, fast_stage2: bool = False,
):
    """compact_near_rigid_ranges on packed rows: stage 1 reads the
    sorted-particle ranges of tagged blocks straight off the page map
    (O(K + B1)); stage 2 runs the exact stencil test on row gathers.
    cfg is the GRID-frame config; world_off shifts the (global) packed
    positions into it in multichip mode."""
    nbp = blocked.num_blocks_padded(cfg)
    total = blocked.total_blocks_padded(cfg)
    K = pm["ids"].shape[0]
    pw = packed.state_width(st)
    core = node_states.tagged_blocks().reshape(nbp)
    for ax in range(3):
        lo = jnp.concatenate(
            [core.take(jnp.arange(1, core.shape[ax]), axis=ax),
             jnp.zeros_like(core.take(jnp.arange(0, 1), axis=ax))], axis=ax
        )
        hi = jnp.concatenate(
            [jnp.zeros_like(core.take(jnp.arange(0, 1), axis=ax)),
             core.take(jnp.arange(0, core.shape[ax] - 1), axis=ax)], axis=ax
        )
        core = core | lo | hi
    core_flat = jnp.concatenate([core.reshape(-1), jnp.zeros((1,), bool)])
    tagged = core_flat[jnp.minimum(pm["ids"], total)] & (pm["ids"] < total)

    counts = jnp.where(tagged, pm["e_arr"] - pm["s_arr"], 0)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    n_coarse = offs[-1]
    B1 = min(b1 if b1 else 4 * budget, pw)
    j = jnp.arange(B1, dtype=jnp.int32)
    # slot-of-j by scatter + cumsum: searchsorted(offs, j, 'right') - 1
    # with ARANGE queries is just a counting sort — the vmap'd binary
    # search ran 13 gather iterations over B1 (1.7 ms/substep at the
    # r5 res-256 trace); one K-row scatter + a B1 cumsum is exact
    starts = jnp.zeros((B1 + 1,), jnp.int32).at[
        jnp.clip(offs[1:], 0, B1)
    ].add(1)
    slot = jnp.clip(jnp.cumsum(starts[:B1]), 0, K - 1)
    idx1 = jnp.clip(pm["s_arr"][slot] + j - offs[slot], 0, pw - 1)
    valid1 = j < jnp.minimum(n_coarse, B1)

    pos = jnp.stack(
        [row(st, RX + k, pw)[idx1] for k in range(3)], -1
    )
    if world_off is not None:
        pos = pos - world_off
    pos = pos * cfg.inv_dx
    pstates = _bits_i(row(st, RSTATES, pw)[idx1])
    nodes_arr = jnp.asarray(cfg.grid_nodes)
    base, _, _ = bspline_weights(cfg.kernel_order, pos)
    if fast_stage2:
        # one dilated-plane gather per candidate instead of 27 record
        # lookups; exact given the dilate=4/chk=1 lazy map (see
        # tag_dilated_center) — the lazy single-chip frame's setting
        exact = node_states.stencil_tagged(base + 1)
    else:
        exact = jnp.zeros((B1,), bool)
        for off in stencil_offsets(cfg.dim, cfg.kernel_order):
            nidx = base + jnp.asarray(off, jnp.int32)
            inb = jnp.all((nidx >= 0) & (nidx < nodes_arr), -1)
            s, _, _ = node_states.lookup(nidx, inb)
            exact = exact | (s != 0)
    exact = valid1 & (exact | (pstates != 0))

    # stable 0/1 partition via prefix sums + one int32 scatter — the
    # former stable argsort lowered to a TPU sort custom-call costing
    # ~13 ms/substep at b1~64k (r5 water_wheel res-256 trace), ~200x
    # the scatter's cost; order within each class is preserved exactly
    # like the stable sort it replaces
    n_exact = jnp.sum(exact.astype(jnp.int32))
    rank = jnp.where(
        exact,
        jnp.cumsum(exact.astype(jnp.int32)) - 1,
        n_exact + jnp.cumsum((~exact).astype(jnp.int32)) - 1,
    )
    order2 = jnp.zeros((B1,), jnp.int32).at[rank].set(
        jnp.arange(B1, dtype=jnp.int32)
    )
    idx = idx1[order2[:budget]]
    valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(n_exact, budget)
    return idx, valid, n_exact, n_coarse


def cpic_packed_substep_presorted(
    st, keys, pm, bodies, t, cfg: SimConfig, scene, dt,
    near_budget: int, b1: int = 0, Kr: int = 0, interpret: bool = False,
    lcfg: SimConfig = None, world_off=None, axis: str = None,
    grid_colliders=None, exchange_fn=None, rmap=None,
):
    """One coupled substep on the packed carry against a frozen
    sort/page map (the packed twin of cpic_blocked_substep_presorted;
    same stage order as the reference substep, mpm.cpp:455-520).

    Multichip (shard_map) hooks mirror the pytree path: lcfg/world_off
    put the CDF, page map and grid ops in the shard's LOCAL frame
    (positions stay world-global; the RORG rows already include the
    shard offset so the kernels see single-chip coordinates);
    exchange_fn sums boundary record columns after the P2G correction;
    axis psums the rigid impulses (transfer.cpp:195-197,578-580).

    Returns ((st, bodies, t+dt), n_near, n_coarse, n_r, vmax, plast)."""
    from taichi_mpm_tpu.ops import fused_pallas
    from taichi_mpm_tpu.rigid import collision as coll
    from taichi_mpm_tpu.rigid.body import advance

    gcfg = lcfg if lcfg is not None else cfg

    def _psum(v):
        return jax.lax.psum(v, axis) if axis is not None else v

    R = bodies.num
    pw = packed.state_width(st)
    K = pm["ids"].shape[0]
    near_budget = min(near_budget, pw)

    bodies, ncdf, n_r, xb = rigid_prologue(
        bodies, scene, cfg, gcfg, dt, Kr, world_off=world_off, rmap=rmap
    )

    # -- CDF gather on the compacted near-rigid subset; scatter the
    # affinity rows back (rows 37-42 rebuilt from zero: leaving the
    # neighborhood clears affinity, rigid_transfer.cpp:147-149)
    idx, valid, n_near, n_coarse = compact_near_rigid_packed(
        st, pm, ncdf, gcfg, near_budget, b1, world_off=world_off,
        fast_stage2=rmap is not None,
    )

    def _sd_lookup(nidx, inb):
        s, _, dist = ncdf.lookup(nidx, inb)
        return s, dist

    x_c = jnp.stack([row(st, RX + k, pw)[idx] for k in range(3)], -1)
    if world_off is not None:
        x_c = x_c - world_off
    # ONE (B, 27) record-lookup pass shared by the CDF gather and both
    # correction passes — all three index the identical node set at the
    # same pre-advection positions (bitwise-identical values; running
    # the rslot+pk gathers three times was ~1/3 of the res-256 CPIC
    # substep, r5 trace)
    nd = (cdf.stencil_node_data(x_c, ncdf, gcfg)
          if gcfg.kernel_order == 2 else None)
    st_c, bd_c, bn_c, nb_c = cdf.gather_cdf_lookup(
        x_c, _bits_i(row(st, RSTATES, pw)[idx]), _sd_lookup, R, gcfg,
        node_data=nd,
    )
    zero = jnp.zeros((pw,), jnp.float32)
    states_row = zero.at[idx].set(
        jnp.where(valid, _bits_f(st_c), 0.0)
    )
    bdist_row = zero.at[idx].set(jnp.where(valid, bd_c, 0.0))
    bn_rows = [
        zero.at[idx].set(jnp.where(valid, bn_c[:, k], 0.0)) for k in range(3)
    ]
    nearb_row = zero.at[idx].set(
        (valid & nb_c).astype(jnp.float32)
    )
    # rows RSTATES..RNEARB (37..42) are contiguous in the layout
    aff_rows = [states_row, bdist_row] + bn_rows + [nearb_row]
    if st.ndim == 2:
        st = jax.lax.dynamic_update_slice(
            st, jnp.stack(aff_rows), (RSTATES, 0)
        )
    else:
        st = jax.lax.dynamic_update_slice(
            st, jnp.concatenate(aff_rows), (RSTATES * pw,)
        )

    # -- bulk P2G: the fused prep+P2G kernel over all particles
    st2d = st if st.ndim == 2 else st.reshape(NCH, pw)
    tiles = fused_pallas.p2g_fused(
        pm["s_arr"], pm["e_arr"], st2d, dt, cfg, interpret=interpret
    )
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])

    # -- CPIC P2G correction on the mini pytree (identity inner idx;
    # BEFORE the halo exchange — each shard un-scatters its own
    # particles from its own pre-exchange records)
    mini = gather_mini(st, idx, pw)
    if world_off is not None:
        mini = dataclasses.replace(mini, x=mini.x - world_off)
    aidx = jnp.arange(idx.shape[0], dtype=jnp.int32)
    rec, J1, tau1 = p2g_correction(
        mini, aidx, valid, pm, ncdf, bodies, rec, gcfg, dt,
        world_off=world_off, node_data=nd,
    )
    if exchange_fn is not None:
        rec = exchange_fn(rec)
    bodies = apply_impulses(bodies, _psum(J1), _psum(tau1))

    if scene.colliders:
        bodies = coll.rigid_levelset_collision(
            bodies, xb, scene.bp_rid, scene.colliders, t, dt
        )

    vrec = grid_update_flat(
        rec, pm["ids"], gcfg,
        grid_colliders if grid_colliders is not None else scene.colliders,
        t, dt,
    )
    gtiles = blocked.windows_mm(vrec, pm["nbr"])

    # -- bulk G2P on rows + sparse correction into the output rows
    px = row(st, RX + 0, pw) * cfg.inv_dx - row(st, RORG + 0, pw)
    py = row(st, RX + 1, pw) * cfg.inv_dx - row(st, RORG + 1, pw)
    pz = row(st, RX + 2, pw) * cfg.inv_dx - row(st, RORG + 2, pw)
    posg = jnp.stack([px, py, pz] + [jnp.zeros_like(px)] * 5, 0)
    pout = g2p_blocked(
        pm["slot_keys"][None, :], posg, gtiles,
        jnp.asarray([K], jnp.int32), interpret=interpret,
    )
    dv, dB, rid_last = g2p_correction(
        mini, aidx, valid, pm, ncdf, bodies, vrec, gcfg, dt,
        world_off=world_off, node_data=nd,
    )
    vmask = valid & mini.active
    # row-wise 1-D scatter-adds: a single 2-D column scatter
    # (.at[0:3, idx].add) lowers to a SERIALIZED per-particle loop of
    # (3,1) dynamic-update-slices on TPU (traced at ~5.5 ms/substep at
    # budget 1024, linear in budget) — per-row flat scatters stay
    # native
    dvT = jnp.where(vmask, dv.T, 0.0)  # (3, B)
    dBT = jnp.where(vmask, dB.reshape(-1, 9).T, 0.0)  # (9, B)
    for c in range(3):
        pout = jax.lax.dynamic_update_slice(
            pout, pout[c].at[idx].add(dvT[c])[None, :], (c, 0)
        )
    for c in range(9):
        pout = jax.lax.dynamic_update_slice(
            pout, pout[3 + c].at[idx].add(dBT[c])[None, :], (3 + c, 0)
        )

    st, vmax, plast = packed.finish_packed(
        st, pout, cfg, dt, zero_C=row(st, RNEARB, pw) > 0.5
    )

    # -- boundary penetration penalty (transfer.cpp:671-682) on the
    # subset only: pen implies near_b, which is zero outside it
    v_c = jnp.stack([row(st, RV + k, pw)[idx] for k in range(3)], -1)
    act_c = row(st, RACT, pw)[idx] > 0.5
    pen = (
        act_c & vmask & nb_c
        & (bd_c < -0.05 * cfg.dx) & (bd_c > -0.3 * cfg.dx)
    )
    dvp = bd_c[:, None] * bn_c * cfg.penalty
    v_pen = jnp.where(pen[:, None], v_c - dvp, v_c)
    v_rows = [
        row(st, RV + k, pw).at[idx].set(
            jnp.where(vmask & act_c, v_pen[:, k],
                      row(st, RV + k, pw)[idx]))
        for k in range(3)
    ]
    if st.ndim == 2:
        st = jax.lax.dynamic_update_slice(st, jnp.stack(v_rows), (RV, 0))
    else:
        st = jax.lax.dynamic_update_slice(
            st, jnp.concatenate(v_rows), (RV * pw,)
        )
    # torque arms use the ADVECTED positions (the pytree path reads p.x
    # after g2p_finish, cpic_blocked.py penalty epilogue)
    x_pen = jnp.stack([row(st, RX + k, pw)[idx] for k in range(3)], -1)
    J2, tau2 = accumulate_impulses(
        bodies, jnp.clip(rid_last, 0, R - 1), dvp * mini.mass[:, None],
        x_pen, pen & (rid_last >= 0),
    )
    bodies = apply_impulses(bodies, _psum(J2), _psum(tau2))

    if cfg.particle_collision:
        st = packed.particle_collision_packed(st, cfg, scene.colliders, t)
    if cfg.clean_boundary:
        st = packed.clean_boundary_packed(st, cfg)

    bodies = advance(bodies, t, dt, scene.pos_funcs, scene.rot_funcs,
                     cfg.gravity)
    return (st, bodies, t + dt), n_near, n_coarse, n_r, vmax, plast


def cpic_packed_pack_carry(p: Particles, cfg: SimConfig, K: int,
                           two_d: bool = False):
    """Persistent packed CPIC carry (st, keys, pm, drift). two_d=True
    keeps the state in the (NCH, Pw) form — the fused kernels' native
    layout (see ops/packed.pack_carry): flat callers pay a relayout
    copy per substep at the kernel boundary."""
    st = packed.pack_particles(p)
    if two_d:
        st = st.reshape(NCH, -1)
    st, keys, pm = packed.sort_and_map(st, cfg, K)
    return (st, keys, pm, jnp.float32(0.0))


def cpic_packed_frame_carry(
    carry, bodies, t, cfg: SimConfig, scene, dt, n_substeps: int,
    K: int, near_budget: int, b1: int = 0, Kr: int = 0,
    interpret: bool = False,
):
    """The packed twin of cpic_blocked.cpic_frame_carry: lazy re-sort
    over the persistent packed carry. Returns (carry, bodies, t, max
    n_act, max n_near, max n_coarse, max n_r, n_sorts, plast).

    SINGLE-CHIP ONLY: the drift/need predicates of the two
    lax.while_loops are per-shard data, not collective — reusing this
    frame under shard_map would let shards disagree on trip counts.
    The multichip CPIC frames keep their own pmax'd loops.

    Loop structure: TWO-LEVEL, like ops/packed.packed_frame_carry —
    the inner while runs pure coupled substeps until drift crosses the
    0.45-cell lazy-sort bound OR the rigid page map goes stale; the
    outer loop re-sorts / rebuilds and re-enters. A per-substep resort
    `lax.cond` costs a full-state identity-branch copy plus a
    column-major carry flip per substep (measured 17 ms at 8M on the
    plain path); the (substep, resort) event sequence is IDENTICAL to
    the old single-level scan.

    The RIGID PAGE MAP is lazy within the frame (Kr > 0): built once at
    frame start via cdf.rigid_page_map_checked (dilate=4/chk=1),
    reused while every boundary particle's block stays inside the check
    plane, and rebuilt in the outer loop when one leaves. The
    between-substep check runs on post-advance bodies, but the NEXT
    substep's prologue rigidifies (collision-projects) before
    rasterizing — so rigid_prologue additionally gates on the
    post-rigidify positions and cond-rebuilds inline when that
    unbounded in-substep motion escapes the checked plane (ADVICE r4).
    Net: exact coverage with no drift-bound assumption — the rasterized
    CDF values are identical to the per-substep rebuild (only the
    indexing structure is cached). Kills the per-substep total_blocks
    argsort that dominated the prologue at high res."""
    st, keys, pm, drift0 = carry
    from taichi_mpm_tpu.ops import blocked as _blocked
    from taichi_mpm_tpu.rigid.body import boundary_particle_world

    lazy_rmap = Kr > 0

    def _bp_blocks_ok(bodies, chk):
        xb, _, _ = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        bid = _blocked.block_id_of(xb, cfg)
        return jnp.all(chk[bid])

    def _build_rmap(bodies):
        xb, _, _ = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        # dilate=4 / chk at +1: the margin algebra that keeps BOTH the
        # rasterize writes and the stage-2 tag_dilated fast test exact
        # under lazy reuse (see rigid_page_map_checked docstring).
        return cdf.rigid_page_map_checked(xb, cfg, Kr, dilate=4,
                                          chk_dilate=1)

    if lazy_rmap:
        rids0, rslot0, nr0, chk0 = _build_rmap(bodies)
    else:
        total = _blocked.total_blocks_padded(cfg)
        rids0 = jnp.zeros((1,), jnp.int32)
        rslot0 = jnp.zeros((1,), jnp.int32)
        nr0 = jnp.int32(0)
        chk0 = jnp.ones((total + 1,), bool)

    def inner_cond(c):
        (st, keys, pm, bodies, drift, t, n, nnear, ncoarse, nr,
         plast, rm, stale) = c
        return (n < n_substeps) & (drift < 0.45) & ~stale

    def inner_body(c):
        (st, keys, pm, bodies, drift, t, n, nnear, ncoarse, nr,
         plast, rm, stale) = c
        rids, rslot, nr_c, chk = rm
        (st, bodies, t), n_near, n_coarse, n_r, vmax, dplast = (
            cpic_packed_substep_presorted(
                st, keys, pm, bodies, t, cfg, scene, dt, near_budget, b1,
                Kr, interpret=interpret,
                rmap=(rids, rslot, nr_c, chk) if lazy_rmap else None,
            )
        )
        stale = (~_bp_blocks_ok(bodies, chk)) if lazy_rmap else stale
        return (st, keys, pm, bodies, drift + dt * cfg.inv_dx * vmax, t,
                n + 1, jnp.maximum(nnear, n_near),
                jnp.maximum(ncoarse, n_coarse), jnp.maximum(nr, n_r),
                plast + dplast, rm, stale)

    def outer_cond(c):
        (st, keys, pm, bodies, drift, t, n, nmax, nnear, ncoarse, nr,
         nsorts, plast, rm, stale) = c
        return (n < n_substeps) | (drift >= 0.45)

    def outer_body(c):
        (st, keys, pm, bodies, drift, t, n, nmax, nnear, ncoarse, nr,
         nsorts, plast, rm, stale) = c
        (st, keys, pm, bodies, drift, t, n, nnear, ncoarse, nr,
         plast, rm, stale) = jax.lax.while_loop(
            inner_cond, inner_body,
            (st, keys, pm, bodies, drift, t, n, nnear, ncoarse, nr,
             plast, rm, stale),
        )
        need = drift >= 0.45

        def do_resort(st):
            return packed.sort_and_map(
                jax.lax.optimization_barrier(st), cfg, K
            )

        def keep(st):
            return st, keys, pm

        st, keys, pm = jax.lax.cond(need, do_resort, keep, st)
        if lazy_rmap:
            rm = jax.lax.cond(
                stale, lambda: _build_rmap(bodies), lambda: rm
            )
            nr = jnp.maximum(nr, rm[2])
            stale = jnp.zeros((), bool)
        drift = jnp.where(need, 0.0, drift)
        nsorts = nsorts + need.astype(jnp.int32)
        return (st, keys, pm, bodies, drift, t, n,
                jnp.maximum(nmax, pm["n_act"]), nnear, ncoarse, nr,
                nsorts, plast, rm, stale)

    wcarry = (
        st, keys, pm, bodies, drift0, t, jnp.int32(0), pm["n_act"],
        jnp.int32(0), jnp.int32(0), jnp.maximum(jnp.int32(0), nr0),
        jnp.int32(0), jnp.int32(0), (rids0, rslot0, nr0, chk0),
        jnp.zeros((), bool),
    )
    (st, keys, pm, bodies, drift, t, _, nmax, nnear, ncoarse, nr,
     nsorts, plast, _, _) = jax.lax.while_loop(
        outer_cond, outer_body, wcarry
    )
    return ((st, keys, pm, drift), bodies, t, nmax, nnear, ncoarse, nr,
            nsorts, plast)


def cpic_packed_frame(
    p: Particles, bodies, t, cfg: SimConfig, scene, dt, n_substeps: int,
    K: int, near_budget: int, b1: int = 0, Kr: int = 0,
    interpret: bool = False, two_d: bool = False,
):
    """Pytree-in/pytree-out packed CPIC frame (tests + ad-hoc use)."""
    cap = p.capacity
    carry = cpic_packed_pack_carry(p, cfg, K, two_d=two_d)
    carry, bodies, t, nmax, nnear, ncoarse, nr, nsorts, plast = (
        cpic_packed_frame_carry(
            carry, bodies, t, cfg, scene, dt, n_substeps, K, near_budget,
            b1, Kr, interpret=interpret,
        )
    )
    return (packed.unpack_particles(carry[0], cap), bodies, t, nmax,
            nnear, ncoarse, nr, nsorts + 1, plast)


def cpic_packed_adaptive_frame_carry(
    carry, bodies, t, cfg: SimConfig, scene, frame_dt, unit_dt, max_dt,
    K: int, near_budget: int, b1: int = 0, Kr: int = 0,
    strength_dt_mul: float = 1.0, cfl_dt_mul: float = 1.0,
    max_substeps: int = 100000, interpret: bool = False,
):
    """Global-adaptive-dt CPIC frame on the packed carry (VERDICT r4
    #5: the reference's AsyncMPM reuses the full coupled substep
    incl. rigid coupling, async_mpm.cpp:330; here the per-substep dt
    is the POT-snapped global limit over packed rows, exactly the
    plain path's packed_adaptive_frame discipline).

    Identical loop structure to cpic_packed_frame_carry (two-level,
    lazy sort + lazy rigid page map with the in-prologue stale gate);
    termination is time-based (t reaches t + frame_dt) instead of a
    substep count. Returns (carry, bodies, t, max n_act, max n_near,
    max n_coarse, max n_r, n_sorts, plast, n_substeps_taken)."""
    st, keys, pm, drift0 = carry
    from taichi_mpm_tpu.core.adaptive import snap_pot
    from taichi_mpm_tpu.ops import blocked as _blocked
    from taichi_mpm_tpu.rigid.body import boundary_particle_world

    t_end = t + frame_dt
    lazy_rmap = Kr > 0

    def _bp_blocks_ok(bodies, chk):
        xb, _, _ = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        bid = _blocked.block_id_of(xb, cfg)
        return jnp.all(chk[bid])

    def _build_rmap(bodies):
        xb, _, _ = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        return cdf.rigid_page_map_checked(xb, cfg, Kr, dilate=4,
                                          chk_dilate=1)

    if lazy_rmap:
        rids0, rslot0, nr0, chk0 = _build_rmap(bodies)
    else:
        total = _blocked.total_blocks_padded(cfg)
        rids0 = jnp.zeros((1,), jnp.int32)
        rslot0 = jnp.zeros((1,), jnp.int32)
        nr0 = jnp.int32(0)
        chk0 = jnp.ones((total + 1,), bool)

    def not_done(tt, n):
        return (tt < t_end - 1e-9) & (n < max_substeps)

    def inner_cond(c):
        (st, keys, pm, bodies, drift, tt, n, nnear, ncoarse, nr,
         plast, rm, stale) = c
        return not_done(tt, n) & (drift < 0.45) & ~stale

    def inner_body(c):
        (st, keys, pm, bodies, drift, tt, n, nnear, ncoarse, nr,
         plast, rm, stale) = c
        rids, rslot, nr_c, chk = rm
        dt = packed.dt_limit_packed(
            st, cfg, strength_dt_mul, cfl_dt_mul
        )
        dt = snap_pot(dt, unit_dt, max_dt)
        dt = jnp.minimum(dt, t_end - tt)
        (st, bodies, tt), n_near, n_coarse, n_r, vmax, dplast = (
            cpic_packed_substep_presorted(
                st, keys, pm, bodies, tt, cfg, scene, dt, near_budget,
                b1, Kr, interpret=interpret,
                rmap=(rids, rslot, nr_c, chk) if lazy_rmap else None,
            )
        )
        stale = (~_bp_blocks_ok(bodies, chk)) if lazy_rmap else stale
        return (st, keys, pm, bodies,
                drift + dt * cfg.inv_dx * vmax, tt,
                n + 1, jnp.maximum(nnear, n_near),
                jnp.maximum(ncoarse, n_coarse), jnp.maximum(nr, n_r),
                plast + dplast, rm, stale)

    def outer_cond(c):
        (st, keys, pm, bodies, drift, tt, n, nmax, nnear, ncoarse, nr,
         nsorts, plast, rm, stale) = c
        return not_done(tt, n) | (drift >= 0.45)

    def outer_body(c):
        (st, keys, pm, bodies, drift, tt, n, nmax, nnear, ncoarse, nr,
         nsorts, plast, rm, stale) = c
        (st, keys, pm, bodies, drift, tt, n, nnear, ncoarse, nr,
         plast, rm, stale) = jax.lax.while_loop(
            inner_cond, inner_body,
            (st, keys, pm, bodies, drift, tt, n, nnear, ncoarse, nr,
             plast, rm, stale),
        )
        need = drift >= 0.45

        def do_resort(st):
            return packed.sort_and_map(
                jax.lax.optimization_barrier(st), cfg, K
            )

        def keep(st):
            return st, keys, pm

        st, keys, pm = jax.lax.cond(need, do_resort, keep, st)
        if lazy_rmap:
            rm = jax.lax.cond(
                stale, lambda: _build_rmap(bodies), lambda: rm
            )
            nr = jnp.maximum(nr, rm[2])
            stale = jnp.zeros((), bool)
        drift = jnp.where(need, 0.0, drift)
        nsorts = nsorts + need.astype(jnp.int32)
        return (st, keys, pm, bodies, drift, tt, n,
                jnp.maximum(nmax, pm["n_act"]), nnear, ncoarse, nr,
                nsorts, plast, rm, stale)

    wcarry = (
        st, keys, pm, bodies, drift0, t, jnp.int32(0), pm["n_act"],
        jnp.int32(0), jnp.int32(0), jnp.maximum(jnp.int32(0), nr0),
        jnp.int32(0), jnp.int32(0), (rids0, rslot0, nr0, chk0),
        jnp.zeros((), bool),
    )
    (st, keys, pm, bodies, drift, t, n, nmax, nnear, ncoarse, nr,
     nsorts, plast, _, _) = jax.lax.while_loop(
        outer_cond, outer_body, wcarry
    )
    return ((st, keys, pm, drift), bodies, t, nmax, nnear, ncoarse, nr,
            nsorts, plast, n)
