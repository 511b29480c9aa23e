"""CPIC on the blocked performance path.

The reference dispatches per block: blocks near rigid bodies take the
slow CPIC branch, all others the fast SIMD path (update_rigid_page_map,
mpm.cpp:1021-1076; dispatch at transfer.cpp:570-577). The TPU analog
used here is *compute-then-correct*:

  1. ALL particles run the plain blocked Pallas P2G/G2P (no coloring);
  2. particles near rigid surfaces (affinity bits or tagged stencil
     nodes) are COMPACTED into a fixed-budget index set;
  3. a sparse XLA correction pass over only that set
     - subtracts their contributions at color-incompatible nodes from
       the node records (and converts them into rigid impulses), and
     - replaces their gathered contributions from incompatible nodes by
       the CPIC ghost values,
     using exactly the same weights and fused-force values as the plain
     path, so the combination is algebraically identical to the
     reference's colored transfers (transfer.cpp:222-254, 620-682).

Cost: plain-path speed for the bulk + O(near-rigid particles) for the
CPIC physics — the reference's "rigid block fraction" scaling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.levelset import friction_project
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.core.transfer import g2p_finish, stencil_offsets
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.math.kernels import bspline_weights, inv_D
from taichi_mpm_tpu.ops import blocked
from taichi_mpm_tpu.ops.blocked import sort_particles
from taichi_mpm_tpu.ops.g2p_pallas import g2p_blocked
from taichi_mpm_tpu.ops.p2g_pallas import CHUNK, p2g_blocked
from taichi_mpm_tpu.ops.substep import (
    _round_up,
    build_page_map_full,
    grid_update_flat,
    prep_p2g,
)
from taichi_mpm_tpu.rigid import cdf
from taichi_mpm_tpu.rigid.body import (
    R_UNROLL_MAX,
    accumulate_impulses,
    accumulate_impulses_masked,
    apply_impulses,
    boundary_particle_world,
    velocity_at,
    velocity_at_masked,
)
from taichi_mpm_tpu.rigid.cpic import (
    _compatible,
    _friction_of,
    _friction_of_masked,
)
from taichi_mpm_tpu.utils import mv as mv_small, outer


def _node_state_lookup(idx, grid_states, grid_rid, cfg: SimConfig):
    """Gather packed color tags + owner rigid id at global node indices
    idx (..., 3)."""
    nodes = cfg.grid_nodes
    inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
    lin = (idx[..., 0] * nodes[1] + idx[..., 1]) * nodes[2] + idx[..., 2]
    lin = jnp.where(inb, lin, 0)
    s = jnp.where(inb, grid_states[lin], 0)
    rid = jnp.where(inb, grid_rid[lin], -1)
    return s, rid, inb


def _rec_slot_lane(idx, slot_map, cfg: SimConfig):
    """Global node index (..., 3) -> (record slot, 64-lane index)."""
    nbp = blocked.num_blocks_padded(cfg)
    total = nbp[0] * nbp[1] * nbp[2]
    b = idx // 4
    l = idx % 4
    bid = (b[..., 0] * nbp[1] + b[..., 1]) * nbp[2] + b[..., 2]
    bid = jnp.clip(bid, 0, total)
    slot = slot_map[bid]
    lane = l[..., 0] * 16 + l[..., 1] * 4 + l[..., 2]
    return slot, lane


def compact_near_rigid_ranges(
    p: Particles, keys, pm, node_states, cfg: SimConfig, budget: int,
    b1: int = 0,
):
    """Shared-sort near-rigid compaction (VERDICT r1 #6): the coarse
    near-rigid set is read off the EXISTING block sort as the
    concatenation of the sorted-particle ranges of tagged blocks —
    O(K + B1) instead of an argsort over the whole particle capacity.
    This is exactly how the reference gets its rigid page map as a
    byproduct of the main sort (mpm.cpp:1021-1076).

    Tagged blocks = blocks containing CDF-tagged nodes, dilated by one
    block (covers both the stencil reach and the <0.5-cell lazy-sort
    drift). node_states is a NodeStates view (dense or record-sparse).
    Stage 2 (exact stencil test) queries it per stencil node. Returns
    (idx, valid, n_near, n_coarse)."""
    nbp = blocked.num_blocks_padded(cfg)
    total = blocked.total_blocks_padded(cfg)
    K = pm["ids"].shape[0]
    core = node_states.tagged_blocks()  # (total,) bool, block space
    core = core.reshape(nbp)
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
    B1 = min(b1 if b1 else 4 * budget, p.capacity)
    j = jnp.arange(B1, dtype=jnp.int32)
    # counting-sort form of searchsorted(offs, arange, 'right') - 1
    # (see cpic_packed.compact_near_rigid_packed)
    starts = jnp.zeros((B1 + 1,), jnp.int32).at[
        jnp.clip(offs[1:], 0, B1)
    ].add(1)
    slot = jnp.clip(jnp.cumsum(starts[:B1]), 0, K - 1)
    idx1 = jnp.clip(pm["s_arr"][slot] + j - offs[slot], 0, p.capacity - 1)
    valid1 = j < jnp.minimum(n_coarse, B1)

    # stage 2: exact per-stencil test on the coarse subset only
    nodes_arr = jnp.asarray(cfg.grid_nodes)
    pos = p.x[idx1] * cfg.inv_dx
    base, _, _ = bspline_weights(cfg.kernel_order, pos)
    exact = jnp.zeros((B1,), bool)
    for off in stencil_offsets(cfg.dim, cfg.kernel_order):
        nidx = base + jnp.asarray(off, jnp.int32)
        inb = jnp.all((nidx >= 0) & (nidx < nodes_arr), -1)
        s, _, _ = node_states.lookup(nidx, inb)
        exact = exact | (s != 0)
    exact = valid1 & (exact | (p.states[idx1] != 0))

    # stable 0/1 partition via prefix sums + one scatter (identical
    # order to the stable argsort it replaces; the TPU sort
    # custom-call cost ~13 ms/substep at b1~64k — r5 trace, see
    # cpic_packed.compact_near_rigid_packed)
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


def compact_near_rigid(
    p: Particles, grid_states, cfg: SimConfig, budget: int, b1: int = 0
):
    """Fixed-budget compaction of particles near rigid surfaces: blocks
    containing tagged nodes are dilated by one block (conservative
    superset of the exact per-stencil test), then each particle makes
    ONE block-table lookup — the rigid page map (mpm.cpp:1021-1076 /
    rigid_transfer.cpp:147-149) rebuilt functionally.

    budget sizes the EXACT set (every downstream correction pass costs
    O(budget)); b1 sizes the intermediate COARSE block-level set
    (default 4*budget). Returns (idx, valid, n_near, n_coarse) where
    n_near is the conservative near count for budget-overflow checks
    and n_coarse the stage-1 count for b1-overflow checks."""
    nodes = cfg.grid_nodes
    nbp = blocked.num_blocks_padded(cfg)
    tag = (grid_states != 0).reshape(nodes)
    padx = 4 * nbp[0] - nodes[0]
    pady = 4 * nbp[1] - nodes[1]
    padz = 4 * nbp[2] - nodes[2]
    tag = jnp.pad(tag, ((0, padx), (0, pady), (0, padz)))
    core = jnp.any(
        tag.reshape(nbp[0], 4, nbp[1], 4, nbp[2], 4), axis=(1, 3, 5)
    )
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
    touch = core.reshape(-1)[blocked.block_id_of(p.x, cfg)]
    coarse = p.active & (touch | (p.states != 0))
    order = jnp.argsort(jnp.where(coarse, 0, 1), stable=True).astype(jnp.int32)
    n_coarse = jnp.sum(coarse.astype(jnp.int32))
    B1 = min(b1 if b1 else 4 * budget, p.capacity)
    idx1 = order[:B1]
    valid1 = jnp.arange(B1, dtype=jnp.int32) < jnp.minimum(n_coarse, B1)

    # stage 2: exact per-stencil test on the coarse subset only (the
    # expensive 27 node gathers run over B1, not the whole P)
    pos = p.x[idx1] * cfg.inv_dx
    base, _, _ = bspline_weights(cfg.kernel_order, pos)
    exact = jnp.zeros((B1,), bool)
    for off in stencil_offsets(cfg.dim, cfg.kernel_order):
        nidx = base + jnp.asarray(off, jnp.int32)
        inb = jnp.all((nidx >= 0) & (nidx < jnp.asarray(nodes)), -1)
        lin = (nidx[..., 0] * nodes[1] + nidx[..., 1]) * nodes[2] + nidx[..., 2]
        s = jnp.where(inb, grid_states[jnp.where(inb, lin, 0)], 0)
        exact = exact | (s != 0)
    exact = valid1 & (exact | (p.states[idx1] != 0))

    order2 = jnp.argsort(jnp.where(exact, 0, 1), stable=True).astype(jnp.int32)
    n_exact = jnp.sum(exact.astype(jnp.int32))
    idx = idx1[order2[:budget]]
    valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(n_exact, budget)
    # if the coarse stage overflowed (n_coarse > b1), exact-near
    # particles may have been missed: the caller must check n_coarse
    # against its b1 capacity FIRST, then n_near against budget
    return idx, valid, n_exact, n_coarse


def _near_values(p: Particles, idx, cfg: SimConfig, dt):
    """The plain path's fused P2G values for the compacted subset: the
    same vel/affine/force formulas as prep_p2g, gathered at idx."""
    invD = inv_D(cfg.kernel_order)
    F = p.F[idx]
    C = p.C[idx]
    aux = p.aux[idx]
    params = p.params[idx]
    vol = p.vol[idx]
    mat = p.mat[idx]
    mass = jnp.where(p.active[idx], p.mass[idx], 0.0)
    vel = p.v[idx]
    if cfg.particle_gravity:
        vel = vel + jnp.asarray(cfg.gravity, vel.dtype) * dt
    force = materials.dispatch_force(cfg.active_materials, mat, F, aux, params, vol)
    force = jnp.where(p.active[idx][:, None, None], force, 0.0)
    aff = invD * mass[:, None, None] * C - (invD * cfg.inv_dx * dt) * force
    aff = jnp.where(p.active[idx][:, None, None], aff, 0.0)
    return vel, mass, aff, force


def p2g_correction(
    p, idx, valid, pm, ncdf, bodies, rec, cfg: SimConfig, dt,
    world_off=None, node_data=None,
):
    """Undo the plain scatter at color-incompatible nodes for the
    near-rigid subset; turn it into rigid impulses.

    In the multichip local frame, p.x / grid arrays / cfg are LOCAL and
    `world_off` (3,) shifts node positions back to world coordinates for
    the rigid-dynamics terms (velocity_at / torque arms).

    node_data: optional cdf.stencil_node_data dict for p.x[idx] —
    reuses the (B, 27) record lookups + weights shared with the CDF
    gather and the G2P correction (bitwise-identical values; only
    valid when kernel_order == 2)."""
    K = pm["ids"].shape[0]
    R = bodies.num
    smask = cdf.state_mask(R)
    d = cfg.dim

    x = p.x[idx]
    pstates = p.states[idx]
    bnormal = p.bnormal[idx]
    vel, mass, aff, force = _near_values(p, idx, cfg, dt)
    mv_p = mass[:, None] * vel

    pos = x * cfg.inv_dx
    if node_data is None:
        base, w, dw = bspline_weights(cfg.kernel_order, pos)

    # per-channel FLAT scatters: a (B, 4)-windowed scatter was tried
    # here (round 4) and Mosaic/XLA lowered it to a SERIALIZED per-row
    # loop (~1024 trips/substep in the trace) — flat 1-D scatter-adds
    # stay native. Don't re-window without checking a trace.
    flat = rec.reshape(-1)
    pad = jnp.zeros((256,), flat.dtype)  # scratch row for sentinel slots
    flat = jnp.concatenate([flat, pad])
    J_tot = jnp.zeros((R, d), jnp.float32)
    tau_tot = jnp.zeros((R, 1 if d == 2 else 3), jnp.float32)

    for off in stencil_offsets(d, cfg.kernel_order):
        if node_data is not None:
            nidx, inb, s, nrid, _, wo, gradw, dpos = node_data[off]
        else:
            nidx = base + jnp.asarray(off, jnp.int32)
            dpos = pos - nidx.astype(pos.dtype)
            wo = w[:, 0, off[0]]
            for k in range(1, d):
                wo = wo * w[:, k, off[k]]
            gradw = []
            for k in range(d):
                g = dw[:, k, off[k]]
                for j in range(d):
                    if j != k:
                        g = g * w[:, j, off[j]]
                gradw.append(g * cfg.inv_dx)
            gradw = jnp.stack(gradw, -1)

            inb = jnp.all(
                (nidx >= 0) & (nidx < jnp.asarray(cfg.grid_nodes)), -1
            )
            s, nrid, _ = ncdf.lookup(nidx, inb)
        compat = _compatible(s, pstates, smask)
        hit = valid & inb & (~compat) & (nrid >= 0)

        # subtract the plain scatter w*(mv + A dpos, m)
        mom = mv_p + mv_small(aff, dpos)
        slot, lane = _rec_slot_lane(nidx, pm["slot_map"], cfg)
        lin_base = jnp.where(slot < K, slot * 256, K * 256)
        for c in range(3):
            flat = flat.at[lin_base + c * 64 + lane].add(
                jnp.where(hit, -wo * mom[:, c], 0.0)
            )
        flat = flat.at[lin_base + 192 + lane].add(
            jnp.where(hit, -wo * mass, 0.0)
        )

        # rigid impulse (transfer.cpp:241-252). Small-R scenes use the
        # masked (gather/scatter-free) forms: per-row body gathers and
        # segment-sum scatters cost ~14 ns/row x 27 offsets on the
        # budget-sized near set (VERDICT r3 #3).
        xg = nidx.astype(jnp.float32) * cfg.dx
        if world_off is not None:
            xg = xg + world_off
        if R <= R_UNROLL_MAX:
            rigid_v = velocity_at_masked(bodies, nrid, xg)
            fric = _friction_of_masked(bodies, nrid, pstates)
        else:
            rigid_v = velocity_at(bodies, jnp.clip(nrid, 0, R - 1), xg)
            fric = _friction_of(bodies, nrid, pstates)
        dv = vel - friction_project(vel, rigid_v, bnormal, fric)
        impulse = (mass * wo)[:, None] * dv + dt * mv_small(force, gradw)
        acc_imp = (accumulate_impulses_masked if R <= R_UNROLL_MAX
                   else accumulate_impulses)
        Jo, tauo = acc_imp(bodies, nrid, impulse, xg, hit)
        J_tot = J_tot + Jo
        tau_tot = tau_tot + tauo

    return flat[:-256].reshape(rec.shape), J_tot, tau_tot


def g2p_correction(
    p, idx, valid, pm, ncdf, bodies, vrec, cfg: SimConfig, dt,
    world_off=None, node_data=None,
):
    """Per-offset corrections for the near-rigid subset: replace the
    gathered grid velocity at incompatible nodes by the CPIC ghost value
    (transfer.cpp:620-646). Returns (dv (B,3), dB (B,3,3), rid_last).

    node_data: optional shared cdf.stencil_node_data dict (see
    p2g_correction)."""
    K = pm["ids"].shape[0]
    R = bodies.num
    smask = cdf.state_mask(R)
    d = cfg.dim

    x = p.x[idx]
    pv = p.v[idx]
    pstates = p.states[idx]
    bnormal = p.bnormal[idx]
    near_b = p.near_b[idx]

    pos = x * cfg.inv_dx
    if node_data is None:
        base, w, _ = bspline_weights(cfg.kernel_order, pos)
    # flat per-channel gathers (windowed gathers serialize; see
    # p2g_correction)
    vflat = jnp.concatenate([vrec.reshape(-1), jnp.zeros((192,), vrec.dtype)])

    B = idx.shape[0]
    dv = jnp.zeros((B, d), jnp.float32)
    dB = jnp.zeros((B, d, d), jnp.float32)
    rid_last = jnp.full((B,), -1, jnp.int32)

    for off in stencil_offsets(d, cfg.kernel_order):
        if node_data is not None:
            nidx, inb, s, nrid, _, wo, _, dpos = node_data[off]
        else:
            nidx = base + jnp.asarray(off, jnp.int32)
            dpos = pos - nidx.astype(pos.dtype)
            wo = w[:, 0, off[0]]
            for k in range(1, d):
                wo = wo * w[:, k, off[k]]

            inb = jnp.all(
                (nidx >= 0) & (nidx < jnp.asarray(cfg.grid_nodes)), -1
            )
            s, nrid, _ = ncdf.lookup(nidx, inb)
        compat = _compatible(s, pstates, smask)
        incompat = valid & inb & (~compat)

        slot, lane = _rec_slot_lane(nidx, pm["slot_map"], cfg)
        lin_base = jnp.where(slot < K, slot * 192, K * 192)
        gv = jnp.stack(
            [vflat[lin_base + c * 64 + lane] for c in range(3)], -1
        )

        xg = nidx.astype(jnp.float32) * cfg.dx
        if world_off is not None:
            xg = xg + world_off
        if R <= R_UNROLL_MAX:
            # masked forms: no per-row body gathers (see p2g_correction)
            v_g = velocity_at_masked(bodies, nrid, xg)
            fric = _friction_of_masked(bodies, nrid, pstates)
        else:
            v_g = jnp.where(
                (nrid >= 0)[:, None],
                velocity_at(bodies, jnp.clip(nrid, 0, R - 1), xg), 0.0,
            )
            fric = _friction_of(bodies, nrid, pstates)
        fake_v = jnp.where(
            near_b[:, None],
            friction_project(pv, v_g, bnormal, fric)
            + bnormal * (dt * cfg.dx * cfg.pushing_force),
            pv,
        )
        delta = jnp.where(incompat[:, None], fake_v - gv, 0.0)
        dv = dv + wo[:, None] * delta
        dB = dB + outer(wo[:, None] * delta, dpos)
        rid_last = jnp.where(incompat & (nrid >= 0), nrid, rid_last)

    return dv, dB, rid_last


def rigid_prologue(bodies, scene, cfg: SimConfig, gcfg: SimConfig, dt,
                   Kr: int, world_off=None, rmap=None):
    """The per-substep rigid prologue shared by the pytree and packed
    CPIC paths: coupling_iterations x {rigidify, articulate, rasterize
    CDF} (mpm.cpp:467-471). In multichip mode every shard runs this
    identically on replicated bodies (deterministic, collective-free).
    Returns (bodies, ncdf, n_r, xb_world).

    rmap = (rids, rslot_map, n_r[, chk]) reuses a LAZILY-maintained
    rigid page map (cdf.rigid_page_map_checked) instead of rebuilding
    it (the CDF VALUES are still re-rasterized every call; only the
    block indexing is cached, which is value-neutral while the map
    covers all writes). With the optional 4th element `chk` (the
    checked map's staleness plane) the prologue verifies the plane
    against the ACTUAL post-rigidify boundary positions immediately
    before the rasterize consumes the map, and falls back to an inline
    dilate=4 rebuild via lax.cond when a rigidify/articulate step has
    pushed a particle off the checked set — closing the one-advance gap
    between the caller's between-substep check and the in-substep use
    (the collision projection inside rigidify has no drift bound, so
    the caller's check alone cannot guarantee coverage). Without chk
    the caller owns the guarantee."""
    from taichi_mpm_tpu.rigid import articulation as artic
    from taichi_mpm_tpu.rigid import collision as coll

    R = bodies.num
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
        if world_off is not None:
            xb_g = xb - world_off
            elem_g = elem_w - world_off
        else:
            xb_g, elem_g = xb, elem_w
        if Kr > 0:
            if rmap is not None:
                rids, rslot_map, n_r = rmap[:3]
                if len(rmap) == 4:
                    # use-time exactness gate: the cached map is valid
                    # only while every bp block sits inside the chk
                    # plane; verify on the post-rigidify positions the
                    # rasterize below will actually use (ADVICE r4).
                    bid_now = blocked.block_id_of(xb_g, gcfg)
                    ok = jnp.all(rmap[3][bid_now])
                    rids, rslot_map, n_r = jax.lax.cond(
                        ok,
                        lambda: (rids, rslot_map, n_r),
                        # dilate=4 keeps the compact stage-2 dilated-
                        # tag fast test exact (needs >= 3 at use-time
                        # positions) and matches the lazy map's Kr
                        # sizing.
                        lambda: cdf.rigid_page_map(
                            xb_g, gcfg, Kr, dilate=4
                        ),
                    )
            else:
                rids, rslot_map, n_r = cdf.rigid_page_map(xb_g, gcfg, Kr)
            dist_r, rid_r, states_r, key_r = (
                cdf.rasterize_rigid_boundary_records(
                    xb_g, elem_g, scene.bp_rid, R, gcfg, rslot_map, Kr,
                    return_key=True,
                )
            )
            ncdf = cdf.RecordNodeCDF(
                dist_r, rid_r, states_r, rids, rslot_map, Kr, gcfg,
                num_rigids=R, key=key_r,
            )
        else:
            grid_dist, grid_rid, grid_states, key_d = (
                cdf.rasterize_rigid_boundary(
                    xb_g, elem_g, scene.bp_rid, R, gcfg, return_key=True
                )
            )
            ncdf = cdf.DenseNodeCDF(grid_dist, grid_rid, grid_states, gcfg,
                                    num_rigids=R, key=key_d)
            n_r = jnp.int32(0)
    return bodies, ncdf, n_r, xb


def cpic_blocked_substep_presorted(
    p: Particles, keys, pm, bodies, t, cfg: SimConfig, scene, dt,
    near_budget: int, b1: int = 0, Kr: int = 0,
    interpret: bool = False,
    lcfg: SimConfig = None, world_off=None, axis: str = None,
    origin=None, grid_colliders=None, exchange_fn=None,
):
    """One coupled substep against an existing sort + frozen page map
    (the CPIC analog of ops.substep.substep_presorted — particles may
    have drifted up to ~0.5 cells from their sort-time blocks; the
    7-node halo tiles and the dilated page map absorb that).

    Multichip (shard_map) mode — the reference's coupled transfers
    promoted to the distributed setting (VERDICT r1 #2):
      * lcfg / world_off: the shard's LOCAL grid config and the world
        offset of local cell 0 — positions stay world-global; the CDF
        and page-map machinery run in local coordinates;
      * origin: per-particle block origins ALREADY including the shard
        offset (so prep's block-local coordinates match single-chip);
      * exchange_fn(rec): boundary-record halo exchange, applied AFTER
        the P2G correction (each shard un-scatters only its own
        particles, so the exchange still produces identical complete
        sums on both copies of a boundary column);
      * axis: psum rigid impulses across shards before applying them —
        the reference's apply_tmp_impulse accumulator pattern
        (transfer.cpp:195-197,578-580) over ICI.

    Kr > 0 selects the RECORD-SPARSE CDF (VERDICT r1 #4): the CDF
    lives as (Kr, 64) node records over a rigid page map instead of
    (prod grid_nodes,) dense arrays; Kr = 0 keeps the dense arrays
    (2D / small grids).

    Returns ((p, bodies, t+dt), n_near, n_coarse, n_r, vmax): n_r is
    the rigid-page-map occupancy (0 when dense; driver grows Kr on
    overflow) and vmax the max |v| component actually used for
    advection this substep (for the caller's drift accounting)."""
    from taichi_mpm_tpu.core.solver import clear_boundary_particles
    from taichi_mpm_tpu.core.transfer import particle_collision_resolution
    from taichi_mpm_tpu.rigid import articulation as artic
    from taichi_mpm_tpu.rigid import collision as coll
    from taichi_mpm_tpu.rigid.body import advance

    gcfg = lcfg if lcfg is not None else cfg  # grid-frame config

    def _psum(x):
        return jax.lax.psum(x, axis) if axis is not None else x

    R = bodies.num
    n = p.capacity
    pw = _round_up(n, CHUNK)
    near_budget = min(near_budget, n)
    K = pm["ids"].shape[0]

    bodies, ncdf, n_r, xb = rigid_prologue(
        bodies, scene, cfg, gcfg, dt, Kr, world_off=world_off
    )
    p_loc = (
        dataclasses.replace(p, x=p.x - world_off)
        if world_off is not None else p
    )

    # CDF gather restricted to the compacted near-rigid subset — the
    # particle-level analog of the reference's rigid_page_map skip
    # (rigid_transfer.cpp:147-149). Particles outside the set keep
    # zero/old state correctly: any particle carrying affinity bits is
    # in the set by construction, so leaving the neighborhood clears it.
    idx, valid, n_near, n_coarse = compact_near_rigid_ranges(
        p_loc, keys, pm, ncdf, gcfg, near_budget, b1
    )
    def _sd_lookup(nidx, inb):
        s, _, dist = ncdf.lookup(nidx, inb)
        return s, dist

    st_c, bd_c, bn_c, nb_c = cdf.gather_cdf_lookup(
        p_loc.x[idx], p.states[idx], _sd_lookup, R, gcfg
    )
    n = p.capacity
    states = jnp.zeros((n,), jnp.int32).at[idx].set(jnp.where(valid, st_c, 0))
    bdist = jnp.zeros((n,), jnp.float32).at[idx].set(jnp.where(valid, bd_c, 0.0))
    bnormal = jnp.zeros((n, 3), jnp.float32).at[idx].set(
        jnp.where(valid[:, None], bn_c, 0.0)
    )
    near_b = jnp.zeros((n,), bool).at[idx].set(valid & nb_c)
    p = dataclasses.replace(
        p, states=states, bdist=bdist, bnormal=bnormal, near_b=near_b
    )
    p_loc = dataclasses.replace(
        p_loc, states=states, bdist=bdist, bnormal=bnormal, near_b=near_b
    )

    # -- plain blocked P2G over all particles (already sorted)
    pdata = prep_p2g(
        p, keys, cfg, dt, origin=origin if origin is not None else pm["origin"]
    )
    tiles = p2g_blocked(pm["s_arr"], pm["e_arr"], pdata, interpret=interpret)
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])

    # -- CPIC P2G correction on the compacted near-rigid subset
    # (BEFORE the halo exchange: each shard un-scatters its own
    # particles from its own pre-exchange records)
    rec, J1, tau1 = p2g_correction(
        p_loc, idx, valid, pm, ncdf, bodies, rec, gcfg, dt,
        world_off=world_off,
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

    # -- plain blocked G2P over all particles
    keys2d = jnp.pad(
        pm["slot_keys"][None, :], ((0, 0), (0, pw - n)), constant_values=K
    )
    posg = jnp.pad(pdata[13:16, :pw], ((0, 5), (0, 0)))
    pout = g2p_blocked(keys2d, posg, gtiles, jnp.asarray([K], jnp.int32),
                       interpret=interpret)
    pout = pout[:, :n].T
    v_new = jnp.where(p.active[:, None], pout[:, 0:3], 0.0)
    b_new = jnp.where(p.active[:, None, None], pout[:, 3:12].reshape(n, 3, 3), 0.0)

    # -- CPIC G2P correction
    dv, dB, rid_last_c = g2p_correction(
        p_loc, idx, valid, pm, ncdf, bodies, vrec, gcfg, dt,
        world_off=world_off,
    )
    v_new = v_new.at[idx].add(jnp.where(valid[:, None], dv, 0.0))
    b_new = b_new.at[idx].add(jnp.where(valid[:, None, None], dB, 0.0))
    rid_last = jnp.full((n,), -1, jnp.int32).at[idx].set(
        jnp.where(valid, rid_last_c, -1)
    )

    p, plast = g2p_finish(p, v_new, b_new, cfg, dt, zero_C=p.near_b,
                          return_count=True)
    # the advection this substep used exactly p.v as set by g2p_finish;
    # measure it BEFORE the penalty kick below modifies v
    vmax = jnp.max(jnp.where(p.active[:, None], jnp.abs(p.v), 0.0))

    # -- boundary penetration penalty (transfer.cpp:671-682)
    pen = (
        p.active & p.near_b
        & (p.bdist < -0.05 * cfg.dx) & (p.bdist > -0.3 * cfg.dx)
    )
    dvp = p.bdist[:, None] * p.bnormal * cfg.penalty
    p = dataclasses.replace(p, v=jnp.where(pen[:, None], p.v - dvp, p.v))
    J2, tau2 = accumulate_impulses(
        bodies, jnp.clip(rid_last, 0, R - 1), dvp * p.mass[:, None], p.x,
        pen & (rid_last >= 0),
    )
    bodies = apply_impulses(bodies, _psum(J2), _psum(tau2))

    if cfg.particle_collision:
        p = particle_collision_resolution(p, cfg, scene.colliders, t)
    if cfg.clean_boundary:
        p = clear_boundary_particles(p, cfg)

    bodies = advance(bodies, t, dt, scene.pos_funcs, scene.rot_funcs, cfg.gravity)
    return (p, bodies, t + dt), n_near, n_coarse, n_r, vmax, plast


def cpic_blocked_substep(
    p: Particles, bodies, t, cfg: SimConfig, scene, dt, K: int,
    near_budget: int, b1: int = 0, Kr: int = 0, interpret: bool = False,
):
    """One coupled substep with its own sort + page-map build.
    Returns ((p, bodies, t+dt), n_act, n_near)."""
    p, keys, _ = sort_particles(p, cfg)
    pm = build_page_map_full(keys, cfg, K)
    (p, bodies, t), n_near, n_coarse, _, _, _ = cpic_blocked_substep_presorted(
        p, keys, pm, bodies, t, cfg, scene, dt, near_budget, b1, Kr,
        interpret=interpret,
    )
    B1 = min(b1 if b1 else 4 * near_budget, p.capacity)
    n_near = jnp.where(n_coarse > B1, jnp.maximum(n_near, n_coarse), n_near)
    return (p, bodies, t), pm["n_act"], n_near


def cpic_pack_carry(p: Particles, cfg: SimConfig, K: int):
    """Build the persistent CPIC carry (sorted particles + keys +
    page map + drift) from a Particles pytree."""
    p, keys, _ = sort_particles(p, cfg)
    return (p, keys, build_page_map_full(keys, cfg, K), jnp.float32(0.0))


def cpic_frame_carry(
    carry, bodies, t, cfg: SimConfig, scene, dt, n_substeps: int,
    K: int, near_budget: int, b1: int = 0, Kr: int = 0,
    interpret: bool = False,
):
    """A CPIC frame over a PERSISTENT carry (p, keys, pm, drift): the
    lazy re-sort discipline continues across frames (same contract as
    ops.packed.packed_frame_carry — the driver caches the carry between
    steps and invalidates it when the particle set is mutated).

    Returns (carry, bodies, t, max n_act, max n_near, max n_coarse,
    max n_r, n_sorts, plast)."""
    p, keys, pm, drift0 = carry

    def resort(p):
        p, keys, _ = sort_particles(p, cfg)
        return p, keys, build_page_map_full(keys, cfg, K)

    def body(carry, _):
        (p, keys, pm, bodies, drift, t, nmax, nnear, ncoarse, nr,
         nsorts, plast) = carry
        (p, bodies, t), n_near, n_coarse, n_r, vmax, dplast = (
            cpic_blocked_substep_presorted(
                p, keys, pm, bodies, t, cfg, scene, dt, near_budget, b1,
                Kr, interpret=interpret,
            )
        )
        drift = drift + dt * cfg.inv_dx * vmax
        need = drift >= 0.45

        def do_resort(p):
            # barrier: keep XLA from hoisting the page-map segment ops
            # out of the conditional (see ops.substep.blocked_frame)
            p = jax.lax.optimization_barrier(p)
            return resort(p)

        def keep(p):
            return p, keys, pm

        p, keys, pm = jax.lax.cond(need, do_resort, keep, p)
        drift = jnp.where(need, 0.0, drift)
        nsorts = nsorts + need.astype(jnp.int32)
        return (
            p, keys, pm, bodies, drift, t,
            jnp.maximum(nmax, pm["n_act"]), jnp.maximum(nnear, n_near),
            jnp.maximum(ncoarse, n_coarse), jnp.maximum(nr, n_r), nsorts,
            plast + dplast,
        ), None

    scarry = (
        p, keys, pm, bodies, drift0, t, pm["n_act"],
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        jnp.int32(0),
    )
    (p, keys, pm, bodies, drift, t, nmax, nnear, ncoarse, nr, nsorts,
     plast), _ = (
        jax.lax.scan(body, scarry, None, length=n_substeps)
    )
    return ((p, keys, pm, drift), bodies, t, nmax, nnear, ncoarse, nr,
            nsorts, plast)


def cpic_blocked_frame(
    p: Particles, bodies, t, cfg: SimConfig, scene, dt, n_substeps: int,
    K: int, near_budget: int, b1: int = 0, Kr: int = 0,
    interpret: bool = False,
):
    """A CPIC frame with drift-triggered lazy re-sorting (the CPIC
    analog of ops.substep.blocked_frame): sort once, run substeps
    against the frozen page map, re-sort inside the scan only when the
    accumulated max displacement approaches half a cell.

    Returns (p, bodies, t, max n_act, max n_near, max n_coarse,
    max n_r, n_sorts)."""
    carry = cpic_pack_carry(p, cfg, K)
    carry, bodies, t, nmax, nnear, ncoarse, nr, nsorts, plast = (
        cpic_frame_carry(
            carry, bodies, t, cfg, scene, dt, n_substeps, K, near_budget,
            b1, Kr, interpret=interpret,
        )
    )
    return (carry[0], bodies, t, nmax, nnear, ncoarse, nr, nsorts + 1,
            plast)
