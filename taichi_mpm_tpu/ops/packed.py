"""Packed channel-major particle pipeline: the fused fast path.

The round-1 blocked path kept particle state as (P, 3)/(P, 3, 3)
arrays; every per-particle stage (force/affine prep, plasticity,
advection) materialized dozens of layout-padded intermediates and a
(16, P) -> (P, 16) transpose per substep — measured ~150 ms of the
251 ms 8M-particle substep. Here the frame-scan carry is ONE FLAT
(NCH * Pw,) f32 vector (channel-major: row r occupies
[r*Pw, (r+1)*Pw)), all per-particle physics runs on row slices through
the component-form cores (math/cmat3, materials/cforms), and the Pallas
transfer kernels consume/produce 2-D views with no transposes anywhere.

Why flat 1-D: a (48, Pw) matrix carry lets XLA's layout assignment
flip between row-major (what row slices want) and column-major (what
the sort's transpose wants), inserting two full-state relayout copies
per substep (measured 16 ms/substep at 8M); a 1-D vector has exactly
one layout and its row slices are clean (Pw,) T(1024) vectors.

Semantics mirror ops/substep.py exactly (same formulas, same order):
prep = prep_p2g (transfer.cpp:452-454 affine fusion), finish =
core/transfer.g2p_finish (resample tail, transfer.cpp:659-687), frame =
drift-triggered lazy re-sort (the reference re-sorts every substep,
mpm.cpp:770-918). Differential-tested against the round-1 path
(tests/test_packed.py).

Row layout (int rows bitcast to f32):
   0-2  x        15-23 C         28-35 params
   3-5  v        24    aux       36    active (0/1)
   6-14 F        25    mass      37    states (int)  38 bdist
                 26    vol       39-41 bnormal       42 near_b (0/1)
                 27    mat (int)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import Particles
from taichi_mpm_tpu.materials import cforms
from taichi_mpm_tpu.math.kernels import inv_D
from taichi_mpm_tpu.ops import blocked
from taichi_mpm_tpu.ops.blocked import BLOCK
from taichi_mpm_tpu.ops.g2p_pallas import g2p_blocked
from taichi_mpm_tpu.ops.p2g_pallas import (
    BATCH,
    CHUNK,
    p2g_blocked,
    p2g_blocked_batched,
)
from taichi_mpm_tpu.ops.substep import grid_update_flat
from taichi_mpm_tpu.ops.rows import (  # noqa: F401  (layout lives in rows.py)
    NCH,
    RACT,
    RAUX,
    RBDIST,
    RBN,
    RC,
    RF,
    RMASS,
    RMAT,
    RMATF,
    RNEARB,
    RORG,
    RPAR,
    RSTATES,
    RV,
    RVOL,
    RX,
)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def padded_width(capacity: int) -> int:
    return _round_up(capacity, CHUNK)


def row(st, r, pw):
    """Channel row r of the packed state: a (pw,) slice. Accepts the
    flat (NCH*pw,) form (unfused carry) or the 2-D (NCH, pw) form (the
    FUSED carry — see fused_substep_presorted for why the forms differ
    on TPU)."""
    if st.ndim == 2:
        return st[r]
    return jax.lax.slice(st, (r * pw,), ((r + 1) * pw,))


def state_width(st) -> int:
    """Lane width pw of a packed state in either form."""
    return st.shape[-1] if st.ndim == 2 else st.shape[0] // NCH


# -- conversions ------------------------------------------------------------


def pack_particles(p: Particles) -> jnp.ndarray:
    """Particles pytree -> flat (NCH * Pw,) channel-major state."""
    P = p.capacity
    pw = padded_width(P)

    def bits(a):
        return jax.lax.bitcast_convert_type(a, jnp.float32)

    rows = [p.x[:, k] for k in range(3)]
    rows += [p.v[:, k] for k in range(3)]
    rows += [p.F[:, i, j] for i in range(3) for j in range(3)]
    rows += [p.C[:, i, j] for i in range(3) for j in range(3)]
    rows += [p.aux, p.mass, p.vol, bits(p.mat)]
    rows += [p.params[:, k] for k in range(8)]
    rows += [p.active.astype(jnp.float32), bits(p.states), p.bdist]
    rows += [p.bnormal[:, k] for k in range(3)]
    rows += [p.near_b.astype(jnp.float32)]
    rows += [jnp.zeros((P,), jnp.float32)] * (RMATF - len(rows))
    rows += [p.mat.astype(jnp.float32)]  # row 47: material id as value
    return jnp.concatenate([jnp.pad(r, (0, pw - P)) for r in rows])


def unpack_particles(st: jnp.ndarray, capacity: int) -> Particles:
    """Packed state (either form) -> Particles (frame exit)."""
    pw = state_width(st)

    def s(r):
        return row(st, r, pw)[:capacity]

    def ints(r):
        return jax.lax.bitcast_convert_type(s(r), jnp.int32)

    def m33(r0):
        rows = [jnp.stack([s(r0 + 3 * i + j) for j in range(3)], -1)
                for i in range(3)]
        return jnp.stack(rows, -2)

    return Particles(
        x=jnp.stack([s(RX + k) for k in range(3)], -1),
        v=jnp.stack([s(RV + k) for k in range(3)], -1),
        F=m33(RF),
        C=m33(RC),
        aux=s(RAUX),
        mass=s(RMASS),
        vol=s(RVOL),
        mat=ints(RMAT),
        params=jnp.stack([s(RPAR + k) for k in range(8)], -1),
        active=s(RACT) > 0.5,
        states=ints(RSTATES),
        bdist=s(RBDIST),
        bnormal=jnp.stack([s(RBN + k) for k in range(3)], -1),
        near_b=s(RNEARB) > 0.5,
    )


# -- sort + page map --------------------------------------------------------


def _keys_of(st, cfg: SimConfig):
    """Padded block id per lane (sentinel = total for inactive/pad)."""
    pw = state_width(st)
    nbp = blocked.num_blocks_padded(cfg)
    total = blocked.total_blocks_padded(cfg)
    act = row(st, RACT, pw) > 0.5
    bid = jnp.zeros((pw,), jnp.int32)
    res = cfg.res
    for k, n in enumerate(nbp):
        cell = jnp.clip(
            jnp.floor(row(st, RX + k, pw) * cfg.inv_dx).astype(jnp.int32),
            0, res[k] - 1,
        )
        bid = bid * n + cell // BLOCK
    return jnp.where(act, bid, total)


GATHER_PAD = 64  # row width for the transpose-gather (lane-count multiple)


def sort_packed(st, cfg: SimConfig):
    """Sort lanes by block id. The permutation runs as reshape ->
    transpose -> wide-row gather -> transpose -> flatten; the barriers
    force that staging (fused, XLA canonicalizes to a lane-axis gather
    that measured 3-4x slower). The gather itself is per-row-overhead
    bound (~14 ns/row, locality-independent), so this only runs on the
    drift-triggered lazy re-sorts. Accepts/returns either state form."""
    pw = state_width(st)
    keys = _keys_of(st, cfg)
    # one sort pass yields BOTH the sorted keys and the permutation
    # (argsort + keys[order] re-gather costs an extra ~50 ms at 8M)
    keys_sorted, order = jax.lax.sort_key_val(
        keys, jnp.arange(pw, dtype=jnp.int32), is_stable=True
    )
    st2 = st if st.ndim == 2 else st.reshape(NCH, pw)
    stT = jax.lax.optimization_barrier(
        jnp.pad(st2.T, ((0, 0), (0, GATHER_PAD - NCH)))
    )
    g = jax.lax.optimization_barrier(stT[order])
    st_sorted = g[:, :NCH].T
    if st.ndim == 1:
        st_sorted = st_sorted.reshape(-1)
    return st_sorted, keys_sorted


def annotate_origins(st, keys, cfg: SimConfig):
    """Write rows RORG..RORG+2 = the sort-time block origin (grid
    units) of every lane. Called at every (re-)sort; static between
    sorts, which is exactly the lazy-sort contract (particles stay
    within half a cell of this block). The fused Pallas kernels read
    these rows to reconstruct block-local positions in-kernel."""
    pw = state_width(st)
    ox, oy, oz = _origin_rows(keys, cfg)
    if st.ndim == 2:
        return jax.lax.dynamic_update_slice(
            st, jnp.stack([ox, oy, oz]), (RORG, 0)
        )
    return jax.lax.dynamic_update_slice(
        st, jnp.concatenate([ox, oy, oz]), (RORG * pw,)
    )


def sort_and_map(st, cfg: SimConfig, K: int):
    """sort + origin annotation + page map: the one true (re)sort entry
    for the packed paths."""
    st, keys = sort_packed(st, cfg)
    st = annotate_origins(st, keys, cfg)
    pm = build_page_map_packed(keys, cfg, K)
    return st, keys, pm


def build_page_map_packed(keys, cfg: SimConfig, K: int):
    """Page map + neighbor table + per-lane slot keys (no (P, 3) origin
    array: prep recomputes origins from keys as rows)."""
    nb_total = blocked.total_blocks_padded(cfg)
    ids, n_act, slot_map, s_arr, e_arr = blocked.build_page_map(keys, cfg, K)
    nbr = blocked.neighbor_slots(ids, slot_map, cfg)
    slot_keys = slot_map[jnp.minimum(keys, nb_total)]
    # slot_keys2d: the (1, Pw) form the G2P kernels consume. Staged here
    # (at sort time) because the (Pw,)->(1,Pw) reshape is a T(1024) ->
    # T(8,128) relayout on TPU (~1 ms/substep at 8M if done per substep).
    return dict(
        ids=ids, n_act=n_act, s_arr=s_arr, e_arr=e_arr, nbr=nbr,
        slot_keys=slot_keys, slot_keys2d=slot_keys[None, :],
        slot_map=slot_map,
    )


# -- prep (the packed prep_p2g) --------------------------------------------


def _origin_rows(keys, cfg: SimConfig):
    """Padded block id row -> block origin rows in grid units."""
    nbx, nby, nbz = blocked.num_blocks_padded(cfg)
    safe = jnp.minimum(keys, nbx * nby * nbz - 1)
    bz = safe % nbz
    by = (safe // nbz) % nby
    bx = safe // (nbz * nby)
    f = float(BLOCK)
    return (bx.astype(jnp.float32) * f, by.astype(jnp.float32) * f,
            bz.astype(jnp.float32) * f)


def prep_packed(st, keys, cfg: SimConfig, dt):
    """Build the P2G operand (16, Pw + CHUNK) from packed state rows
    (same values as ops.substep.prep_p2g: mv(3), mass, fused affine
    A(9), block-local pos(3))."""
    pw = state_width(st)
    invD = inv_D(cfg.kernel_order)
    act = row(st, RACT, pw) > 0.5
    ox, oy, oz = _origin_rows(keys, cfg)
    px = row(st, RX + 0, pw) * cfg.inv_dx - ox
    py = row(st, RX + 1, pw) * cfg.inv_dx - oy
    pz = row(st, RX + 2, pw) * cfg.inv_dx - oz

    v = [row(st, RV + k, pw) for k in range(3)]
    if cfg.particle_gravity:
        v = [v[k] + cfg.gravity[k] * dt for k in range(3)]
    F = tuple(row(st, RF + k, pw) for k in range(9))
    C = tuple(row(st, RC + k, pw) for k in range(9))
    aux = row(st, RAUX, pw)
    params = tuple(row(st, RPAR + k, pw) for k in range(8))
    vol = row(st, RVOL, pw)
    mat = jax.lax.bitcast_convert_type(row(st, RMAT, pw), jnp.int32)
    force = cforms.dispatch_force(cfg.active_materials, mat, F, aux, params, vol)
    mass = jnp.where(act, row(st, RMASS, pw), 0.0)
    cf_scale = invD * cfg.inv_dx * dt
    A = tuple(
        jnp.where(act, invD * mass * c - cf_scale * f, 0.0)
        for c, f in zip(C, force)
    )
    rows = [mass * v[0], mass * v[1], mass * v[2], mass]
    rows += list(A)
    rows += [px, py, pz]
    pdata = jnp.stack([jnp.pad(r, (0, CHUNK)) for r in rows], 0)
    return pdata, (px, py, pz)


# -- finish (the packed g2p_finish) ----------------------------------------


def finish_packed(st, pout, cfg: SimConfig, dt, zero_C=None):
    """Tail of G2P on rows: APIC damping, MLS F-update, plasticity,
    advection, clamp, NaN robustness (core/transfer.g2p_finish,
    transfer.cpp:659-687). pout rows: v(3), B row-major(9), pad(4).
    Newly-deactivated (NaN) lanes get their slots zeroed (x=v=C=0,
    F=I) so downstream substeps never see non-finite values — the pool
    analog of the reference deleting the particle (mpm.cpp:582-633).

    Returns (st_new, vmax, plast_count): vmax is the max |v| component
    used for advection (drift accounting), plast_count the number of
    plasticity/cutting events (reference work counters, mpm.h:111-112).
    Accepts either state form and preserves it (the 2-D (NCH, Pw) form
    is the fused-carry layout, see fused_substep_presorted).
    """
    pw = state_width(st)
    invD = inv_D(cfg.kernel_order)
    act = row(st, RACT, pw) > 0.5
    v_new = tuple(jnp.where(act, pout[k], 0.0) for k in range(3))
    B = tuple(jnp.where(act, pout[3 + k], 0.0) for k in range(9))

    # RPIC/APIC damping (mpm.h:465-469)
    if cfg.apic:
        sym_w = 1.0 - cfg.rpic_damping
        skew_w = 1.0 - cfg.apic_damping
        C_new = []
        for i in range(3):
            for j in range(3):
                bij, bji = B[3 * i + j], B[3 * j + i]
                s = 0.5 * (bij + bji)
                C_new.append(sym_w * s + skew_w * (bij - s))
        C_new = tuple(C_new)
    else:
        C_new = tuple(jnp.zeros_like(B[0]) for _ in range(9))
    if zero_C is not None:
        C_new = tuple(jnp.where(zero_C, 0.0, c) for c in C_new)

    # MLS F-update cdg = I - invD dt inv_dx B (transfer.cpp:659-661)
    k = invD * dt * cfg.inv_dx
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    cdg = tuple(e - k * b for e, b in zip(eye, B))

    F = tuple(row(st, RF + i, pw) for i in range(9))
    aux = row(st, RAUX, pw)
    params = tuple(row(st, RPAR + i, pw) for i in range(8))
    mat = jax.lax.bitcast_convert_type(row(st, RMAT, pw), jnp.int32)
    F_new, aux_new, cnt = cforms.dispatch_plasticity(
        cfg.active_materials, mat, F, cdg, aux, params, dt
    )

    hi = [(cfg.res[kk] - cfg.clamp_eps) * cfg.dx for kk in range(3)]
    x_new = tuple(
        jnp.clip(row(st, RX + kk, pw) + dt * v_new[kk], 0.0, hi[kk])
        for kk in range(3)
    )

    finite = jnp.ones_like(act)
    for r in x_new + v_new + F_new:
        finite = finite & jnp.isfinite(r)
    act_new = act & finite
    dead = act & ~finite  # newly deactivated: scrub the slot
    keep = act_new

    def sel(new, old, cleanup=0.0):
        return jnp.where(keep, new, jnp.where(dead, cleanup, old))

    rows = [sel(x_new[kk], row(st, RX + kk, pw)) for kk in range(3)]
    rows += [sel(v_new[kk], row(st, RV + kk, pw)) for kk in range(3)]
    rows += [sel(F_new[i], row(st, RF + i, pw), cleanup=eye[i]) for i in range(9)]
    rows += [sel(C_new[i], row(st, RC + i, pw)) for i in range(9)]
    rows += [jnp.where(keep, aux_new, aux)]
    rows += [row(st, RMASS, pw), row(st, RVOL, pw), row(st, RMAT, pw)]
    rows += [row(st, RPAR + i, pw) for i in range(8)]
    rows += [act_new.astype(jnp.float32)]
    rows += [row(st, RSTATES, pw), row(st, RBDIST, pw)]
    rows += [row(st, RBN + i, pw) for i in range(3)]
    rows += [row(st, RNEARB, pw)]
    # annotation rows (sort-time origins, matf) pass through unchanged
    rows += [row(st, r, pw) for r in range(43, NCH)]
    st_new = jnp.stack(rows) if st.ndim == 2 else jnp.concatenate(rows)
    vmax = jnp.max(
        jnp.stack([jnp.max(jnp.where(act_new, jnp.abs(v), 0.0)) for v in v_new])
    )
    plast = jnp.sum(jnp.where(act_new, cnt, 0))
    return st_new, vmax, plast


def clean_boundary_packed(st, cfg: SimConfig):
    """Deactivate lanes within 7 cells of the domain edge
    (clear_boundary_particles, mpm.h:269-276)."""
    pw = state_width(st)
    act = row(st, RACT, pw) > 0.5
    near = jnp.zeros_like(act)
    for k in range(3):
        pos = row(st, RX + k, pw) * cfg.inv_dx
        near = near | (pos < 7.0) | (pos > cfg.res[k] - 7.0)
    new_act = (act & ~near).astype(jnp.float32)
    if st.ndim == 2:
        return jax.lax.dynamic_update_slice(st, new_act[None], (RACT, 0))
    return jax.lax.dynamic_update_slice(st, new_act, (RACT * pw,))


def particle_collision_packed(st, cfg: SimConfig, colliders, t):
    """Per-particle levelset projection (mpm.cpp:414-427) on rows."""
    from taichi_mpm_tpu.core.levelset import DirichletRegion

    pw = state_width(st)
    act = row(st, RACT, pw) > 0.5
    x = [row(st, RX + k, pw) for k in range(3)]
    v = [row(st, RV + k, pw) for k in range(3)]
    xg = jnp.stack(x, -1)
    for c in colliders:
        if isinstance(c, DirichletRegion):
            continue
        phi = c.sdf(xg, t)
        grad = c.normal(xg, t, eps=0.5 * cfg.dx)
        hit = act & (phi < 0.0)
        g = [grad[..., k] for k in range(3)]
        x = [jnp.where(hit, xi - gi * phi, xi) for xi, gi in zip(x, g)]
        vn = sum(gi * vi for gi, vi in zip(g, v))
        v = [jnp.where(hit, vi - vn * gi, vi) for vi, gi in zip(v, g)]
        xg = jnp.stack(x, -1)
    if st.ndim == 2:
        return jax.lax.dynamic_update_slice(st, jnp.stack(x + v), (RX, 0))
    st = jax.lax.dynamic_update_slice(st, jnp.concatenate(x + v), (RX * pw,))
    return st


# -- the packed substep / frame --------------------------------------------


def fused_substep_presorted(
    st, pm, t, cfg: SimConfig, colliders, dt, interpret: bool = False,
    gcfg: SimConfig = None, grid_colliders=None, exchange_fn=None,
):
    """One substep with the FULLY-FUSED kernels (ops/fused_pallas):
    prep runs inside the P2G kernel, finish inside the G2P kernel, and
    each state chunk crosses HBM once per kernel. Requires the carry to
    be sorted via sort_and_map (origin rows annotated).

    Multichip (shard_map) hooks, mirroring rigid/cpic_packed: `gcfg` is
    the shard-LOCAL grid config for block-id -> node-coordinate
    decoding in the grid update (positions and the RORG origin rows
    stay global-consistent, so the kernels need no hook);
    `grid_colliders` are the scene colliders shifted into that local
    frame; `exchange_fn` sums the slab-boundary record columns between
    the halo merge and the grid update.

    State form: accepts flat (NCH*Pw,) or 2-D (NCH, Pw) and returns the
    same form. On TPU the two have DIFFERENT memory layouts (flat is
    linear T(1024); 2-D is tile-interleaved T(8,128)), so the
    flat<->2-D reshape is NOT a bitcast: XLA lowers it as a rolled
    48-iteration dynamic-slice/update loop costing ~77 ms/substep at 8M
    (measured, round 3). Fused frame drivers must therefore carry the
    2-D form — the kernels' native layout — so no per-substep relayout
    exists; flat callers (multichip/async paths not yet migrated) still
    work but pay the relayout."""
    from taichi_mpm_tpu.ops import fused_pallas

    if gcfg is None:
        gcfg = cfg
    if grid_colliders is None:
        grid_colliders = colliders
    K = pm["ids"].shape[0]
    st2d = st if st.ndim == 2 else st.reshape(NCH, state_width(st))
    tiles = fused_pallas.p2g_fused(
        pm["s_arr"], pm["e_arr"], st2d, dt, cfg, interpret=interpret
    )
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
    if exchange_fn is not None:
        rec = exchange_fn(rec)
    vrec = grid_update_flat(rec, pm["ids"], gcfg, grid_colliders, t, dt)
    gtiles = blocked.windows_mm(vrec, pm["nbr"])
    keys2d = pm.get("slot_keys2d")
    if keys2d is None:  # pm built before slot_keys2d existed (checkpoints)
        keys2d = pm["slot_keys"][None, :]
    st2d, vmaxw, plastw = fused_pallas.g2p_fused(
        keys2d, st2d, gtiles,
        jnp.asarray([K], jnp.int32), dt, cfg, interpret=interpret,
    )
    st_out = st2d if st.ndim == 2 else st2d.reshape(-1)
    if cfg.particle_collision:
        st_out = particle_collision_packed(st_out, cfg, colliders, t)
    if cfg.clean_boundary:
        st_out = clean_boundary_packed(st_out, cfg)
    return (st_out, t + dt), pm["n_act"], jnp.max(vmaxw), jnp.sum(plastw)


def packed_substep_presorted(
    st, keys, pm, t, cfg: SimConfig, colliders, dt, interpret: bool = False,
    fused: bool = False,
):
    """One substep against a frozen sort/page map (the packed twin of
    ops.substep.substep_presorted; exact while every particle is within
    half a cell of its sort-time block)."""
    if fused:
        return fused_substep_presorted(
            st, pm, t, cfg, colliders, dt, interpret=interpret
        )
    K = pm["ids"].shape[0]
    pw = state_width(st)

    pdata, (px, py, pz) = prep_packed(st, keys, cfg, dt)
    p2g = p2g_blocked_batched if K % BATCH == 0 else p2g_blocked
    tiles = p2g(pm["s_arr"], pm["e_arr"], pdata, interpret=interpret)
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
    vrec = grid_update_flat(rec, pm["ids"], cfg, colliders, t, dt)
    gtiles = blocked.windows_mm(vrec, pm["nbr"])

    keys2d = pm["slot_keys"][None, :]
    zero = jnp.zeros((pw,), jnp.float32)
    posg = jnp.stack([px, py, pz, zero, zero, zero, zero, zero], 0)
    pout = g2p_blocked(keys2d, posg, gtiles, jnp.asarray([K], jnp.int32),
                       interpret=interpret)

    st, vmax, plast = finish_packed(
        st, tuple(pout[i] for i in range(12)), cfg, dt
    )
    if cfg.particle_collision:
        st = particle_collision_packed(st, cfg, colliders, t)
    if cfg.clean_boundary:
        st = clean_boundary_packed(st, cfg)
    return (st, t + dt), pm["n_act"], vmax, plast


def dt_limit_packed(st, cfg: SimConfig, strength_dt_mul=1.0, cfl_dt_mul=1.0):
    """Global allowed dt on packed rows (core/adaptive.dt_limit: material
    sound-speed CFL x strength_dt_mul, advection CFL x cfl_dt_mul,
    min-reduced over active lanes; async_mpm.cpp:90-254)."""
    pw = state_width(st)
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
    )
    big = jnp.float32(1e30)
    strength = jnp.min(jnp.where(act, a_dt, big)) * strength_dt_mul
    vmax = jnp.max(jnp.where(act, speed, 0.0))
    cfl = cfl_dt_mul * cfg.dx / jnp.maximum(vmax, 1e-30)
    return jnp.minimum(strength, cfl)


def packed_adaptive_frame(
    p: Particles, t, cfg: SimConfig, colliders, frame_dt, unit_dt, max_dt,
    K: int, strength_dt_mul=1.0, cfl_dt_mul=1.0, max_substeps: int = 100000,
    interpret: bool = False, fused: bool = False,
):
    """Adaptive-dt frame ON THE PACKED PALLAS PATH (VERDICT r1 item 3:
    the round-1 AsyncMPM ran the oracle substep only). Data-dependent
    substep count via lax.while_loop; dt is a traced scalar through
    prep/finish; POT snapping as core/adaptive.snap_pot
    (async_mpm.cpp:112-118). Returns (p, t, n_substeps, max n_act)."""
    from taichi_mpm_tpu.core.adaptive import snap_pot

    cap = p.capacity
    st0 = pack_particles(p)
    if fused:
        st0 = st0.reshape(NCH, -1)  # the fused carry form (no relayout/substep)

    def resort(st):
        return sort_and_map(st, cfg, K)

    st, keys, pm = resort(st0)
    t_end = t + frame_dt

    def not_done(tt, n):
        return (tt < t_end - 1e-9) & (n < max_substeps)

    # two-level loop for the same reason as packed_frame_carry: keep
    # the resort cond (and its full-state branch copies / sort layout
    # pressure) out of the per-substep body
    def inner_cond(c):
        st, keys, pm, drift, tt, n = c
        return not_done(tt, n) & (drift < 0.45)

    def inner_body(c):
        st, keys, pm, drift, tt, n = c
        dt = dt_limit_packed(st, cfg, strength_dt_mul, cfl_dt_mul)
        dt = snap_pot(dt, unit_dt, max_dt)
        dt = jnp.minimum(dt, t_end - tt)
        (st, tt), _, vmax, _ = packed_substep_presorted(
            st, keys, pm, tt, cfg, colliders, dt, interpret=interpret,
            fused=fused,
        )
        return (st, keys, pm, drift + dt * cfg.inv_dx * vmax, tt, n + 1)

    def outer_cond(c):
        st, keys, pm, drift, tt, n, nmax = c
        return not_done(tt, n) | (drift >= 0.45)

    def outer_body(c):
        st, keys, pm, drift, tt, n, nmax = c
        st, keys, pm, drift, tt, n = jax.lax.while_loop(
            inner_cond, inner_body, (st, keys, pm, drift, tt, n)
        )
        need = drift >= 0.45

        def do_resort(st):
            return resort(jax.lax.optimization_barrier(st))

        def keep(st):
            return st, keys, pm

        st, keys, pm = jax.lax.cond(need, do_resort, keep, st)
        drift = jnp.where(need, 0.0, drift)
        return (st, keys, pm, drift, tt, n, jnp.maximum(nmax, pm["n_act"]))

    carry = (st, keys, pm, jnp.float32(0.0), t, jnp.int32(0), pm["n_act"])
    st, keys, pm, _, t, n, nmax = jax.lax.while_loop(
        outer_cond, outer_body, carry
    )
    return unpack_particles(st, cap), t, n, nmax


def packed_frame_carry(
    carry, t, cfg: SimConfig, colliders, dt, n_substeps: int, K: int,
    interpret: bool = False, fused: bool = False,
):
    """A frame over a PERSISTENT packed carry (st, keys, pm, drift):
    no frame-edge pack/sort — the lazy re-sort discipline continues
    seamlessly across frames (the driver caches the carry between
    MPM.step calls and invalidates it whenever the particle set is
    mutated outside the frame loop). Returns
    (carry, t, max n_act, n_sorts, plast_count).

    Loop structure: TWO-LEVEL. The inner while runs pure substeps and
    breaks when cumulative drift crosses the 0.45-cell lazy-sort bound;
    the outer loop re-sorts and re-enters. The older single scan with a
    per-substep resort `lax.cond` cost ~17 ms/substep at 8M on TPU:
    the cond's untaken identity branch still copies the full state
    (branch-output buffer unification), and the sort transpose inside
    the cond made XLA flip the carry to column-major, adding a second
    relayout copy per substep. With the resort outside the hot loop
    the carry's only consumers are the transfer kernels, so its layout
    is stable and the substep body is copy-free. The (substep, resort)
    event sequence is IDENTICAL to the single-level version."""
    st, keys, pm, drift0 = carry

    def inner_cond(c):
        st, keys, pm, drift, t, n, plast = c
        return (n < n_substeps) & (drift < 0.45)

    def inner_body(c):
        st, keys, pm, drift, t, n, plast = c
        (st, t), _, vmax, dplast = packed_substep_presorted(
            st, keys, pm, t, cfg, colliders, dt, interpret=interpret,
            fused=fused,
        )
        return (st, keys, pm, drift + dt * cfg.inv_dx * vmax, t, n + 1,
                plast + dplast)

    def outer_cond(c):
        st, keys, pm, drift, t, n, nmax, nsorts, plast = c
        return (n < n_substeps) | (drift >= 0.45)

    def outer_body(c):
        st, keys, pm, drift, t, n, nmax, nsorts, plast = c
        st, keys, pm, drift, t, n, plast = jax.lax.while_loop(
            inner_cond, inner_body, (st, keys, pm, drift, t, n, plast)
        )
        need = drift >= 0.45

        def do_resort(st):
            return sort_and_map(jax.lax.optimization_barrier(st), cfg, K)

        def keep(st):
            return st, keys, pm

        st, keys, pm = jax.lax.cond(need, do_resort, keep, st)
        drift = jnp.where(need, 0.0, drift)
        nsorts = nsorts + need.astype(jnp.int32)
        return (st, keys, pm, drift, t, n, jnp.maximum(nmax, pm["n_act"]),
                nsorts, plast)

    wcarry = (st, keys, pm, drift0, t, jnp.int32(0), pm["n_act"],
              jnp.int32(0), jnp.int32(0))
    st, keys, pm, drift, t, _, nmax, nsorts, plast = jax.lax.while_loop(
        outer_cond, outer_body, wcarry
    )
    return (st, keys, pm, drift), t, nmax, nsorts, plast


def pack_carry(p: Particles, cfg: SimConfig, K: int, two_d: bool = False):
    """Build the persistent packed carry from a Particles pytree.
    two_d=True keeps the state in the (NCH, Pw) form — REQUIRED for the
    fused frame drivers (see fused_substep_presorted: the flat<->2-D
    conversion is a ~77 ms relayout at 8M, paid here ONCE instead of
    twice per substep)."""
    st = pack_particles(p)
    if two_d:
        st = st.reshape(NCH, -1)
    st, keys, pm = sort_and_map(st, cfg, K)
    return (st, keys, pm, jnp.float32(0.0))


def packed_frame(
    p: Particles, t, cfg: SimConfig, colliders, dt, n_substeps: int, K: int,
    interpret: bool = False, fused: bool = False,
):
    """A frame on the packed path with drift-triggered lazy re-sorting.
    Takes/returns a Particles pytree (pack/sort/unpack at the frame
    edges); returns (p, t, max n_act, n_sorts, plast_count)."""
    cap = p.capacity
    carry = pack_carry(p, cfg, K, two_d=fused)
    carry, t, nmax, nsorts, plast = packed_frame_carry(
        carry, t, cfg, colliders, dt, n_substeps, K, interpret=interpret,
        fused=fused,
    )
    return unpack_particles(carry[0], cap), t, nmax, nsorts + 1, plast
