"""Multi-chip spatial decomposition on a 2-D (x, y) device mesh.

Generalizes parallel/spatial_blocked.py's 1-D slabs to pencils: each
shard owns a (Wcx, Wcy, res_z) column of the domain plus one ghost
block per side in x AND y. The same lazy-sort machinery runs per shard
in the local block frame; the boundary-record exchange runs as TWO
sequential single-axis exchanges (x planes, then y planes) — the
separable-composition argument from the halo merge applies: a corner
(diagonal-neighbor) contribution reaches its destination through the
x-exchange of the diagonal's x-neighbor followed by that shard's
y-exchange, because the y-planes span the full local x extent
including the x-ghost columns. Cross-shard migration at re-sort time
likewise hops x first, then y (a diagonal migrant is forwarded by the
intermediate shard within the same re-sort event).

This is the scaling shape a pod wants: a (Sx, Sy) mesh over ICI with
ring ppermutes per axis, res_x/res_y divisible by 4*Sx / 4*Sy.
"""

from __future__ import annotations

import dataclasses

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

GHOST_CELLS = 4


def pencil_cells(cfg: SimConfig, shards, axis_i: int) -> int:
    n = shards[axis_i]
    assert cfg.res[axis_i] % (4 * n) == 0, (
        f"res[{axis_i}]={cfg.res[axis_i]} must divide by 4*shards={4 * n}"
    )
    return cfg.res[axis_i] // n


def local_config(cfg: SimConfig, shards) -> SimConfig:
    Wx = pencil_cells(cfg, shards, 0)
    Wy = pencil_cells(cfg, shards, 1)
    return dataclasses.replace(
        cfg, res=(Wx + 2 * GHOST_CELLS, Wy + 2 * GHOST_CELLS, cfg.res[2]),
        dx=cfg.dx,
    )


def shard_offsets_cells(sx, sy, cfg: SimConfig, shards):
    Wx = pencil_cells(cfg, shards, 0)
    Wy = pencil_cells(cfg, shards, 1)
    return (
        (sx * Wx - GHOST_CELLS).astype(jnp.float32),
        (sy * Wy - GHOST_CELLS).astype(jnp.float32),
    )


def _local_keys(p: Particles, offx, offy, cfg: SimConfig, lcfg: SimConfig):
    off = jnp.stack([offx * cfg.dx, offy * cfg.dx,
                     jnp.zeros_like(offx)], -1)
    total = blocked.total_blocks_padded(lcfg)
    return jnp.where(
        p.active, blocked.block_id_of(p.x - off, lcfg), total
    )


def _axis_planes(rec, pm, lcfg: SimConfig, axis_i: int, cols):
    """Gather the records of whole block planes perpendicular to
    axis_i (0 = x planes over (by, bz); 1 = y planes over (bx, bz))."""
    nbp = blocked.num_blocks_padded(lcfg)
    K = pm["ids"].shape[0]
    planes = []
    for col in cols:
        if axis_i == 0:
            a = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
            b = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
            bid = (col * nbp[1] + a) * nbp[2] + b
        else:
            a = jnp.arange(nbp[0], dtype=jnp.int32)[:, None]
            b = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
            bid = (a * nbp[1] + col) * nbp[2] + b
        slot = pm["slot_map"][bid]
        ok = slot < K
        planes.append(
            jnp.where(ok[..., None], rec[jnp.minimum(slot, K - 1)], 0.0)
        )
    return jnp.stack(planes, 0)


def _add_axis_planes(rec, pm, lcfg: SimConfig, axis_i: int, cols, planes):
    nbp = blocked.num_blocks_padded(lcfg)
    K = pm["ids"].shape[0]
    for i, col in enumerate(cols):
        if axis_i == 0:
            a = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
            b = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
            bid = (col * nbp[1] + a) * nbp[2] + b
        else:
            a = jnp.arange(nbp[0], dtype=jnp.int32)[:, None]
            b = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
            bid = (a * nbp[1] + col) * nbp[2] + b
        slot = pm["slot_map"][bid]
        ok = (slot < K)[..., None]
        rec = rec.at[jnp.minimum(slot, K - 1).reshape(-1)].add(
            jnp.where(ok, planes[i], 0.0).reshape(-1, rec.shape[-1])
        )
    return rec


def _exchange_axis(rec, pm, lcfg, mesh_axis: str, n_shards: int, Wb: int,
                   axis_i: int):
    lo_cols = (0, 1)
    hi_cols = (Wb, Wb + 1)
    lo = _axis_planes(rec, pm, lcfg, axis_i, lo_cols)
    hi = _axis_planes(rec, pm, lcfg, axis_i, hi_cols)
    right = [(i, i + 1) for i in range(n_shards - 1)]
    left = [(i + 1, i) for i in range(n_shards - 1)]
    from_left = jax.lax.ppermute(hi, mesh_axis, right)
    from_right = jax.lax.ppermute(lo, mesh_axis, left)
    rec = _add_axis_planes(rec, pm, lcfg, axis_i, lo_cols, from_left)
    rec = _add_axis_planes(rec, pm, lcfg, axis_i, hi_cols, from_right)
    return rec


def _zero_edge_ghosts(rec, pm, lcfg, s, n_shards: int, axis_i: int):
    """Zero the ghost plane outside the global domain on edge shards
    (both low col 0 for shard 0 and high col nb-1... the high padded
    block col already has no owner on interior shards; only the LOW
    ghost plane maps to global block -1)."""
    K = pm["ids"].shape[0]
    planes = _axis_planes(rec, pm, lcfg, axis_i, (0,))
    nbp = blocked.num_blocks_padded(lcfg)
    if axis_i == 0:
        a = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
        b = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
        bid0 = (0 * nbp[1] + a) * nbp[2] + b
    else:
        a = jnp.arange(nbp[0], dtype=jnp.int32)[:, None]
        b = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
        bid0 = (a * nbp[1] + 0) * nbp[2] + b
    slot0 = pm["slot_map"][bid0]
    ok0 = ((slot0 < K) & (s == 0))[..., None]
    rec = rec.at[jnp.minimum(slot0, K - 1).reshape(-1)].multiply(
        jnp.where(ok0, 0.0, 1.0).reshape(-1, 1)
    )
    return rec


def _migrate_axis(p: Particles, s, mesh_axis: str, cfg: SimConfig,
                  axis_i: int, n_shards: int, W: int, budget: int,
                  dest=None):
    """One budgeted migration round along one mesh axis (the 1-D
    machinery of parallel.spatial.migrate, per axis). `dest` overrides
    the uniform-pencil owner map (the load-balanced path passes owners
    derived from its dynamic block-column bounds)."""
    from taichi_mpm_tpu.parallel.spatial import _take

    budget = min(budget, p.capacity // 2)
    if dest is None:
        c = jnp.floor(p.x[:, axis_i] * cfg.inv_dx).astype(jnp.int32)
        dest = jnp.clip(c // W, 0, n_shards - 1)
    go_left = p.active & (dest < s)
    go_right = p.active & (dest > s)

    def pack(mask):
        order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
        buf = _take(p, order[:budget])
        sent = mask[order[:budget]]
        buf = dataclasses.replace(buf, active=sent)
        return buf

    buf_l = pack(go_left)
    buf_r = pack(go_right)
    left = [(i + 1, i) for i in range(n_shards - 1)]
    right = [(i, i + 1) for i in range(n_shards - 1)]
    recv_r = jax.tree.map(lambda a: jax.lax.ppermute(a, mesh_axis, left), buf_l)
    recv_l = jax.tree.map(lambda a: jax.lax.ppermute(a, mesh_axis, right), buf_r)
    p = dataclasses.replace(p, active=p.active & ~(go_left | go_right))
    both = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], 0), recv_l, recv_r
    )
    # arrivals compacted to the front: position == rank, so the write
    # through slots[j] only targets genuinely free slots (see
    # parallel.spatial.migrate)
    both = _take(both, jnp.argsort(jnp.where(both.active, 0, 1),
                                   stable=True))
    free_order = jnp.argsort(jnp.where(p.active, 1, 0), stable=True)
    slots = free_order[: 2 * budget]
    n_free = jnp.sum(~p.active)
    ok = both.active & (jnp.arange(2 * budget) < n_free)
    merged = jax.tree.map(
        lambda dst, src: dst.at[slots].set(
            jnp.where(ok.reshape((-1,) + (1,) * (src.ndim - 1)), src, dst[slots])
        ),
        p, both,
    )
    demand = jnp.maximum(jnp.sum(go_left), jnp.sum(go_right))
    demand = jnp.where(
        jnp.sum(both.active & ~ok) > 0, jnp.int32(p.capacity), demand
    )
    return merged, demand.astype(jnp.int32)


def shifted_colliders_xy(colliders, xoff, yoff):
    """Colliders evaluated at x + (xoff, yoff, 0) — the 2-axis version
    of spatial_blocked.shifted_colliders (grid ops run in the shard's
    local pencil coordinates)."""
    off = jnp.stack([xoff, yoff, jnp.zeros_like(xoff)])
    return tuple(
        dataclasses.replace(
            c,
            sdf=(lambda c_: lambda x, tt: c_.sdf(
                x + off.astype(x.dtype), tt))(c),
            normal_fn=(lambda c_: (
                (lambda x, tt: c_.normal_fn(x + off.astype(x.dtype), tt))
                if c_.normal_fn is not None else None))(c),
            velocity=(lambda c_: (
                (lambda x, tt: c_.velocity(x + off.astype(x.dtype), tt))
                if c_.velocity is not None else None))(c),
        )
        for c in colliders
    )


def build_spatial_mesh2d_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    K: int = 1024, budget: int = 256, interpret: bool = False,
):
    """Jitted shard_map frame over a 2-D ('x', 'y') mesh (pencils).
    Returns fn(p, t) -> (p, t, needed, n_act)."""
    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    shards = (Sx, Sy)
    lcfg = local_config(cfg, shards)
    Wx = pencil_cells(cfg, shards, 0)
    Wy = pencil_cells(cfg, shards, 1)
    Wbx, Wby = Wx // 4, Wy // 4

    def local_frame(p: Particles, t):
        sx = jax.lax.axis_index("x")
        sy = jax.lax.axis_index("y")
        offx, offy = shard_offsets_cells(sx, sy, cfg, shards)

        def resort(p):
            p, need_x = _migrate_axis(p, sx, "x", cfg, 0, Sx, Wx, budget)
            p, need_y = _migrate_axis(p, sy, "y", cfg, 1, Sy, Wy, budget)
            keys = _local_keys(p, offx, offy, cfg, lcfg)
            p, keys, _ = sort_particles_by_keys(p, keys)
            pm = build_page_map_full(keys, lcfg, K)
            return p, keys, pm, jnp.maximum(need_x, need_y)

        p, keys, pm, needed0 = resort(p)

        def body(carry, _):
            p, keys, pm, drift, t, need_max, na = carry
            n = p.capacity
            pw = _round_up(n, CHUNK)
            origin_g = pm["origin"] + jnp.stack(
                [offx, offy, jnp.zeros_like(offx)], -1
            )
            pdata = prep_p2g(p, keys, cfg, cfg.base_dt, origin=origin_g)
            tiles = p2g_blocked(pm["s_arr"], pm["e_arr"], pdata,
                                interpret=interpret)
            rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
            rec = _exchange_axis(rec, pm, lcfg, "x", Sx, Wbx, 0)
            rec = _exchange_axis(rec, pm, lcfg, "y", Sy, Wby, 1)
            rec = _zero_edge_ghosts(rec, pm, lcfg, sx, Sx, 0)
            rec = _zero_edge_ghosts(rec, pm, lcfg, sy, Sy, 1)

            sc = shifted_colliders_xy(colliders, offx * cfg.dx, offy * cfg.dx)
            vrec = grid_update_flat(rec, pm["ids"], lcfg, sc, t, cfg.base_dt)
            gtiles = blocked.windows_mm(vrec, pm["nbr"])

            keys2d = jnp.pad(
                pm["slot_keys"][None, :], ((0, 0), (0, pw - n)),
                constant_values=pm["ids"].shape[0],
            )
            posg = jnp.pad(pdata[13:16, :pw], ((0, 5), (0, 0)))
            pout = g2p_blocked(
                keys2d, posg, gtiles,
                jnp.asarray([pm["ids"].shape[0]], jnp.int32),
                interpret=interpret,
            )
            pout = pout[:, :n].T
            v_new = jnp.where(p.active[:, None], pout[:, 0:3], 0.0)
            b_new = jnp.where(
                p.active[:, None, None], pout[:, 3:12].reshape(n, 3, 3), 0.0
            )
            p = g2p_finish(p, v_new, b_new, cfg, cfg.base_dt)
            vmax = jnp.max(jnp.where(p.active[:, None], jnp.abs(p.v), 0.0))

            drift = drift + cfg.base_dt * cfg.inv_dx * vmax
            need = jax.lax.pmax(jax.lax.pmax(drift, "x"), "y") >= 0.45

            def do_resort(p):
                return resort(jax.lax.optimization_barrier(p))

            def keep(p):
                return p, keys, pm, jnp.int32(0)

            p, keys, pm, needed = jax.lax.cond(need, do_resort, keep, p)
            drift = jnp.where(need, 0.0, drift)
            return (p, keys, pm, drift, t + cfg.base_dt,
                    jnp.maximum(need_max, needed),
                    jnp.maximum(na, pm["n_act"])), None

        carry = (p, keys, pm, jnp.float32(0.0), t, needed0, pm["n_act"])
        (p, keys, pm, _, t, need_max, n_act), _ = jax.lax.scan(
            body, carry, None, length=n_substeps
        )
        pm2 = jax.lax.pmax(jax.lax.pmax(need_max, "x"), "y")
        na2 = jax.lax.pmax(jax.lax.pmax(n_act, "x"), "y")
        return p, t, pm2, na2

    pspec = P(("x", "y"))
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


def build_spatial_cpic_mesh2d_frame(
    cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    K: int = 1024, budget: int = 256, near_budget: int = 4096,
    b1: int = 0, Kr: int = 0, interpret: bool = False,
):
    """Jitted shard_map CPIC frame on the 2-D (x, y) pencil mesh — the
    coupled transfers of parallel/spatial_blocked.build_spatial_cpic_frame
    generalized to pencils. Rigid bodies stay REPLICATED; the per-shard
    impulse partial sums psum over BOTH mesh axes (the reference's
    apply_tmp_impulse reduction, /root/reference/src/transfer.cpp:195-197,
    578-580); the boundary-record exchange and the re-sort migration run
    as two sequential single-axis rounds (corners compose — module
    docstring above).

    Returns fn(p, bodies, t) -> (p, bodies, t, needed, n_act, n_near,
    n_coarse, n_r); the driver grows budget / K / near budgets and
    re-runs the frame on overflow, as in the 1-D path."""
    from taichi_mpm_tpu.rigid.cpic_blocked import (
        cpic_blocked_substep_presorted,
    )

    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    shards = (Sx, Sy)
    lcfg = local_config(cfg, shards)
    Wx = pencil_cells(cfg, shards, 0)
    Wy = pencil_cells(cfg, shards, 1)
    Wbx, Wby = Wx // 4, Wy // 4

    def local_frame(p: Particles, bodies, t):
        sx = jax.lax.axis_index("x")
        sy = jax.lax.axis_index("y")
        offx, offy = shard_offsets_cells(sx, sy, cfg, shards)
        world_off = jnp.stack(
            [offx * cfg.dx, offy * cfg.dx, jnp.zeros_like(offx)]
        )
        gcolls = shifted_colliders_xy(
            scene.colliders, offx * cfg.dx, offy * cfg.dx
        )

        # exchange() needs the substep's CURRENT page map; it is threaded
        # through a one-slot cell written at the top of each (traced-once)
        # scan body before the substep runs.
        pm_cell = [None]

        def exchange(rec):
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "x", Sx, Wbx, 0)
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "y", Sy, Wby, 1)
            rec = _zero_edge_ghosts(rec, pm_cell[0], lcfg, sx, Sx, 0)
            rec = _zero_edge_ghosts(rec, pm_cell[0], lcfg, sy, Sy, 1)
            return rec

        def resort(p):
            p, need_x = _migrate_axis(p, sx, "x", cfg, 0, Sx, Wx, budget)
            p, need_y = _migrate_axis(p, sy, "y", cfg, 1, Sy, Wy, budget)
            keys = _local_keys(p, offx, offy, cfg, lcfg)
            p, keys, _ = sort_particles_by_keys(p, keys)
            pm = build_page_map_full(keys, lcfg, K)
            return p, keys, pm, jnp.maximum(need_x, need_y)

        p, keys, pm, needed0 = resort(p)

        def body(carry, _):
            p, keys, pm, bodies, drift, t, need_max, na, nn, nc, nr = carry
            pm_cell[0] = pm
            origin_g = pm["origin"] + jnp.stack(
                [offx, offy, jnp.zeros_like(offx)], -1
            )
            (p, bodies, t), n_near, n_coarse, n_r, vmax, _ = (
                cpic_blocked_substep_presorted(
                    p, keys, pm, bodies, t, cfg, scene, cfg.base_dt,
                    near_budget, b1, Kr, interpret=interpret, lcfg=lcfg,
                    world_off=world_off, axis=("x", "y"), origin=origin_g,
                    grid_colliders=gcolls, exchange_fn=exchange,
                )
            )
            drift = drift + cfg.base_dt * cfg.inv_dx * vmax
            need = jax.lax.pmax(jax.lax.pmax(drift, "x"), "y") >= 0.45

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

        def pmax2(v):
            return jax.lax.pmax(jax.lax.pmax(v, "x"), "y")

        return (p, bodies, t, pmax2(need_max), pmax2(na), pmax2(nn),
                pmax2(nc), pmax2(nr))

    pspec = P(("x", "y"))
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


def shard_pencils(p: Particles, cfg: SimConfig, mesh: Mesh, slack: float = 1.5):
    """Host-side: bin particles into (x, y) pencils, pad to equal local
    capacity, device_put over the 2-D mesh."""
    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    Wx = pencil_cells(cfg, (Sx, Sy), 0)
    Wy = pencil_cells(cfg, (Sx, Sy), 1)
    x = np.asarray(p.x)
    act = np.asarray(p.active)
    cx = np.clip((x[:, 0] / cfg.dx).astype(np.int64), 0, cfg.res[0] - 1)
    cy = np.clip((x[:, 1] / cfg.dx).astype(np.int64), 0, cfg.res[1] - 1)
    pencil = np.clip(cx // Wx, 0, Sx - 1) * Sy + np.clip(cy // Wy, 0, Sy - 1)
    S = Sx * Sy
    counts = np.bincount(pencil[act], minlength=S)
    C_local = max(8, int(np.ceil(counts.max() * slack)))

    def reorganize(a):
        a = np.asarray(a)
        out = np.zeros((S * C_local,) + a.shape[1:], a.dtype)
        for sh in range(S):
            sel = act & (pencil == sh)
            n = sel.sum()
            out[sh * C_local : sh * C_local + n] = a[sel]
        return out

    arrays = {
        f.name: reorganize(getattr(p, f.name))
        for f in dataclasses.fields(p)
        if f.name != "active"
    }
    active = np.zeros(S * C_local, bool)
    for sh in range(S):
        active[sh * C_local : sh * C_local + int(counts[sh])] = True
    eye = np.eye(cfg.dim, dtype=np.float32)
    arrays["F"][~active] = eye
    p_new = Particles(
        active=jnp.asarray(active),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    )
    put = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(("x", "y"), *([None] * (a.ndim - 1))))
    )
    return jax.tree.map(put, p_new)


# ---------------------------------------------------------------------------
# Load-balanced pencils: dynamic rectilinear bounds per mesh axis
# ---------------------------------------------------------------------------
#
# The 2-D generalization of spatial_blocked's balanced slabs (the
# chip-level analog of the reference's TBB work stealing,
# /root/reference/src/mpm.cpp:919-1014): the pencil partition stays a
# TENSOR PRODUCT of per-axis block-column splits (bounds_x (Sx+1,) x
# bounds_y (Sy+1,), both replicated), each axis rebalanced
# independently toward equal counts of its MARGINAL particle histogram.
# A rectilinear partition cannot equalize arbitrary 2-D densities the
# way a general one could, but it preserves the pencil exchange /
# migration machinery unchanged (traced offsets + widths) and fixes the
# common case — mass piling into a corner of the domain. Boundaries
# move at most DMAX columns per rebalance and stay within +-r of the
# uniform split, so the static local window covers every allowed
# position and migration stays one-hop per axis.


def balanced_params2d(cfg: SimConfig, shards, rx: int, ry: int):
    """Per-axis (CB, uniform bounds) + one static local config sized
    for the widest allowed pencil on each axis."""
    from taichi_mpm_tpu.parallel.spatial_blocked import MINW

    outs = []
    for axis_i, (n, r) in enumerate(zip(shards, (rx, ry))):
        assert cfg.res[axis_i] % 4 == 0
        CB = cfg.res[axis_i] // 4
        u = np.round(np.linspace(0.0, CB, n + 1)).astype(np.int32)
        gaps = u[1:] - u[:-1]
        r_max = (int(gaps.min()) - MINW) // 2
        assert 0 < r <= r_max, (
            f"balance radius r={r} on axis {axis_i} must be in "
            f"[1, {r_max}] for res={cfg.res[axis_i]}, shards={n}"
        )
        outs.append((CB, u, int(gaps.max()) + 2 * r))
    (CBx, ux, wx), (CBy, uy, wy) = outs
    lcfg = dataclasses.replace(
        cfg, res=((wx + 2) * 4, (wy + 2) * 4, cfg.res[2])
    )
    return CBx, CBy, ux, uy, lcfg


def col_hists2d_from_pm(pm, bx0, by0, lcfg: SimConfig, CBx: int, CBy: int):
    """Global (x, y) marginal block-column histograms from the page map
    (K-scaled; psum over BOTH mesh axes)."""
    nbp = blocked.num_blocks_padded(lcfg)
    counts = (pm["e_arr"] - pm["s_arr"]).astype(jnp.int32)
    per = nbp[1] * nbp[2]
    gx = pm["ids"] // per - 1 + bx0
    gy = (pm["ids"] // nbp[2]) % nbp[1] - 1 + by0
    hx = jnp.zeros((CBx,), jnp.int32).at[jnp.clip(gx, 0, CBx - 1)].add(counts)
    hy = jnp.zeros((CBy,), jnp.int32).at[jnp.clip(gy, 0, CBy - 1)].add(counts)
    hx = jax.lax.psum(jax.lax.psum(hx, "x"), "y")
    hy = jax.lax.psum(jax.lax.psum(hy, "x"), "y")
    return hx, hy


def _dest_axis_from_bounds(p: Particles, bounds, cfg: SimConfig,
                           axis_i: int, n_shards: int):
    c = jnp.clip(
        jnp.floor(p.x[:, axis_i] * cfg.inv_dx).astype(jnp.int32),
        0, cfg.res[axis_i] - 1,
    )
    return jnp.clip(
        jnp.searchsorted(bounds, c // 4, side="right").astype(jnp.int32) - 1,
        0, n_shards - 1,
    )


def build_spatial_balanced_mesh2d_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    K: int = 1024, budget: int = 256, rx: int = 1, ry: int = 1,
    interpret: bool = False,
):
    """The pencil frame over LOAD-BALANCED rectilinear bounds.

    fn(p, t, bounds_x, bounds_y, hist_x, hist_y) ->
    (p, t, bounds_x, bounds_y, hist_x, hist_y, needed, n_act):
    bounds/hists are replicated and thread frame-to-frame (the
    histograms feed the NEXT rebalance — one re-sort of lag, tolerated
    by the DMAX rate limit); rebalancing runs at the frame-start resort
    and at every drift-triggered mid-frame resort."""
    from taichi_mpm_tpu.parallel.spatial_blocked import rebalance_bounds

    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    shards = (Sx, Sy)
    CBx, CBy, ux_np, uy_np, lcfg = balanced_params2d(cfg, shards, rx, ry)
    ux = jnp.asarray(ux_np, jnp.int32)
    uy = jnp.asarray(uy_np, jnp.int32)

    def local_frame(p: Particles, t, bx, by, hx, hy):
        sx = jax.lax.axis_index("x")
        sy = jax.lax.axis_index("y")

        def resort(p, bx, by, hx, hy):
            bx = rebalance_bounds(hx, bx, ux, rx, Sx)
            by = rebalance_bounds(hy, by, uy, ry, Sy)
            dest_x = _dest_axis_from_bounds(p, bx, cfg, 0, Sx)
            p, need_x = _migrate_axis(p, sx, "x", cfg, 0, Sx, 0, budget,
                                      dest=dest_x)
            dest_y = _dest_axis_from_bounds(p, by, cfg, 1, Sy)
            p, need_y = _migrate_axis(p, sy, "y", cfg, 1, Sy, 0, budget,
                                      dest=dest_y)
            offx = ((bx[sx] - 1) * 4).astype(jnp.float32)
            offy = ((by[sy] - 1) * 4).astype(jnp.float32)
            keys = _local_keys(p, offx, offy, cfg, lcfg)
            p, keys, _ = sort_particles_by_keys(p, keys)
            pm = build_page_map_full(keys, lcfg, K)
            hx, hy = col_hists2d_from_pm(pm, bx[sx], by[sy], lcfg, CBx, CBy)
            return p, keys, pm, bx, by, hx, hy, jnp.maximum(need_x, need_y)

        p, keys, pm, bx, by, hx, hy, needed0 = resort(p, bx, by, hx, hy)

        def body(carry, _):
            p, keys, pm, bx, by, hx, hy, drift, t, need_max, na = carry
            offx = ((bx[sx] - 1) * 4).astype(jnp.float32)
            offy = ((by[sy] - 1) * 4).astype(jnp.float32)
            Wbx = bx[sx + 1] - bx[sx]
            Wby = by[sy + 1] - by[sy]
            n = p.capacity
            pw = _round_up(n, CHUNK)
            origin_g = pm["origin"] + jnp.stack(
                [offx, offy, jnp.zeros_like(offx)], -1
            )
            pdata = prep_p2g(p, keys, cfg, cfg.base_dt, origin=origin_g)
            tiles = p2g_blocked(pm["s_arr"], pm["e_arr"], pdata,
                                interpret=interpret)
            rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
            rec = _exchange_axis(rec, pm, lcfg, "x", Sx, Wbx, 0)
            rec = _exchange_axis(rec, pm, lcfg, "y", Sy, Wby, 1)
            rec = _zero_edge_ghosts(rec, pm, lcfg, sx, Sx, 0)
            rec = _zero_edge_ghosts(rec, pm, lcfg, sy, Sy, 1)

            sc = shifted_colliders_xy(colliders, offx * cfg.dx, offy * cfg.dx)
            vrec = grid_update_flat(rec, pm["ids"], lcfg, sc, t, cfg.base_dt)
            gtiles = blocked.windows_mm(vrec, pm["nbr"])

            keys2d = jnp.pad(
                pm["slot_keys"][None, :], ((0, 0), (0, pw - n)),
                constant_values=pm["ids"].shape[0],
            )
            posg = jnp.pad(pdata[13:16, :pw], ((0, 5), (0, 0)))
            pout = g2p_blocked(
                keys2d, posg, gtiles,
                jnp.asarray([pm["ids"].shape[0]], jnp.int32),
                interpret=interpret,
            )
            pout = pout[:, :n].T
            v_new = jnp.where(p.active[:, None], pout[:, 0:3], 0.0)
            b_new = jnp.where(
                p.active[:, None, None], pout[:, 3:12].reshape(n, 3, 3), 0.0
            )
            p = g2p_finish(p, v_new, b_new, cfg, cfg.base_dt)
            vmax = jnp.max(jnp.where(p.active[:, None], jnp.abs(p.v), 0.0))

            drift = drift + cfg.base_dt * cfg.inv_dx * vmax
            need = jax.lax.pmax(jax.lax.pmax(drift, "x"), "y") >= 0.45

            def do_resort(args):
                p, bx, by, hx, hy = args
                return resort(jax.lax.optimization_barrier(p), bx, by, hx, hy)

            def keep(args):
                p, bx, by, hx, hy = args
                return p, keys, pm, bx, by, hx, hy, jnp.int32(0)

            p, keys2, pm2, bx, by, hx, hy, needed = jax.lax.cond(
                need, do_resort, keep, (p, bx, by, hx, hy)
            )
            drift = jnp.where(need, 0.0, drift)
            return (p, keys2, pm2, bx, by, hx, hy, drift, t + cfg.base_dt,
                    jnp.maximum(need_max, needed),
                    jnp.maximum(na, pm["n_act"])), None

        carry = (p, keys, pm, bx, by, hx, hy, jnp.float32(0.0), t,
                 needed0, pm["n_act"])
        (p, keys, pm, bx, by, hx, hy, _, t, need_max, n_act), _ = (
            jax.lax.scan(body, carry, None, length=n_substeps)
        )

        def pmax2(v):
            return jax.lax.pmax(jax.lax.pmax(v, "x"), "y")

        return (p, t, bx, by, hx, hy, pmax2(need_max), pmax2(n_act))

    pspec = P(("x", "y"))
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
        in_specs=(p_specs, P(), P(), P(), P(), P()),
        out_specs=(p_specs, P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def balanced_bounds2d_host(p: Particles, cfg: SimConfig, shards,
                           rx: int, ry: int):
    """Host-side initial per-axis bounds: equal-count splits of the
    marginal histograms, clamped to +-r of uniform (no rate limit)."""
    CBx, CBy, ux, uy, _ = balanced_params2d(cfg, shards, rx, ry)
    x = np.asarray(p.x)
    act = np.asarray(p.active)
    outs = []
    for axis_i, (CB, u, n, r) in enumerate(
        ((CBx, ux, shards[0], rx), (CBy, uy, shards[1], ry))
    ):
        col = np.clip(
            (x[act, axis_i] / cfg.dx).astype(np.int64), 0,
            cfg.res[axis_i] - 1,
        ) // 4
        hist = np.bincount(col, minlength=CB).astype(np.float64)
        c = np.cumsum(hist)
        q = np.arange(1, n) * c[-1] / n
        ideal = np.searchsorted(c, q, side="left").astype(np.int32) + 1
        new = np.clip(ideal, u[1:-1] - r, u[1:-1] + r)
        if c[-1] <= 0:
            new = u[1:-1]
        outs.append(np.concatenate([u[:1], new, u[-1:]]).astype(np.int32))
    return outs[0], outs[1]


def shard_pencils_bounds(p: Particles, cfg: SimConfig, mesh: Mesh,
                         bounds_x, bounds_y, slack: float = 1.5):
    """shard_pencils for explicit per-axis block-column boundaries."""
    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    bx = np.asarray(bounds_x, np.int64)
    by = np.asarray(bounds_y, np.int64)
    x = np.asarray(p.x)
    act = np.asarray(p.active)
    cx = np.clip((x[:, 0] / cfg.dx).astype(np.int64), 0, cfg.res[0] - 1) // 4
    cy = np.clip((x[:, 1] / cfg.dx).astype(np.int64), 0, cfg.res[1] - 1) // 4
    px = np.clip(np.searchsorted(bx, cx, side="right") - 1, 0, Sx - 1)
    py = np.clip(np.searchsorted(by, cy, side="right") - 1, 0, Sy - 1)
    pencil = px * Sy + py
    S = Sx * Sy
    counts = np.bincount(pencil[act], minlength=S)
    C_local = max(8, int(np.ceil(counts.max() * slack)))

    def reorganize(a):
        a = np.asarray(a)
        out = np.zeros((S * C_local,) + a.shape[1:], a.dtype)
        for sh in range(S):
            sel = act & (pencil == sh)
            out[sh * C_local : sh * C_local + sel.sum()] = a[sel]
        return out

    arrays = {
        f.name: reorganize(getattr(p, f.name))
        for f in dataclasses.fields(p)
        if f.name != "active"
    }
    active = np.zeros(S * C_local, bool)
    for sh in range(S):
        active[sh * C_local : sh * C_local + int(counts[sh])] = True
    arrays["F"][~active] = np.eye(cfg.dim, dtype=np.float32)
    p_new = Particles(
        active=jnp.asarray(active),
        **{k: jnp.asarray(v) for k, v in arrays.items()},
    )
    put = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(("x", "y"), *([None] * (a.ndim - 1))))
    )
    return jax.tree.map(put, p_new)


def run_spatial_balanced_mesh2d_frames(
    p, t, cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    n_frames: int = 1, K: int = 1024, budget: int = 256,
    rx: int = 1, ry: int = 1, bounds_x=None, bounds_y=None,
    hist_x=None, hist_y=None, interpret: bool = False,
):
    """Balanced-pencil frame driver with the same overflow auto-grow
    discipline as the 1-D runners. Returns (p, t, state) — pass state's
    bounds/hists back in to continue."""
    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    CBx, CBy, _, _, _ = balanced_params2d(cfg, (Sx, Sy), rx, ry)
    if bounds_x is None or bounds_y is None:
        bounds_x, bounds_y = balanced_bounds2d_host(
            jax.tree.map(np.asarray, p), cfg, (Sx, Sy), rx, ry
        )
    bounds_x = jnp.asarray(bounds_x, jnp.int32)
    bounds_y = jnp.asarray(bounds_y, jnp.int32)
    if hist_x is None:
        hist_x = jnp.zeros((CBx,), jnp.int32)
    if hist_y is None:
        hist_y = jnp.zeros((CBy,), jnp.int32)
    frame = build_spatial_balanced_mesh2d_frame(
        cfg, colliders, n_substeps, mesh, K, budget, rx, ry, interpret
    )
    local_cap = p.x.shape[0] // (Sx * Sy)
    for _ in range(n_frames):
        while True:
            p2, t2, bx2, by2, hx2, hy2, needed, n_act = frame(
                p, t, bounds_x, bounds_y, hist_x, hist_y
            )
            needed, n_act = int(needed), int(n_act)
            grow_budget = needed > budget
            grow_K = n_act > K
            if not (grow_budget or grow_K):
                p, t = p2, t2
                bounds_x, bounds_y, hist_x, hist_y = bx2, by2, hx2, hy2
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
            frame = build_spatial_balanced_mesh2d_frame(
                cfg, colliders, n_substeps, mesh, K, budget, rx, ry,
                interpret,
            )
    return p, t, dict(K=K, budget=budget, bounds_x=bounds_x,
                      bounds_y=bounds_y, hist_x=hist_x, hist_y=hist_y)


# ---------------------------------------------------------------------------
# Packed-carry pencils: the fully-fused production substep per shard
# ---------------------------------------------------------------------------


def build_spatial_packed_mesh2d_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    K: int = 1024, budget: int = 256, interpret: bool = False,
):
    """The pencil frame over the PACKED carry: each shard runs the
    fully-fused substep (ops.packed.fused_substep_presorted) on its
    (x, y) column, with the two sequential axis exchanges hooked in
    between the halo merge and the grid update, two-round migration at
    the lazy re-sorts, and GLOBAL origins in the RORG rows (local block
    origin + both shard offsets). Same signature/returns as
    build_spatial_mesh2d_frame; equal to the single-chip fused frame
    (differential-tested)."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        _pack_with_origins,
        _two_level_loop,
    )

    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    shards = (Sx, Sy)
    lcfg = local_config(cfg, shards)
    Wx = pencil_cells(cfg, shards, 0)
    Wy = pencil_cells(cfg, shards, 1)
    Wbx, Wby = Wx // 4, Wy // 4

    def local_frame(p: Particles, t):
        sx = jax.lax.axis_index("x")
        sy = jax.lax.axis_index("y")
        offx, offy = shard_offsets_cells(sx, sy, cfg, shards)
        cap = p.x.shape[0]
        pm_cell = [None]

        def exchange(rec):
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "x", Sx, Wbx, 0)
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "y", Sy, Wby, 1)
            rec = _zero_edge_ghosts(rec, pm_cell[0], lcfg, sx, Sx, 0)
            return _zero_edge_ghosts(rec, pm_cell[0], lcfg, sy, Sy, 1)

        def resort_fn(st, extra):
            need_max, na = extra
            p2 = packed.unpack_particles(st, cap)
            p2, need_x = _migrate_axis(p2, sx, "x", cfg, 0, Sx, Wx, budget)
            p2, need_y = _migrate_axis(p2, sy, "y", cfg, 1, Sy, Wy, budget)
            keys = _local_keys(p2, offx, offy, cfg, lcfg)
            p2, keys, _ = sort_particles_by_keys(p2, keys)
            st, keys_pw, pm = _pack_with_origins(
                p2, keys, (offx, offy), lcfg, K
            )
            extra = (
                jnp.maximum(need_max, jnp.maximum(need_x, need_y)),
                jnp.maximum(na, pm["n_act"]),
            )
            return st, keys_pw, pm, extra

        def substep_fn(st, keys, pm, extra, t):
            pm_cell[0] = pm
            gcolls = shifted_colliders_xy(
                colliders, offx * cfg.dx, offy * cfg.dx
            )
            (st, t), _, vmax, _ = packed.fused_substep_presorted(
                st, pm, t, cfg, colliders, cfg.base_dt,
                interpret=interpret, gcfg=lcfg, grid_colliders=gcolls,
                exchange_fn=exchange,
            )
            dinc = cfg.base_dt * cfg.inv_dx * jax.lax.pmax(
                jax.lax.pmax(vmax, "x"), "y"
            )
            return st, extra, t, dinc

        z = jnp.int32(0)
        st, keys, pm, extra = resort_fn(packed.pack_particles(p), (z, z))
        st, keys, pm, extra, t = _two_level_loop(
            st, keys, pm, extra, t, n_substeps, substep_fn, resort_fn
        )
        need_max, n_act = extra
        pmx = jax.lax.pmax(jax.lax.pmax(need_max, "x"), "y")
        nax = jax.lax.pmax(jax.lax.pmax(n_act, "x"), "y")
        return packed.unpack_particles(st, cap), t, pmx, nax

    pspec = P(("x", "y"))
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


def build_spatial_cpic_packed_mesh2d_frame(
    cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    K: int = 1024, budget: int = 256, near_budget: int = 4096,
    b1: int = 0, Kr: int = 0, interpret: bool = False,
):
    """The PACKED-carry CPIC frame on the 2-D pencil mesh: per-shard
    fused bulk transfers (rigid/cpic_packed) with rigid impulses psum'd
    over BOTH mesh axes, the two-axis record exchange hooked between
    the P2G correction and the grid update, and two-round migration at
    the lazy re-sorts — the pencil twin of spatial_blocked.
    build_spatial_cpic_packed_frame. Same signature/returns as
    build_spatial_cpic_mesh2d_frame."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        _pack_with_origins,
        _two_level_loop,
    )
    from taichi_mpm_tpu.rigid.cpic_packed import (
        cpic_packed_substep_presorted,
    )

    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    shards = (Sx, Sy)
    lcfg = local_config(cfg, shards)
    Wx = pencil_cells(cfg, shards, 0)
    Wy = pencil_cells(cfg, shards, 1)
    Wbx, Wby = Wx // 4, Wy // 4

    def local_frame(p: Particles, bodies, t):
        sx = jax.lax.axis_index("x")
        sy = jax.lax.axis_index("y")
        offx, offy = shard_offsets_cells(sx, sy, cfg, shards)
        world_off = jnp.stack(
            [offx * cfg.dx, offy * cfg.dx, jnp.zeros_like(offx)]
        )
        gcolls = shifted_colliders_xy(
            scene.colliders, offx * cfg.dx, offy * cfg.dx
        )
        cap = p.x.shape[0]
        pm_cell = [None]

        def exchange(rec):
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "x", Sx, Wbx, 0)
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "y", Sy, Wby, 1)
            rec = _zero_edge_ghosts(rec, pm_cell[0], lcfg, sx, Sx, 0)
            return _zero_edge_ghosts(rec, pm_cell[0], lcfg, sy, Sy, 1)

        def resort_fn(st, extra):
            bodies, need_max, na, nn, nc, nr = extra
            p2 = packed.unpack_particles(st, cap)
            p2, need_x = _migrate_axis(p2, sx, "x", cfg, 0, Sx, Wx, budget)
            p2, need_y = _migrate_axis(p2, sy, "y", cfg, 1, Sy, Wy, budget)
            keys = _local_keys(p2, offx, offy, cfg, lcfg)
            p2, keys, _ = sort_particles_by_keys(p2, keys)
            st, keys_pw, pm = _pack_with_origins(
                p2, keys, (offx, offy), lcfg, K
            )
            extra = (
                bodies,
                jnp.maximum(need_max, jnp.maximum(need_x, need_y)),
                jnp.maximum(na, pm["n_act"]), nn, nc, nr,
            )
            return st, keys_pw, pm, extra

        def substep_fn(st, keys, pm, extra, t):
            bodies, need_max, na, nn, nc, nr = extra
            pm_cell[0] = pm
            (st, bodies, t), n_near, n_coarse, n_r, vmax, _ = (
                cpic_packed_substep_presorted(
                    st, keys, pm, bodies, t, cfg, scene, cfg.base_dt,
                    near_budget, b1, Kr, interpret=interpret, lcfg=lcfg,
                    world_off=world_off, axis=("x", "y"),
                    grid_colliders=gcolls, exchange_fn=exchange,
                )
            )
            extra = (bodies, need_max, na, jnp.maximum(nn, n_near),
                     jnp.maximum(nc, n_coarse), jnp.maximum(nr, n_r))
            dinc = cfg.base_dt * cfg.inv_dx * jax.lax.pmax(
                jax.lax.pmax(vmax, "x"), "y"
            )
            return st, extra, t, dinc

        z = jnp.int32(0)
        st, keys, pm, extra = resort_fn(
            packed.pack_particles(p), (bodies, z, z, z, z, z)
        )
        st, keys, pm, extra, t = _two_level_loop(
            st, keys, pm, extra, t, n_substeps, substep_fn, resort_fn
        )
        bodies, need_max, na, nn, nc, nr = extra

        def pmax2(v):
            return jax.lax.pmax(jax.lax.pmax(v, "x"), "y")

        return (packed.unpack_particles(st, cap), bodies, t,
                pmax2(need_max), pmax2(na), pmax2(nn), pmax2(nc),
                pmax2(nr))

    pspec = P(("x", "y"))
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


def build_spatial_cpic_packed_balanced_mesh2d_frame(
    cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    K: int = 1024, budget: int = 256, near_budget: int = 4096,
    b1: int = 0, Kr: int = 0, rx: int = 1, ry: int = 1,
    interpret: bool = False,
):
    """The PACKED CPIC pencil frame over LOAD-BALANCED rectilinear
    bounds — the full matrix cell: fused bulk transfers per shard,
    impulses psum'd over both axes, AND per-axis marginal-histogram
    rebalancing at the lazy re-sorts (the chip-level work-stealing
    analog, mpm.cpp:919-1014, in both decomposition axes).

    fn(p, bodies, t, bx, by, hx, hy) -> (p, bodies, t, bx, by, hx, hy,
    needed, n_act, n_near, n_coarse, n_r)."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        _pack_with_origins,
        _two_level_loop,
        rebalance_bounds,
    )
    from taichi_mpm_tpu.rigid.cpic_packed import (
        cpic_packed_substep_presorted,
    )

    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    shards = (Sx, Sy)
    CBx, CBy, ux_np, uy_np, lcfg = balanced_params2d(cfg, shards, rx, ry)
    ux = jnp.asarray(ux_np, jnp.int32)
    uy = jnp.asarray(uy_np, jnp.int32)

    def local_frame(p: Particles, bodies, t, bx, by, hx, hy):
        sx = jax.lax.axis_index("x")
        sy = jax.lax.axis_index("y")
        cap = p.x.shape[0]
        pm_cell = [None, None, None]  # [pm, Wbx, Wby]

        def exchange(rec):
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "x", Sx,
                                 pm_cell[1], 0)
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "y", Sy,
                                 pm_cell[2], 1)
            rec = _zero_edge_ghosts(rec, pm_cell[0], lcfg, sx, Sx, 0)
            return _zero_edge_ghosts(rec, pm_cell[0], lcfg, sy, Sy, 1)

        def offs_of(bx, by):
            return (((bx[sx] - 1) * 4).astype(jnp.float32),
                    ((by[sy] - 1) * 4).astype(jnp.float32))

        def resort_fn(st, extra):
            bx, by, hx, hy, bodies, need_max, na, nn, nc, nr = extra
            bx = rebalance_bounds(hx, bx, ux, rx, Sx)
            by = rebalance_bounds(hy, by, uy, ry, Sy)
            p2 = packed.unpack_particles(st, cap)
            dest_x = _dest_axis_from_bounds(p2, bx, cfg, 0, Sx)
            p2, need_x = _migrate_axis(p2, sx, "x", cfg, 0, Sx, 0, budget,
                                       dest=dest_x)
            dest_y = _dest_axis_from_bounds(p2, by, cfg, 1, Sy)
            p2, need_y = _migrate_axis(p2, sy, "y", cfg, 1, Sy, 0, budget,
                                       dest=dest_y)
            offx, offy = offs_of(bx, by)
            keys = _local_keys(p2, offx, offy, cfg, lcfg)
            p2, keys, _ = sort_particles_by_keys(p2, keys)
            st, keys_pw, pm = _pack_with_origins(
                p2, keys, (offx, offy), lcfg, K
            )
            hx, hy = col_hists2d_from_pm(pm, bx[sx], by[sy], lcfg, CBx, CBy)
            extra = (
                bx, by, hx, hy, bodies,
                jnp.maximum(need_max, jnp.maximum(need_x, need_y)),
                jnp.maximum(na, pm["n_act"]), nn, nc, nr,
            )
            return st, keys_pw, pm, extra

        def substep_fn(st, keys, pm, extra, t):
            bx, by, hx, hy, bodies, need_max, na, nn, nc, nr = extra
            offx, offy = offs_of(bx, by)
            world_off = jnp.stack(
                [offx * cfg.dx, offy * cfg.dx, jnp.zeros_like(offx)]
            )
            gcolls = shifted_colliders_xy(
                scene.colliders, offx * cfg.dx, offy * cfg.dx
            )
            pm_cell[0] = pm
            pm_cell[1] = bx[sx + 1] - bx[sx]
            pm_cell[2] = by[sy + 1] - by[sy]
            (st, bodies, t), n_near, n_coarse, n_r, vmax, _ = (
                cpic_packed_substep_presorted(
                    st, keys, pm, bodies, t, cfg, scene, cfg.base_dt,
                    near_budget, b1, Kr, interpret=interpret, lcfg=lcfg,
                    world_off=world_off, axis=("x", "y"),
                    grid_colliders=gcolls, exchange_fn=exchange,
                )
            )
            extra = (bx, by, hx, hy, bodies, need_max, na,
                     jnp.maximum(nn, n_near), jnp.maximum(nc, n_coarse),
                     jnp.maximum(nr, n_r))
            dinc = cfg.base_dt * cfg.inv_dx * jax.lax.pmax(
                jax.lax.pmax(vmax, "x"), "y"
            )
            return st, extra, t, dinc

        z = jnp.int32(0)
        st, keys, pm, extra = resort_fn(
            packed.pack_particles(p),
            (bx, by, hx, hy, bodies, z, z, z, z, z),
        )
        st, keys, pm, extra, t = _two_level_loop(
            st, keys, pm, extra, t, n_substeps, substep_fn, resort_fn
        )
        bx, by, hx, hy, bodies, need_max, na, nn, nc, nr = extra

        def pmax2(v):
            return jax.lax.pmax(jax.lax.pmax(v, "x"), "y")

        return (packed.unpack_particles(st, cap), bodies, t, bx, by, hx,
                hy, pmax2(need_max), pmax2(na), pmax2(nn), pmax2(nc),
                pmax2(nr))

    pspec = P(("x", "y"))
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
        in_specs=(p_specs, P(), P(), P(), P(), P(), P()),
        out_specs=(p_specs, P(), P(), P(), P(), P(), P(), P(), P(), P(),
                   P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def run_spatial_cpic_packed_balanced_mesh2d_frames(
    p, bodies, t, cfg: SimConfig, scene, n_substeps: int, mesh: Mesh,
    n_frames: int = 1, K: int = 1024, budget: int = 256,
    near_budget: int = 4096, b1: int = 1024, Kr: int = 0,
    rx: int = 1, ry: int = 1, bounds_x=None, bounds_y=None,
    hist_x=None, hist_y=None, interpret: bool = False,
):
    """Driver with the standard overflow auto-grow. Returns
    (p, bodies, t, state); thread state's bounds/hists to continue."""
    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    CBx, CBy, _, _, _ = balanced_params2d(cfg, (Sx, Sy), rx, ry)
    if bounds_x is None or bounds_y is None:
        bounds_x, bounds_y = balanced_bounds2d_host(
            jax.tree.map(np.asarray, p), cfg, (Sx, Sy), rx, ry
        )
    bounds_x = jnp.asarray(bounds_x, jnp.int32)
    bounds_y = jnp.asarray(bounds_y, jnp.int32)
    if hist_x is None:
        hist_x = jnp.zeros((CBx,), jnp.int32)
    if hist_y is None:
        hist_y = jnp.zeros((CBy,), jnp.int32)

    def build():
        return build_spatial_cpic_packed_balanced_mesh2d_frame(
            cfg, scene, n_substeps, mesh, K, budget, near_budget, b1,
            Kr, rx, ry, interpret,
        )

    frame = build()
    local_cap = p.x.shape[0] // (Sx * Sy)
    for _ in range(n_frames):
        while True:
            (p2, b2, t2, bx2, by2, hx2, hy2, needed, n_act, n_near,
             n_coarse, n_r) = frame(p, bodies, t, bounds_x, bounds_y,
                                    hist_x, hist_y)
            needed, n_act = int(needed), int(n_act)
            n_near, n_coarse, n_r = int(n_near), int(n_coarse), int(n_r)
            grow = False
            if needed > budget:
                if needed >= local_cap:
                    raise RuntimeError(
                        f"shard capacity exhausted ({needed} arrivals vs "
                        f"{local_cap} local slots); reshard with more slack"
                    )
                budget, grow = -(-2 * needed // 64) * 64, True
            if n_act > K:
                K, grow = -(-2 * n_act // 64) * 64, True
            if n_near > near_budget:
                near_budget, grow = -(-2 * n_near // 64) * 64, True
            if n_coarse > b1:
                b1, grow = -(-2 * n_coarse // 64) * 64, True
            if Kr > 0 and n_r > Kr:  # record-sparse CDF overflow
                Kr, grow = -(-2 * n_r // 64) * 64, True
            if not grow:
                p, bodies, t = p2, b2, t2
                bounds_x, bounds_y, hist_x, hist_y = bx2, by2, hx2, hy2
                break
            frame = build()
    return p, bodies, t, dict(
        K=K, budget=budget, near_budget=near_budget, b1=b1, Kr=Kr,
        bounds_x=bounds_x, bounds_y=bounds_y, hist_x=hist_x,
        hist_y=hist_y,
    )


def build_spatial_packed_balanced_mesh2d_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    K: int = 1024, budget: int = 256, rx: int = 1, ry: int = 1,
    interpret: bool = False,
):
    """The PACKED (fully-fused) pencil frame over LOAD-BALANCED
    rectilinear bounds — the plain-scene twin of
    build_spatial_cpic_packed_balanced_mesh2d_frame: per-axis
    marginal-histogram rebalancing at the lazy re-sorts (the chip-level
    work-stealing analog, mpm.cpp:919-1014) with each shard running
    ops.packed.fused_substep_presorted on its dynamic pencil.

    fn(p, t, bx, by, hx, hy) -> (p, t, bx, by, hx, hy, needed, n_act)."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        _pack_with_origins,
        _two_level_loop,
        rebalance_bounds,
    )

    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    shards = (Sx, Sy)
    CBx, CBy, ux_np, uy_np, lcfg = balanced_params2d(cfg, shards, rx, ry)
    ux = jnp.asarray(ux_np, jnp.int32)
    uy = jnp.asarray(uy_np, jnp.int32)

    def local_frame(p: Particles, t, bx, by, hx, hy):
        sx = jax.lax.axis_index("x")
        sy = jax.lax.axis_index("y")
        cap = p.x.shape[0]
        pm_cell = [None, None, None]  # [pm, Wbx, Wby]

        def exchange(rec):
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "x", Sx,
                                 pm_cell[1], 0)
            rec = _exchange_axis(rec, pm_cell[0], lcfg, "y", Sy,
                                 pm_cell[2], 1)
            rec = _zero_edge_ghosts(rec, pm_cell[0], lcfg, sx, Sx, 0)
            return _zero_edge_ghosts(rec, pm_cell[0], lcfg, sy, Sy, 1)

        def offs_of(bx, by):
            return (((bx[sx] - 1) * 4).astype(jnp.float32),
                    ((by[sy] - 1) * 4).astype(jnp.float32))

        def resort_fn(st, extra):
            bx, by, hx, hy, need_max, na = extra
            bx = rebalance_bounds(hx, bx, ux, rx, Sx)
            by = rebalance_bounds(hy, by, uy, ry, Sy)
            p2 = packed.unpack_particles(st, cap)
            dest_x = _dest_axis_from_bounds(p2, bx, cfg, 0, Sx)
            p2, need_x = _migrate_axis(p2, sx, "x", cfg, 0, Sx, 0, budget,
                                       dest=dest_x)
            dest_y = _dest_axis_from_bounds(p2, by, cfg, 1, Sy)
            p2, need_y = _migrate_axis(p2, sy, "y", cfg, 1, Sy, 0, budget,
                                       dest=dest_y)
            offx, offy = offs_of(bx, by)
            keys = _local_keys(p2, offx, offy, cfg, lcfg)
            p2, keys, _ = sort_particles_by_keys(p2, keys)
            st, keys_pw, pm = _pack_with_origins(
                p2, keys, (offx, offy), lcfg, K
            )
            hx, hy = col_hists2d_from_pm(pm, bx[sx], by[sy], lcfg, CBx, CBy)
            extra = (
                bx, by, hx, hy,
                jnp.maximum(need_max, jnp.maximum(need_x, need_y)),
                jnp.maximum(na, pm["n_act"]),
            )
            return st, keys_pw, pm, extra

        def substep_fn(st, keys, pm, extra, t):
            bx, by, hx, hy, need_max, na = extra
            offx, offy = offs_of(bx, by)
            pm_cell[0] = pm
            pm_cell[1] = bx[sx + 1] - bx[sx]
            pm_cell[2] = by[sy + 1] - by[sy]
            gcolls = shifted_colliders_xy(
                colliders, offx * cfg.dx, offy * cfg.dx
            )
            (st, t), _, vmax, _ = packed.fused_substep_presorted(
                st, pm, t, cfg, colliders, cfg.base_dt,
                interpret=interpret, gcfg=lcfg, grid_colliders=gcolls,
                exchange_fn=exchange,
            )
            dinc = cfg.base_dt * cfg.inv_dx * jax.lax.pmax(
                jax.lax.pmax(vmax, "x"), "y"
            )
            return st, extra, t, dinc

        z = jnp.int32(0)
        st, keys, pm, extra = resort_fn(
            packed.pack_particles(p), (bx, by, hx, hy, z, z)
        )
        st, keys, pm, extra, t = _two_level_loop(
            st, keys, pm, extra, t, n_substeps, substep_fn, resort_fn
        )
        bx, by, hx, hy, need_max, n_act = extra

        def pmax2(v):
            return jax.lax.pmax(jax.lax.pmax(v, "x"), "y")

        return (packed.unpack_particles(st, cap), t, bx, by, hx, hy,
                pmax2(need_max), pmax2(n_act))

    pspec = P(("x", "y"))
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
        in_specs=(p_specs, P(), P(), P(), P(), P()),
        out_specs=(p_specs, P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def run_spatial_packed_balanced_mesh2d_frames(
    p, t, cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    n_frames: int = 1, K: int = 1024, budget: int = 256,
    rx: int = 1, ry: int = 1, bounds_x=None, bounds_y=None,
    hist_x=None, hist_y=None, interpret: bool = False,
):
    """run_spatial_balanced_mesh2d_frames over the packed frame."""
    Sx, Sy = mesh.shape["x"], mesh.shape["y"]
    CBx, CBy, _, _, _ = balanced_params2d(cfg, (Sx, Sy), rx, ry)
    if bounds_x is None or bounds_y is None:
        bounds_x, bounds_y = balanced_bounds2d_host(
            jax.tree.map(np.asarray, p), cfg, (Sx, Sy), rx, ry
        )
    bounds_x = jnp.asarray(bounds_x, jnp.int32)
    bounds_y = jnp.asarray(bounds_y, jnp.int32)
    if hist_x is None:
        hist_x = jnp.zeros((CBx,), jnp.int32)
    if hist_y is None:
        hist_y = jnp.zeros((CBy,), jnp.int32)

    def build():
        return build_spatial_packed_balanced_mesh2d_frame(
            cfg, colliders, n_substeps, mesh, K, budget, rx, ry, interpret
        )

    frame = build()
    local_cap = p.x.shape[0] // (Sx * Sy)
    for _ in range(n_frames):
        while True:
            p2, t2, bx2, by2, hx2, hy2, needed, n_act = frame(
                p, t, bounds_x, bounds_y, hist_x, hist_y
            )
            needed, n_act = int(needed), int(n_act)
            grow = False
            if needed > budget:
                if needed >= local_cap:
                    raise RuntimeError(
                        f"shard capacity exhausted ({needed} arrivals vs "
                        f"{local_cap} local slots); reshard with more slack"
                    )
                budget, grow = -(-2 * needed // 64) * 64, True
            if n_act > K:
                K, grow = -(-2 * n_act // 64) * 64, True
            if not grow:
                p, t = p2, t2
                bounds_x, bounds_y, hist_x, hist_y = bx2, by2, hx2, hy2
                break
            frame = build()
    return p, t, dict(K=K, budget=budget, bounds_x=bounds_x,
                      bounds_y=bounds_y, hist_x=hist_x, hist_y=hist_y)
