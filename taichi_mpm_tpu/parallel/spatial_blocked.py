"""Multi-chip spatial decomposition over the BLOCKED performance path.

`parallel/spatial.py` decomposes the domain with the portable XLA
transfers; this module runs the Pallas/record machinery per shard:

  * each shard simulates its x-slab in a LOCAL coordinate frame shifted
    by one ghost block (local cell x = global x - s*Wc + 4), with a
    local SimConfig of res_x = Wc + 8 — so the whole single-chip blocked
    pipeline (packed sort, page map, P2G tiles, MXU record merge, window
    assembly, G2P) runs unmodified on local data;
  * after the record merge, the two overlapping block columns at each
    slab boundary are summed with ONE symmetric ppermute exchange per
    direction (both copies end up with identical complete sums, so the
    nonlinear grid update may run redundantly and windows need no second
    exchange — same invariant as spatial.halo_allreduce);
  * particles that drift across slab boundaries migrate with the
    fixed-budget ppermute machinery reused from parallel.spatial.

Limitations (round-1): 3D only, no CPIC in multi-chip, per-substep sort.
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
from taichi_mpm_tpu.ops.blocked import sort_particles
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


def _to_local(x, s, cfg: SimConfig, n_shards: int):
    Wc = slab_cells(cfg, n_shards)
    off = (s * Wc - GHOST_CELLS).astype(jnp.float32) * cfg.dx
    return x - jnp.asarray([off, 0.0, 0.0], jnp.float32)


def _to_global(x, s, cfg: SimConfig, n_shards: int):
    Wc = slab_cells(cfg, n_shards)
    off = (s * Wc - GHOST_CELLS).astype(jnp.float32) * cfg.dx
    return x + jnp.asarray([off, 0.0, 0.0], jnp.float32)


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
    return jnp.stack(planes, 0), None


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
            jnp.where(ok, planes[i], 0.0).reshape(-1, 256)
        )
    return rec


def exchange_boundary_records(rec, pm, lcfg: SimConfig, axis: str, n_shards: int, Wb: int):
    """Symmetric sum of the two overlapping block columns per boundary.

    Local col L maps to global col s*Wb - 1 + L: my high cols
    {Wb, Wb+1} overlap the right neighbor's low cols {0, 1}."""
    lo_cols = (0, 1)
    hi_cols = (Wb, Wb + 1)
    lo_planes, _ = _boundary_planes(rec, pm, lcfg, lo_cols)
    hi_planes, _ = _boundary_planes(rec, pm, lcfg, hi_cols)
    right = [(i, i + 1) for i in range(n_shards - 1)]
    left = [(i + 1, i) for i in range(n_shards - 1)]
    from_left = jax.lax.ppermute(hi_planes, axis, right)   # their hi -> my lo
    from_right = jax.lax.ppermute(lo_planes, axis, left)   # their lo -> my hi
    rec = _add_planes(rec, pm, lcfg, lo_cols, from_left)
    rec = _add_planes(rec, pm, lcfg, hi_cols, from_right)
    return rec


def spatial_blocked_substep(
    p: Particles, t, cfg: SimConfig, colliders, dt, axis: str,
    n_shards: int, K: int, budget: int, interpret: bool = False,
):
    """One substep: local blocked pipeline + record-plane halo exchange
    + particle migration. Particle positions stay GLOBAL in the carry;
    the local frame exists only inside the substep."""
    s = jax.lax.axis_index(axis)
    lcfg = local_config(cfg, n_shards)
    Wb = slab_cells(cfg, n_shards) // 4
    n = p.capacity
    pw = _round_up(n, CHUNK)

    p_loc = dataclasses.replace(p, x=_to_local(p.x, s, cfg, n_shards))
    p_loc, keys, _ = sort_particles(p_loc, lcfg)
    pm = build_page_map_full(keys, lcfg, K)

    pdata = prep_p2g(p_loc, keys, lcfg, dt, origin=pm["origin"])
    tiles = p2g_blocked(pm["s_arr"], pm["e_arr"], pdata, interpret=interpret)
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
    rec = exchange_boundary_records(rec, pm, lcfg, axis, n_shards, Wb)

    # shard 0's low ghost column is global block -1 (nodes < 0): the
    # single-chip path has no owner for those nodes and drops them —
    # zero the column so multi-chip matches exactly
    nbp = blocked.num_blocks_padded(lcfg)
    by = jnp.arange(nbp[1], dtype=jnp.int32)[:, None]
    bz = jnp.arange(nbp[2], dtype=jnp.int32)[None, :]
    bid0 = (0 * nbp[1] + by) * nbp[2] + bz
    slot0 = pm["slot_map"][bid0]
    ok0 = ((slot0 < K) & (s == 0))[..., None]
    rec = rec.at[jnp.minimum(slot0, K - 1).reshape(-1)].multiply(
        jnp.where(ok0, 0.0, 1.0).reshape(-1, 1)
    )

    # grid update needs GLOBAL node coordinates for the colliders:
    # shift the collider frame instead of the nodes
    Wc = slab_cells(cfg, n_shards)
    xoff = (s * Wc - GHOST_CELLS).astype(jnp.float32) * cfg.dx

    shifted = tuple(
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
    vrec = grid_update_flat(rec, pm["ids"], lcfg, shifted, t, dt)
    gtiles = blocked.windows_mm(vrec, pm["nbr"])

    keys2d = jnp.pad(
        pm["slot_keys"][None, :], ((0, 0), (0, pw - n)), constant_values=K
    )
    posg = jnp.pad(pdata[13:16, :pw], ((0, 5), (0, 0)))
    pout = g2p_blocked(keys2d, posg, gtiles, jnp.asarray([K], jnp.int32),
                       interpret=interpret)
    pout = pout[:, :n].T
    v_new = jnp.where(p_loc.active[:, None], pout[:, 0:3], 0.0)
    b_new = jnp.where(p_loc.active[:, None, None], pout[:, 3:12].reshape(n, 3, 3), 0.0)
    # advect in the local frame but clamp in the GLOBAL frame: convert
    # back first, then finish with the global config
    p_glob = dataclasses.replace(p_loc, x=_to_global(p_loc.x, s, cfg, n_shards))
    p_glob = g2p_finish(p_glob, v_new, b_new, cfg, dt)

    p_glob, dropped = migrate(p_glob, s, axis, cfg, n_shards, budget)
    return p_glob, t + dt, dropped, pm["n_act"]


def build_spatial_blocked_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh,
    axis: str = "x", K: int = 1024, budget: int = 256,
    interpret: bool = False,
):
    """Jitted shard_map frame over a 1-D mesh using the blocked pipeline."""
    n_shards = mesh.shape[axis]

    def local_frame(p: Particles, t):
        def body(carry, _):
            pp, tt, dr, na = carry
            pp, tt, d2, n_act = spatial_blocked_substep(
                pp, tt, cfg, colliders, cfg.base_dt, axis, n_shards, K,
                budget, interpret=interpret,
            )
            return (pp, tt, dr + d2, jnp.maximum(na, n_act)), None

        (p, t, dropped, n_act), _ = jax.lax.scan(
            body, (p, t, jnp.int32(0), jnp.int32(0)), None, length=n_substeps
        )
        return p, t, jax.lax.psum(dropped, axis), jax.lax.pmax(n_act, axis)

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


# migration uses parallel.spatial's slab definition (cells per shard):
# it computes destinations from GLOBAL positions, which is exactly the
# frame we return to before migrating.
