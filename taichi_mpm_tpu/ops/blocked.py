"""Blocked particle/grid layout: sort, bin, halo-merge, tile extraction.

The TPU-native replacement for SPGrid + per-substep particle sort
(/root/reference/src/mpm.cpp:770-918 ``sort_particles_and_populate_grid``
and SPGrid's page maps): particles are sorted by 4^3-cell grid block
every substep, per-block [start, end) ranges feed the Pallas transfer
kernels, and the sparse paged grid becomes a dense blocked HBM array
of per-active-block node records (K, 4, 4, 4, C) in a padded block-id
space (one extra block per axis owns the high-edge halo nodes).

P2G writes per-block halo tiles (7 nodes per axis: the stencil support of
a block's particles, cf. the reference's GridCache, transfer.cpp:52-156);
``tiles_to_records`` sums overlapping halos into per-active-block node
records with row gathers (no scatter anywhere), and
``records_to_windows`` assembles each block's 7^3 stencil window the
same way — the whole grid is K active block records; nothing dense is
ever materialized.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig

BLOCK = 4  # cells per block per axis
TILE = 7  # nodes per axis touched by a block's particles (quadratic)


def num_blocks(cfg: SimConfig):
    return tuple(-(-r // BLOCK) for r in cfg.res)


def num_blocks_padded(cfg: SimConfig):
    """Block-id space for node records: one extra block per axis so the
    high-edge halo nodes (up to res+1, grid_nodes = res+2) have owners —
    the analog of the reference's grid slack (mpm.cpp:50-62)."""
    return tuple(n + 1 for n in num_blocks(cfg))


def total_blocks_padded(cfg: SimConfig) -> int:
    nbp = num_blocks_padded(cfg)
    t = 1
    for n in nbp:
        t *= n
    return t


def grid_shape_blocked(cfg: SimConfig):
    nb = num_blocks(cfg)
    return tuple(n + 2 for n in nb)


def block_id_of(x, cfg: SimConfig):
    """Linearized block id per particle (in the PADDED id space, so the
    same ids index node records); inactive handled by caller."""
    nbp = num_blocks_padded(cfg)
    pos = x * cfg.inv_dx
    bid = jnp.zeros(x.shape[:-1], jnp.int32)
    for k, n in enumerate(nbp):
        cell = jnp.clip(jnp.floor(pos[..., k]).astype(jnp.int32), 0, cfg.res[k] - 1)
        bid = bid * n + (cell // BLOCK)
    return bid


def sort_particles(p, cfg: SimConfig):
    """Sort the particle pytree by block id (inactive slots to the end).

    Returns (sorted particles, sorted keys, permutation). The pytree is
    packed into one (P, F) f32 matrix first so the permutation is ONE
    wide-row gather instead of 14 narrow ones (the narrow gathers
    dominated the substep on TPU)."""
    nbp = num_blocks_padded(cfg)
    total = 1
    for nn in nbp:
        total *= nn
    keys = jnp.where(p.active, block_id_of(p.x, cfg), total)
    order = jnp.argsort(keys, stable=True)
    keys_sorted = keys[order]

    import dataclasses

    P = p.capacity
    fields = []
    meta = []  # (name, shape, dtype)
    for f in dataclasses.fields(p):
        a = getattr(p, f.name)
        meta.append((f.name, a.shape, a.dtype))
        flat = a.reshape(P, -1)
        if a.dtype == jnp.int32:
            flat = jax.lax.bitcast_convert_type(flat, jnp.float32)
        elif a.dtype == jnp.bool_:
            flat = flat.astype(jnp.float32)
        fields.append(flat)
    packed = jnp.concatenate(fields, axis=1)
    packed = packed[order]
    out = {}
    col = 0
    for name, shape, dtype in meta:
        w = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        piece = packed[:, col : col + w]
        col += w
        if dtype == jnp.int32:
            piece = jax.lax.bitcast_convert_type(piece, jnp.int32)
        elif dtype == jnp.bool_:
            piece = piece > 0.5
        out[name] = piece.reshape(shape)
    return type(p)(**out), keys_sorted, order


def block_starts(keys_sorted, total_blocks: int):
    """starts[b] = first sorted index of block b; starts[total] = #active."""
    return jnp.searchsorted(
        keys_sorted, jnp.arange(total_blocks + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Active-block compaction: the TPU analog of SPGrid's page map
# (SPGrid_Page_Map.h:63-106 — work and transfer memory scale with
# *occupied* blocks, not domain volume). K is the static active-block
# capacity; runtime occupancy beyond K is reported so the driver can
# re-jit with a larger K and re-run (dynamic page-map growth, functional
# style).
# ---------------------------------------------------------------------------

def active_block_ids(starts, cfg: SimConfig, K: int):
    """Active block set = occupied blocks DILATED by their 27-neighborhood
    (the reference's fat_page_map: occupied + one-block halo,
    mpm.cpp:832-865) so every halo node written by a tile or read by a
    window has a record owner. Returns (ids (K,), n_act, slot_map):
    first K active padded block ids ascending (sentinel = total for
    unused slots)."""
    nbp = num_blocks_padded(cfg)
    total = total_blocks_padded(cfg)
    counts = starts[1:] - starts[:-1]
    occ = (counts > 0).reshape(nbp)
    # 27-neighborhood dilation by three 1-D max-pools
    for ax in range(3):
        lo = jnp.concatenate(
            [occ.take(jnp.arange(1, occ.shape[ax]), axis=ax),
             jnp.zeros_like(occ.take(jnp.arange(0, 1), axis=ax))], axis=ax
        )
        hi = jnp.concatenate(
            [jnp.zeros_like(occ.take(jnp.arange(0, 1), axis=ax)),
             occ.take(jnp.arange(0, occ.shape[ax] - 1), axis=ax)], axis=ax
        )
        occ = occ | lo | hi
    occ = occ.reshape(-1)
    order = jnp.argsort(~occ, stable=True).astype(jnp.int32)
    if K > total:
        order = jnp.pad(order, (0, K - total), constant_values=total)
    n_act = jnp.sum(occ.astype(jnp.int32))
    slot_idx = jnp.arange(K, dtype=jnp.int32)
    ids = jnp.where(slot_idx < n_act, order[:K], total)
    slot_map = jnp.full((total + 1,), K, jnp.int32)
    slot_map = slot_map.at[jnp.minimum(ids, total)].set(
        jnp.where(slot_idx < n_act, slot_idx, K)
    )
    slot_map = slot_map.at[total].set(K)
    return ids, n_act, slot_map


def build_page_map(keys_sorted, cfg: SimConfig, K: int):
    """The whole page map from the sorted keys in O(P + K) segment ops —
    no (total_blocks)-sized searchsorted (XLA lowers that to a 17-round
    binary-search while loop that dominated the substep).

    Returns (ids, n_act, slot_map, s_arr, e_arr):
      ids   (K,) active (occupied + 27-dilated) padded block ids asc.;
      n_act true dilated occupancy (may exceed K -> driver re-jits);
      slot_map (total+1,) block id -> slot (K = none);
      s_arr/e_arr (K,) sorted particle range per slot (empty: s == e).
    """
    nbp = num_blocks_padded(cfg)
    total = total_blocks_padded(cfg)
    P = keys_sorted.shape[0]
    iota = jnp.arange(P, dtype=jnp.int32)
    valid = keys_sorted < total
    first = valid & jnp.concatenate(
        [jnp.ones((1,), bool), keys_sorted[1:] != keys_sorted[:-1]]
    )
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_occ = jnp.maximum(jnp.max(jnp.where(valid, rank, -1)) + 1, 0)
    seg = jnp.where(valid, jnp.minimum(rank, K - 1), K)
    ids_occ = jax.ops.segment_min(
        keys_sorted, seg, num_segments=K + 1, indices_are_sorted=True
    )[:K]
    s_occ = jax.ops.segment_min(
        iota, seg, num_segments=K + 1, indices_are_sorted=True
    )[:K]
    e_occ = (
        jax.ops.segment_max(
            iota, seg, num_segments=K + 1, indices_are_sorted=True
        )[:K]
        + 1
    )
    slotv = jnp.arange(K, dtype=jnp.int32) < jnp.minimum(n_occ, K)
    ids_occ = jnp.where(slotv, ids_occ, total)
    s_occ = jnp.where(slotv, s_occ, 0)
    e_occ = jnp.where(slotv, e_occ, 0)

    # occupied grid (K-sized scatter) + 27-neighborhood dilation
    occ_grid = jnp.zeros((total + 1,), bool).at[jnp.minimum(ids_occ, total)].set(slotv)
    occ = occ_grid[:total].reshape(nbp)
    for ax in range(3):
        lo = jnp.concatenate(
            [occ.take(jnp.arange(1, occ.shape[ax]), axis=ax),
             jnp.zeros_like(occ.take(jnp.arange(0, 1), axis=ax))], axis=ax
        )
        hi = jnp.concatenate(
            [jnp.zeros_like(occ.take(jnp.arange(0, 1), axis=ax)),
             occ.take(jnp.arange(0, occ.shape[ax] - 1), axis=ax)], axis=ax
        )
        occ = occ | lo | hi
    occ = occ.reshape(-1)
    order = jnp.argsort(~occ, stable=True).astype(jnp.int32)
    if K > total:
        order = jnp.pad(order, (0, K - total), constant_values=total)
    n_act = jnp.sum(occ.astype(jnp.int32))
    slot_idx = jnp.arange(K, dtype=jnp.int32)
    ids = jnp.where(slot_idx < n_act, order[:K], total)
    slot_map = jnp.full((total + 1,), K, jnp.int32)
    slot_map = slot_map.at[jnp.minimum(ids, total)].set(
        jnp.where(slot_idx < n_act, slot_idx, K)
    )
    slot_map = slot_map.at[total].set(K)

    # particle ranges for active slots: match the two sorted K-lists
    pos = jnp.searchsorted(ids_occ, jnp.minimum(ids, total)).astype(jnp.int32)
    pos = jnp.minimum(pos, K - 1)
    found = ids_occ[pos] == ids
    s_arr = jnp.where(found, s_occ[pos], 0)
    e_arr = jnp.where(found, e_occ[pos], 0)
    return ids, n_act, slot_map, s_arr, e_arr


def neighbor_slots(ids, slot_map, cfg: SimConfig):
    """(K, 3, 3, 3) active-slot ids of each active block's 27-neighborhood
    (offsets -1..+1 per axis, padded block coords); K (sentinel) where
    the neighbor is out of domain or inactive."""
    nbx, nby, nbz = num_blocks_padded(cfg)
    nbt = nbx * nby * nbz
    bx, by, bz, valid = _decode_ids(ids, cfg)
    o = jnp.asarray([-1, 0, 1], jnp.int32)
    X = bx[:, None, None, None] + o[None, :, None, None]
    Y = by[:, None, None, None] + o[None, None, :, None]
    Z = bz[:, None, None, None] + o[None, None, None, :]
    inb = (
        (X >= 0) & (X < nbx) & (Y >= 0) & (Y < nby) & (Z >= 0) & (Z < nbz)
        & valid[:, None, None, None]
    )
    nid = (X * nby + Y) * nbz + Z
    nid = jnp.where(inb, nid, nbt)  # slot_map[nbt] = sentinel
    return slot_map[nid]


# static per-axis assembly tables ------------------------------------------
# records <- tiles: my lane l gets neighbor-at-offset-o's tile index
#   i = l - 4*o + 1  (valid combos below)
_REC_GROUPS = (  # (o_index 0..2 for offset -1/0/+1, lane slice, tile-i slice)
    (0, slice(0, 2), slice(5, 7)),   # left neighbor's high halo -> l 0,1
    (1, slice(0, 4), slice(1, 5)),   # own tile core -> l 0..3
    (2, slice(3, 4), slice(0, 1)),   # right neighbor's low halo -> l 3
)
# windows <- records: my window node w reads block b + (db-1), lane l
#   (same map as _DB/_L): w=0 -> (o=-1, l=3); w=1..4 -> (o=0, l=0..3);
#   w=5,6 -> (o=+1, l=0,1)
_WIN_GROUPS = (  # (o_index, window slice, record-lane slice)
    (0, slice(0, 1), slice(3, 4)),
    (1, slice(1, 5), slice(0, 4)),
    (2, slice(5, 7), slice(0, 2)),
)


def tiles_to_records(tiles_ijkc, nbr, K: int):
    """Halo-merge without scatter: each active block's (4,4,4,C) node
    record = sum of the overlapping pieces of its <=27 neighbors' halo
    tiles, all fetched with row gathers (the scatter-free dual of
    merge_tiles; replaces the reference's block-colored scatter,
    mpm.h:410-426).

    tiles_ijkc: (K, 7, 7, 7, C) [i, j, k, c] halo tiles.
    nbr: (K, 3, 3, 3) neighbor slot ids (K = none).
    """
    C = tiles_ijkc.shape[-1]
    pad = jnp.zeros((1, TILE, TILE, TILE, C), tiles_ijkc.dtype)
    tp = jnp.concatenate([tiles_ijkc, pad], 0)  # (K+1, ...)
    rec = jnp.zeros((tiles_ijkc.shape[0], BLOCK, BLOCK, BLOCK, C), tiles_ijkc.dtype)
    for ox, lx, ix in _REC_GROUPS:
        for oy, ly, iy in _REC_GROUPS:
            for oz, lz, iz in _REC_GROUPS:
                piece = tp[:, ix, iy, iz, :][nbr[:, ox, oy, oz]]
                rec = rec.at[:, lx, ly, lz, :].add(piece)
    return rec


def records_to_windows(rec, nbr, K: int):
    """Assemble each active block's 7^3 stencil-support window from its
    neighbors' node records (gather dual of extract_tiles)."""
    C = rec.shape[-1]
    pad = jnp.zeros((1, BLOCK, BLOCK, BLOCK, C), rec.dtype)
    rp = jnp.concatenate([rec, pad], 0)
    win = jnp.zeros((rec.shape[0], TILE, TILE, TILE, C), rec.dtype)
    for ox, wx, lx in _WIN_GROUPS:
        for oy, wy, ly in _WIN_GROUPS:
            for oz, wz, lz in _WIN_GROUPS:
                piece = rp[:, lx, ly, lz, :][nbr[:, ox, oy, oz]]
                win = win.at[:, wx, wy, wz, :].set(piece)
    return win


def _decode_ids(ids, cfg: SimConfig):
    """Decode PADDED block ids -> (bx, by, bz, valid)."""
    nbx, nby, nbz = num_blocks_padded(cfg)
    nbt = nbx * nby * nbz
    safe = jnp.minimum(ids, nbt - 1)
    bz = safe % nbz
    by = (safe // nbz) % nby
    bx = safe // (nbz * nby)
    return bx, by, bz, ids < nbt


def windows_to_g2p_tiles(t):
    """(K, 7, 7, 7, C>=3) windows -> (K, 24, 128) [(c,i), (j,k)] G2P
    operand (velocity channels only)."""
    K = t.shape[0]
    t = jnp.transpose(t[..., :3], (0, 4, 1, 2, 3)).reshape(K, 3 * TILE, TILE * TILE)
    return jnp.pad(t, ((0, 0), (0, 24 - 3 * TILE), (0, 128 - TILE * TILE)))


