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

import functools
import os as _os

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

    Returns (sorted particles, sorted keys, permutation)."""
    nbp = num_blocks_padded(cfg)
    total = 1
    for nn in nbp:
        total *= nn
    keys = jnp.where(p.active, block_id_of(p.x, cfg), total)
    return sort_particles_by_keys(p, keys)


def sort_particles_by_keys(p, keys):
    """Sort the particle pytree by precomputed keys (the multichip path
    keys by LOCAL-frame block ids while positions stay global). The
    pytree is packed into one (P, F) f32 matrix first so the permutation
    is ONE wide-row gather instead of 14 narrow ones (the narrow gathers
    dominated the substep on TPU)."""
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
    """The whole page map from the sorted keys via ONE searchsorted of
    all (total_blocks+1) candidate ids into the sorted key array.

    The binary search runs ~log2(P) rounds over total_blocks queries
    (36k at res 125^3) — measured far cheaper than the previous 8M-entry
    segment-min/max scatters (XLA scatters cost ~14 ns PER ELEMENT of
    the scattered operand; the while-loop costs per QUERY). Revisit if
    res grows to where total_blocks rivals the particle count.

    Returns (ids, n_act, slot_map, s_arr, e_arr):
      ids   (K,) active (occupied + 27-dilated) padded block ids asc.;
      n_act true dilated occupancy (may exceed K -> driver re-jits);
      slot_map (total+1,) block id -> slot (K = none);
      s_arr/e_arr (K,) sorted particle range per slot (empty: s == e).
    """
    nbp = num_blocks_padded(cfg)
    total = total_blocks_padded(cfg)
    starts = jnp.searchsorted(
        keys_sorted, jnp.arange(total + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    occ = (starts[1:] - starts[:-1]) > 0
    occ = occ.reshape(nbp)
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

    safe = jnp.minimum(ids, total - 1)
    live = ids < total
    # sentinel slots carry the collapsed range [n_active, n_active):
    # empty AND ordered after every live range, so the batched P2G
    # kernel's per-group union range [s(first), e(last)) stays valid
    s_arr = jnp.where(live, starts[safe], starts[total])
    e_arr = jnp.where(live, starts[jnp.minimum(safe + 1, total)], starts[total])
    return ids, n_act, slot_map, s_arr, e_arr


def neighbor_slots(ids, slot_map, cfg: SimConfig):
    """(27, K) active-slot ids of each active block's 27-neighborhood
    (row (ox*3+oy)*3+oz = offset (ox-1, oy-1, oz-1)); K (sentinel)
    where the neighbor is out of domain or inactive. Row-per-offset
    keeps the table layout-clean: a (K, 3, 3, 3) minor-dim shape tiles
    to (4, 128) with ~40x padding and its 27 slices cost ~5 ms at 8M."""
    nbx, nby, nbz = num_blocks_padded(cfg)
    nbt = nbx * nby * nbz
    bx, by, bz, valid = _decode_ids(ids, cfg)
    rows = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                X, Y, Z = bx + ox, by + oy, bz + oz
                inb = (
                    (X >= 0) & (X < nbx) & (Y >= 0) & (Y < nby)
                    & (Z >= 0) & (Z < nbz) & valid
                )
                nid = jnp.where(inb, (X * nby + Y) * nbz + Z, nbt)
                rows.append(slot_map[nid])
    return jnp.stack(rows, 0)


def nbr_at(nbr, ox: int, oy: int, oz: int):
    """Neighbor slot row for offset index (ox, oy, oz) in 0..2 each."""
    return nbr[(ox * 3 + oy) * 3 + oz]


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


# ---------------------------------------------------------------------------
# MXU-formulated halo merge / window assembly.
#
# The straightforward 5-D (K, 7, 7, 7, C) piece arithmetic is hostile to
# the TPU layout engine (minor dims (7, 4) tile to (4, 128): an 18x pad
# blowup on every op). Instead, tiles and records live as clean 2-D rows
# and the static piece-selection pattern becomes 27 matmuls against
# precomputed 0/1 matrices — the merge rides the MXU:
#
#   rec (K, 256)  = sum_o  gather(tiles (K, 1372), nbr_o) @ M_o
#   win (K, 3072) = sum_o  gather(vrec (K, 192),  nbr_o) @ W_o
#
# Layouts: tile rows = P2G output [(i,c), (j,k)] flattened (1372);
# record rows = c*64 + lx*16 + ly*4 + lz (c-major, so mass is the
# contiguous lane block [192:256]); window rows = the G2P operand
# [(c,i), (j,k)] embedded in (24, 128).
# ---------------------------------------------------------------------------

_TILE_FLAT = 28 * 49  # 1372
_REC_FLAT = 4 * 64  # 256
_VREC_FLAT = 3 * 64  # 192
_WIN_FLAT = 24 * 128  # 3072

_mm_cache = {}


def _offset_maps():
    """For each neighbor offset index o in 0..2 (block offset o-1), the
    list of (lane l, tile index i) pairs (records<-tiles) and
    (window w, lane l) pairs (windows<-records)."""
    rec, win = [], []
    for o in range(3):
        ob = o - 1
        rec.append([(l, l - 4 * ob + 1) for l in range(4) if 0 <= l - 4 * ob + 1 < 7])
        win.append(
            [(w, w - 1 - 4 * ob) for w in range(7) if 0 <= w - 1 - 4 * ob < 4]
        )
    return rec, win


def _merge_matrices():
    """27 static (1372, 256) 0/1 matrices: tile flat index -> record lane."""
    if "M" in _mm_cache:
        return _mm_cache["M"]
    recmap, _ = _offset_maps()
    mats = np.zeros((3, 3, 3, _TILE_FLAT, _REC_FLAT), np.float32)
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                for lx, ix in recmap[ox]:
                    for ly, iy in recmap[oy]:
                        for lz, iz in recmap[oz]:
                            for c in range(4):
                                ti = (ix * 4 + c) * 49 + iy * 7 + iz
                                ri = c * 64 + lx * 16 + ly * 4 + lz
                                mats[ox, oy, oz, ti, ri] = 1.0
    _mm_cache["M"] = mats
    return mats


def _window_matrices():
    """27 static (192, 3072) 0/1 matrices: velocity record lane -> G2P
    operand entry [(c, wx) row, (wy, wz) lane]."""
    if "W" in _mm_cache:
        return _mm_cache["W"]
    _, winmap = _offset_maps()
    mats = np.zeros((3, 3, 3, _VREC_FLAT, _WIN_FLAT), np.float32)
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                for wx, lx in winmap[ox]:
                    for wy, ly in winmap[oy]:
                        for wz, lz in winmap[oz]:
                            for c in range(3):
                                ri = c * 64 + lx * 16 + ly * 4 + lz
                                wi = (c * 7 + wx) * 128 + wy * 7 + wz
                                mats[ox, oy, oz, ri, wi] = 1.0
    _mm_cache["W"] = mats
    return mats


def _mm_hi(a, b):
    """Selection matmul in TWO bf16 passes: the 0/1 matrix is EXACT in
    bf16 (its low split is identically zero), so of the classic 3-pass
    split (ah bh + ah bl + al bh) only the data operand's split
    survives: (ah + al) @ b — same ~22 data mantissa bits as the
    BF16_BF16_F32_X3 preset used previously (whose ah@bl pass
    multiplied by an all-zero matrix) at 2/3 the MXU work. Measured
    31x faster than the f32 HIGHEST path on v5e for these shapes."""
    if _os.environ.get("TMT_MM2", "0") != "1":  # gate: 2-pass measured not faster than X3 at 8M (r4)
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
        )
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    return d(ah, bh) + d(al, bh)


def merge_tiles_mm27(tiles, nbr):
    """tiles (K, 28, 49) P2G halo tiles -> node records (K, 256) flat
    (c-major lanes). One row gather + one MXU matmul per neighbor offset.
    Kept as the oracle for the separable 3-stage version below."""
    K = tiles.shape[0]
    tf = tiles.reshape(K, _TILE_FLAT)
    tp = jnp.concatenate([tf, jnp.zeros((1, _TILE_FLAT), tf.dtype)], 0)
    M = _merge_matrices()
    rec = jnp.zeros((K, _REC_FLAT), tf.dtype)
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                rows = tf if (ox, oy, oz) == (1, 1, 1) else tp[nbr_at(nbr, ox, oy, oz)]
                rec = rec + _mm_hi(rows, jnp.asarray(M[ox, oy, oz]))
    return rec


def windows_mm27(vrec, nbr):
    """Velocity records (K, 192) -> G2P operand tiles (K, 24, 128).
    27-offset oracle for the separable version below."""
    K = vrec.shape[0]
    vp = jnp.concatenate([vrec, jnp.zeros((1, _VREC_FLAT), vrec.dtype)], 0)
    W = _window_matrices()
    win = jnp.zeros((K, _WIN_FLAT), vrec.dtype)
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                rows = vrec if (ox, oy, oz) == (1, 1, 1) else vp[nbr_at(nbr, ox, oy, oz)]
                win = win + _mm_hi(rows, jnp.asarray(W[ox, oy, oz]))
    return win.reshape(K, 24, 128)


# ---------------------------------------------------------------------------
# Separable (per-axis) halo merge / window assembly.
#
# The 27-offset formulation gathers the full neighbor rows 27 times and
# re-writes the accumulator 27 times. Offsets compose per axis:
# neighbor(ox,oy,oz) = x-step(ox) o y-step(oy) o z-step(oz) — so the
# merge runs as 3 stages of 3 single-axis offsets each (9 gathers + 9
# matmuls instead of 27), with far smaller intermediates. Correctness of
# the composition relies on the fat page map: a nonzero source block is
# occupied, hence its whole 27-neighborhood (including every chain
# intermediate) is an active slot (active_block_ids dilation — the
# reference's fat_page_map, mpm.cpp:832-865).
#
# Stage layouts (merge):   (i,c,j,k)1372 -z-> (ic,j,lz)784 -y->
#   (ic,ly,lz)448 -x-> (c,lx,ly,lz)256
# Stage layouts (windows): (c,lx,ly,lz)192 -x-> (c,wx,ly,lz)336 -y->
#   (c,wx,wy,lz)588 -z-> (c,wx | wy,wz)3072
# ---------------------------------------------------------------------------


def _merge_axis_matrices():
    if "Msep" in _mm_cache:
        return _mm_cache["Msep"]
    recmap, _ = _offset_maps()
    M1 = np.zeros((3, _TILE_FLAT, 28 * 7 * 4), np.float32)  # fold k -> lz
    M2 = np.zeros((3, 28 * 7 * 4, 28 * 16), np.float32)  # fold j -> ly
    M3 = np.zeros((3, 28 * 16, _REC_FLAT), np.float32)  # fold i -> lx
    for o in range(3):
        for lz, iz in recmap[o]:
            for ic in range(28):
                for j in range(TILE):
                    M1[o, ic * 49 + j * 7 + iz, (ic * 7 + j) * 4 + lz] = 1.0
        for ly, iy in recmap[o]:
            for ic in range(28):
                for lz in range(4):
                    M2[o, (ic * 7 + iy) * 4 + lz, ic * 16 + ly * 4 + lz] = 1.0
        for lx, ix in recmap[o]:
            for c in range(4):
                for ly in range(4):
                    for lz in range(4):
                        M3[
                            o,
                            (ix * 4 + c) * 16 + ly * 4 + lz,
                            c * 64 + lx * 16 + ly * 4 + lz,
                        ] = 1.0
    _mm_cache["Msep"] = (M1, M2, M3)
    return _mm_cache["Msep"]


def _window_axis_matrices():
    if "Wsep" in _mm_cache:
        return _mm_cache["Wsep"]
    _, winmap = _offset_maps()
    W1 = np.zeros((3, _VREC_FLAT, 3 * 7 * 16), np.float32)  # lx -> wx
    W2 = np.zeros((3, 3 * 7 * 16, 3 * 7 * 28), np.float32)  # ly -> wy
    W3 = np.zeros((3, 3 * 7 * 28, _WIN_FLAT), np.float32)  # lz -> wz
    for o in range(3):
        for wx, lx in winmap[o]:
            for c in range(3):
                for ly in range(4):
                    for lz in range(4):
                        W1[
                            o,
                            c * 64 + lx * 16 + ly * 4 + lz,
                            (c * 7 + wx) * 16 + ly * 4 + lz,
                        ] = 1.0
        for wy, ly in winmap[o]:
            for cwx in range(21):
                for lz in range(4):
                    W2[o, cwx * 16 + ly * 4 + lz, cwx * 28 + wy * 4 + lz] = 1.0
        for wz, lz in winmap[o]:
            for cwx in range(21):
                for wy in range(TILE):
                    W3[o, cwx * 28 + wy * 4 + lz, cwx * 128 + wy * 7 + wz] = 1.0
    _mm_cache["Wsep"] = (W1, W2, W3)
    return _mm_cache["Wsep"]


def _sep_stage(rows, nbr_ax, mats):
    """One separable stage: sum over the 3 single-axis offsets of
    gather(rows, nbr_ax[o]) @ mats[o] (offset 1 = self, no gather)."""
    K, k_in = rows.shape
    rp = jnp.concatenate([rows, jnp.zeros((1, k_in), rows.dtype)], 0)
    out = None
    for o in range(3):
        src = rows if o == 1 else rp[nbr_ax[o]]
        term = _mm_hi(src, jnp.asarray(mats[o]))
        out = term if out is None else out + term
    return out


def merge_tiles_mm(tiles, nbr):
    """tiles (K, 28, 49) -> node records (K, 256), separable 3-stage
    per-axis fold (z, then y, then x)."""
    K = tiles.shape[0]
    M1, M2, M3 = _merge_axis_matrices()
    s = tiles.reshape(K, _TILE_FLAT)
    s = _sep_stage(s, [nbr_at(nbr, 1, 1, o) for o in range(3)], M1)
    s = _sep_stage(s, [nbr_at(nbr, 1, o, 1) for o in range(3)], M2)
    s = _sep_stage(s, [nbr_at(nbr, o, 1, 1) for o in range(3)], M3)
    return s


def windows_mm(vrec, nbr):
    """Velocity records (K, 192) -> G2P operand tiles (K, 24, 128),
    separable 3-stage per-axis assembly (x, then y, then z)."""
    K = vrec.shape[0]
    W1, W2, W3 = _window_axis_matrices()
    s = _sep_stage(vrec, [nbr_at(nbr, o, 1, 1) for o in range(3)], W1)
    s = _sep_stage(s, [nbr_at(nbr, 1, o, 1) for o in range(3)], W2)
    s = _sep_stage(s, [nbr_at(nbr, 1, 1, o) for o in range(3)], W3)
    return s.reshape(K, 24, 128)


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
    # Gather each offset's FULL neighbor tiles (big 5.5 KB rows run at
    # HBM bandwidth), then take the static sub-piece; gathering the tiny
    # pieces directly serializes into per-row DMAs (~100x slower).
    for ox, lx, ix in _REC_GROUPS:
        for oy, ly, iy in _REC_GROUPS:
            for oz, lz, iz in _REC_GROUPS:
                if (ox, oy, oz) == (1, 1, 1):
                    full = tp[:-1]  # self: no gather
                else:
                    full = tp[nbr_at(nbr, ox, oy, oz)]
                rec = rec.at[:, lx, ly, lz, :].add(full[:, ix, iy, iz, :])
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
                if (ox, oy, oz) == (1, 1, 1):
                    full = rp[:-1]
                else:
                    full = rp[nbr_at(nbr, ox, oy, oz)]
                win = win.at[:, wx, wy, wz, :].set(full[:, lx, ly, lz, :])
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


