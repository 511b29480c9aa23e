"""Blocked particle/grid layout: sort, bin, halo-merge, tile extraction.

The TPU-native replacement for SPGrid + per-substep particle sort
(/root/reference/src/mpm.cpp:770-918 ``sort_particles_and_populate_grid``
and SPGrid's page maps): particles are sorted by 4^3-cell grid block
every substep, per-block [start, end) ranges feed the Pallas transfer
kernels, and the sparse paged grid becomes a dense blocked HBM array
``G[Bx, lx, By, ly, Bz, lz, c]`` with node coordinate
``g_axis = 4*(B-1) + l`` (one extra block of slack on each side so every
stencil of a clamped particle stays in bounds).

P2G writes per-block halo tiles (7 nodes per axis: the stencil support of
a block's particles, cf. the reference's GridCache, transfer.cpp:52-156);
``merge_tiles`` folds overlapping halos into the dense grid with pure
slice-adds (no scatter). ``extract_tiles`` builds the G2P input tiles
(the same 7^3 support) with concat-shifts (no gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig

BLOCK = 4  # cells per block per axis
TILE = 7  # nodes per axis touched by a block's particles (quadratic)


def num_blocks(cfg: SimConfig):
    return tuple(-(-r // BLOCK) for r in cfg.res)


def grid_shape_blocked(cfg: SimConfig):
    nb = num_blocks(cfg)
    return tuple(n + 2 for n in nb)


def block_id_of(x, cfg: SimConfig):
    """Linearized block id per particle; inactive handled by caller."""
    nb = num_blocks(cfg)
    pos = x * cfg.inv_dx
    bid = jnp.zeros(x.shape[:-1], jnp.int32)
    for k, n in enumerate(nb):
        cell = jnp.clip(jnp.floor(pos[..., k]).astype(jnp.int32), 0, cfg.res[k] - 1)
        bid = bid * n + (cell // BLOCK)
    return bid


def sort_particles(p, cfg: SimConfig):
    """Sort the particle pytree by block id (inactive slots to the end).

    Returns (sorted particles, sorted keys, permutation)."""
    nb = num_blocks(cfg)
    total = nb[0] * nb[1] * nb[2] if len(nb) == 3 else nb[0] * nb[1]
    keys = jnp.where(p.active, block_id_of(p.x, cfg), total)
    order = jnp.argsort(keys, stable=True)
    keys_sorted = keys[order]
    p_sorted = jax.tree.map(lambda a: a[order], p)
    return p_sorted, keys_sorted, order


def block_starts(keys_sorted, total_blocks: int):
    """starts[b] = first sorted index of block b; starts[total] = #active."""
    return jnp.searchsorted(
        keys_sorted, jnp.arange(total_blocks + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Halo merge: per-block (7,4,7,7) tiles [i, c, j, k] -> dense blocked grid
# ---------------------------------------------------------------------------


def _merge_axis(t, axis_pairs):
    """Fold a 7-node tile axis into a (nb+2, 4) blocked node axis.

    t: (..., nb, 7, ...) with the tile axis at position `axis_pairs[0]` and
    the block axis right before it. Local tile node i maps to
    (B, l) = (b + (i+1)//4 ... ) — explicitly:
      i=0 -> (b, 3); i=1..4 -> (b+1, i-1); i=5 -> (b+2, 0); i=6 -> (b+2, 1)
    """
    baxis, taxis = axis_pairs
    nb = t.shape[baxis]

    def sl(arr, ax, s):
        idx = [slice(None)] * arr.ndim
        idx[ax] = s
        return arr[tuple(idx)]

    out_shape = list(t.shape)
    out_shape[baxis] = nb + 2
    out_shape[taxis] = 4
    out = jnp.zeros(out_shape, t.dtype)

    def add_at(out, b_s, l_s, tile_i):
        piece = sl(t, taxis, tile_i)  # tile node slice
        idx = [slice(None)] * out.ndim
        idx[baxis] = b_s
        idx[taxis] = l_s
        return out.at[tuple(idx)].add(piece)

    out = add_at(out, slice(1, nb + 1), slice(0, 4), slice(1, 5))  # core
    out = add_at(out, slice(0, nb), slice(3, 4), slice(0, 1))  # low halo
    out = add_at(out, slice(2, nb + 2), slice(0, 1), slice(5, 6))  # high halo
    out = add_at(out, slice(2, nb + 2), slice(1, 2), slice(6, 7))  # high halo
    return out


def merge_tiles(tiles, cfg: SimConfig):
    """tiles (NB, 7, C, 7, 7) [i, c, j, k] -> G (nbx+2,4, nby+2,4, nbz+2,4, C)."""
    nbx, nby, nbz = num_blocks(cfg)
    C = tiles.shape[2]
    t = tiles.reshape(nbx, nby, nbz, TILE, C, TILE, TILE)
    # -> (bx, ix, by, jy, bz, kz, c)
    t = jnp.transpose(t, (0, 3, 1, 5, 2, 6, 4))
    t = _merge_axis(t, (0, 1))  # x: (nbx+2, 4, ...)
    t = _merge_axis(t, (2, 3))  # y
    t = _merge_axis(t, (4, 5))  # z
    return t  # (nbx+2, 4, nby+2, 4, nbz+2, 4, C)


def node_coords_blocked(cfg: SimConfig, dtype=jnp.float32):
    """Physical coordinates of every node of the blocked grid, shape
    (nbx+2, 4, nby+2, 4, nbz+2, 4, 3)."""
    nb = num_blocks(cfg)
    axes = []
    for n in nb:
        B = jnp.arange(n + 2, dtype=dtype)[:, None]
        l = jnp.arange(4, dtype=dtype)[None, :]
        axes.append(((B - 1.0) * 4.0 + l) * cfg.dx)
    gx = axes[0][:, :, None, None, None, None]
    gy = axes[1][None, None, :, :, None, None]
    gz = axes[2][None, None, None, None, :, :]
    shape = (nb[0] + 2, 4, nb[1] + 2, 4, nb[2] + 2, 4)
    return (
        jnp.broadcast_to(gx, shape),
        jnp.broadcast_to(gy, shape),
        jnp.broadcast_to(gz, shape),
    )


# ---------------------------------------------------------------------------
# G2P tile extraction: dense blocked grid -> (NB, 49, C*7) tiles
# ---------------------------------------------------------------------------


def _extract_axis(G, axis_pairs):
    """Inverse of _merge_axis: blocked (nb+2, 4) axis -> (nb, 7) tile axis.

    tile[b, i] = G[b + (i==0 ? 0 : i<=4 ? 1 : 2), l(i)] per the same map.
    """
    baxis, laxis = axis_pairs
    nbp2 = G.shape[baxis]
    nb = nbp2 - 2

    def sl(arr, spec):
        idx = [slice(None)] * arr.ndim
        for ax, s in spec:
            idx[ax] = s
        return arr[tuple(idx)]

    low = sl(G, [(baxis, slice(0, nb)), (laxis, slice(3, 4))])  # i=0
    core = sl(G, [(baxis, slice(1, nb + 1)), (laxis, slice(0, 4))])  # i=1..4
    high = sl(G, [(baxis, slice(2, nb + 2)), (laxis, slice(0, 2))])  # i=5,6
    return jnp.concatenate([low, core, high], axis=laxis)


def extract_tiles(G, cfg: SimConfig):
    """G (nbx+2,4, nby+2,4, nbz+2,4, C) -> tiles (NB, 24, 128) laid out as
    [(c,i), (j,k)] with zero padding (21 live rows, 49 live lanes) —
    exactly the lhs operand of the G2P matmul and a DMA-legal tile
    (lane dimension a multiple of 128)."""
    nbx, nby, nbz = num_blocks(cfg)
    C = G.shape[-1]
    t = _extract_axis(G, (0, 1))  # x -> (nbx, 7x, nby+2, 4, nbz+2, 4, C)
    t = _extract_axis(t, (2, 3))  # y
    t = _extract_axis(t, (4, 5))  # z: (nbx, 7i, nby, 7j, nbz, 7k, C)
    t = jnp.transpose(t, (0, 2, 4, 6, 1, 3, 5))  # (bx,by,bz, c, i, j, k)
    t = t.reshape(nbx * nby * nbz, C * TILE, TILE * TILE)
    return jnp.pad(t, ((0, 0), (0, 24 - C * TILE), (0, 128 - TILE * TILE)))
