"""Compatible-Particle-In-Cell (CPIC) grid CDF: rasterize + gather.

TPU-native re-design of /root/reference/src/rigid_transfer.cpp:
  * ``rasterize_rigid_boundary`` (:18-117): rigid surface particles
    scatter signed distance + color tags to grid nodes. The reference
    resolves write conflicts with per-node spinlocks; here the
    min-distance+id pair becomes a deterministic scatter-min on a packed
    int32 key, and the 2-bit color tags become per-rigid scatter-max
    planes (max over {2,3} == bitwise OR of the tag values).
  * ``gather_cdf`` (:120-277): particles acquire affinity bits and
    reconstruct signed distance + normal by weighted least squares over
    color-compatible nodes.

Bit layout matches GridState (mpm_fwd.h:78-112): rigid r owns bits
[2r, 2r+1]: bit 2r+1 = "touched", bit 2r = "negative side". int32 caps
the build at 12 rigid bodies, same as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.transfer import _ravel, stencil_offsets
from taichi_mpm_tpu.math.kernels import bspline_weights

# Distance quantization for the packed scatter-min key (20 fractional
# bits over [0, 4) grid units; low 8 bits hold rigid_id + 1).
_DIST_SCALE = float(1 << 20)
_KEY_INF = jnp.iinfo(jnp.int32).max

# MLS reconstruction determinant guards (mpm_fwd.h:121-129).
_GUARD = {2: 3e-3, 3: 1e-4}


def state_mask(num_rigids: int) -> int:
    """All 'touched' bits: 0b10 repeated per rigid (mpm.h:36 0xAAAA...)."""
    m = 0
    for r in range(num_rigids):
        m |= 2 << (2 * r)
    return m


def _explicit_inv(M):
    """Batched explicit 2x2 / 3x3 adjugate inverse. jnp.linalg.inv on
    a (B, 3, 3) batch lowers to an LuDecompositionBlock custom-call +
    batched triangular solves — measured ~13 ms/substep at 16.3k
    boundary elements in the r5 res-256 water_wheel trace (it was the
    single largest device op). The unrolled adjugate is a handful of
    VPU fusions (the CLAUDE.md batched-3x3 invariant applies to the
    bp-sized prologue too)."""
    d = M.shape[-1]
    if d == 2:
        a = M[..., 0, 0]
        b = M[..., 0, 1]
        c = M[..., 1, 0]
        dd = M[..., 1, 1]
        det = a * dd - b * c
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        return jnp.stack([
            jnp.stack([dd * inv_det, -b * inv_det], -1),
            jnp.stack([-c * inv_det, a * inv_det], -1),
        ], -2)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    dm, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - dm * i
    A11 = a * i - c * g
    A12 = c * dm - a * f
    A20 = dm * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * dm
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.stack([
        jnp.stack([A00 * inv_det, A01 * inv_det, A02 * inv_det], -1),
        jnp.stack([A10 * inv_det, A11 * inv_det, A12 * inv_det], -1),
        jnp.stack([A20 * inv_det, A21 * inv_det, A22 * inv_det], -1),
    ], -2)


def _element_frame_inverse(elem):
    """Per-element frame inverse, hoisted OUT of the stencil-offset
    loops: the rasterizes evaluate element coordinates at 27 offsets
    per boundary particle, and a linalg.solve per offset re-factorized
    the SAME per-element matrix 27 times per substep. Returns (v0,
    Minv) with coords(xg) = Minv @ (xg - v0)."""
    d = elem.shape[-1]
    v0 = elem[..., 0, :]
    e1 = elem[..., 1, :] - v0
    if d == 2:
        n = jnp.stack([e1[..., 1], -e1[..., 0]], -1)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
        M = jnp.stack([e1, n], -1)  # columns
    else:
        e2 = elem[..., 2, :] - v0
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
        M = jnp.stack([e1, e2, n], -1)
    return v0, _explicit_inv(M)


def _frame_coords(v0, Minv, xg):
    """coords of xg (..., d) given the hoisted (v0, Minv)."""
    return jnp.einsum("...ij,...j->...i", Minv, xg - v0)


def _element_frame_coords(xg, elem):
    """Coordinates of points xg (..., d) in each element's frame.

    3D (world_to_element, rigid_transfer.cpp:30-49): solve
    [e1 e2 n] @ c = xg - v0 -> c = (u, v, h); u,v barycentric, h = signed
    world distance along the unit normal. 2D: [e1 n] @ c.
    """
    v0, Minv = _element_frame_inverse(elem)
    return _frame_coords(v0, Minv, xg)


def rasterize_rigid_boundary(xb, elem_world, bp_rid, num_rigids: int,
                             cfg: SimConfig, return_key: bool = False):
    """Rigid boundary particles -> grid CDF.

    Args:
      xb: (B, d) world positions of boundary particles.
      elem_world: (B, d, d) world-space element vertices.
      bp_rid: (B,) int32 owning rigid id.
    Returns:
      grid_dist (N,) world-unit unsigned distance (0 where unset),
      grid_rid (N,) int32 nearest rigid id (-1 none),
      grid_states (N,) int32 packed color tags
      [+ the raw scatter-min key plane when return_key — feeds the
      packed single-gather lookup, _pack_cdf_plane].
    """
    d = cfg.dim
    nodes = cfg.grid_nodes
    N = 1
    for n in nodes:
        N *= n
    pos = xb * cfg.inv_dx
    base, _, _ = bspline_weights(2, pos)  # cdf_kernel_order_rasterize = 2
    v0_e, Minv_e = _element_frame_inverse(elem_world)

    key = jnp.full((N,), _KEY_INF, jnp.int32)
    tags = jnp.zeros((N, num_rigids), jnp.int32)

    for off in stencil_offsets(d, 2):
        idx = base + jnp.asarray(off, jnp.int32)
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
        xg = idx.astype(jnp.float32) * cfg.dx
        coord = _frame_coords(v0_e, Minv_e, xg)
        h = coord[..., d - 1]
        negative = h < 0.0
        dist_gu = jnp.abs(h) * cfg.inv_dx
        if d == 2:
            in_range = (coord[..., 0] >= -0.02) & (coord[..., 0] <= 1.02)
        else:
            in_range = (
                (coord[..., 0] >= 0)
                & (coord[..., 1] >= 0)
                & (coord[..., 0] + coord[..., 1] <= 1.0)
            )
        valid = inb & in_range
        lin = jnp.where(valid, _ravel(idx, nodes), 0)
        q = jnp.minimum(dist_gu * _DIST_SCALE, _DIST_SCALE * 4 - 1).astype(jnp.int32)
        k = (q << 8) | (bp_rid + 1)
        key = key.at[lin].min(jnp.where(valid, k, _KEY_INF))
        tag = jnp.where(valid, 2 + negative.astype(jnp.int32), 0)
        tags = tags.at[lin, bp_rid].max(tag)

    has = key != _KEY_INF
    grid_rid = jnp.where(has, (key & 0xFF) - 1, -1)
    # stored in world units like the reference (rigid_transfer.cpp:76-77)
    grid_dist = jnp.where(has, (key >> 8).astype(jnp.float32) / _DIST_SCALE * cfg.dx, 0.0)
    shifts = jnp.asarray([2 * r for r in range(num_rigids)], jnp.int32)
    grid_states = jnp.sum(tags << shifts[None, :], axis=1).astype(jnp.int32)
    if d == 2 and cfg.cdf_expand:
        grid_states = _expand_states_2d(
            grid_states, num_rigids, cfg, int(cfg.cdf_expand)
        )
    if return_key:
        return grid_dist, grid_rid, grid_states, key
    return grid_dist, grid_rid, grid_states


# ---------------------------------------------------------------------------
# Record-sparse CDF (VERDICT r1 #4): no (prod grid_nodes,)-sized array
# anywhere in the 3D CPIC hot path. The CDF lives as (Kr, 64) per-block
# node records over a RIGID page map — the blocks touched by boundary-
# particle stencils plus a one-block halo (the reference's SPGrid-sparse
# rigid rasterize + rigid_page_map, rigid_transfer.cpp:18-117,
# mpm.cpp:1021-1076).
# ---------------------------------------------------------------------------


import functools as _functools


@_functools.lru_cache(maxsize=1)
def _tag_dilate_matrices():
    """Static 0/1 matrices for RecordNodeCDF.tag_dilated_center.

    G (27*64, 216): column m = extended-neighborhood slot (i,j,k) with
    i,j,k in [-1,4] (m = (i+1)*36 + (j+1)*6 + (k+1)); row 64*E + l = 1
    iff neighbor-offset E (Chebyshev index over {-1,0,1}^3) and lane
    l = lx*16+ly*4+lz place that neighbor's node AT slot m, i.e.
    (i,j,k) == E*4 + (lx,ly,lz). Each slot receives exactly one
    (E, l) source.

    H (216, 64): H[m, l] = 1 iff slot m lies in the 3^3 neighborhood
    of lane l's node: |i - lx| <= 1 per axis."""
    import numpy as _np

    offs27 = [(dx_, dy_, dz_) for dx_ in (-1, 0, 1)
              for dy_ in (-1, 0, 1) for dz_ in (-1, 0, 1)]
    G = _np.zeros((27 * 64, 216), _np.float32)
    for ei, e in enumerate(offs27):
        for lx in range(4):
            for ly in range(4):
                for lz in range(4):
                    i = e[0] * 4 + lx
                    j = e[1] * 4 + ly
                    k = e[2] * 4 + lz
                    if all(-1 <= v <= 4 for v in (i, j, k)):
                        m = (i + 1) * 36 + (j + 1) * 6 + (k + 1)
                        G[ei * 64 + lx * 16 + ly * 4 + lz, m] = 1.0
    H = _np.zeros((216, 64), _np.float32)
    for i in range(-1, 5):
        for j in range(-1, 5):
            for k in range(-1, 5):
                m = (i + 1) * 36 + (j + 1) * 6 + (k + 1)
                for lx in range(4):
                    for ly in range(4):
                        for lz in range(4):
                            if (abs(i - lx) <= 1 and abs(j - ly) <= 1
                                    and abs(k - lz) <= 1):
                                H[m, lx * 16 + ly * 4 + lz] = 1.0
    # numpy, NOT jnp: the lru_cache must never hold traced arrays
    # (a cached tracer escaping its trace is an UnexpectedTracerError)
    return G, H


def _dilate_blocks(occ3):
    """One 27-neighborhood (+-1 block per axis) boolean dilation."""
    occ = occ3
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
    return occ


def rigid_page_map(xb, cfg: SimConfig, Kr: int, dilate: int = 1):
    """Compacted block set near rigid boundary particles: bp blocks
    `dilate`-times 27-dilated (covers their 3-node rasterize stencils
    and the CDF gather reach of nearby particles). Returns (rids (Kr,)
    ascending padded block ids, rslot_map (total+1,), n_r true
    occupancy — driver re-jits with larger Kr when n_r > Kr)."""
    rids, rslot_map, n_r, _ = rigid_page_map_checked(xb, cfg, Kr, dilate)
    return rids, rslot_map, n_r


def rigid_page_map_checked(xb, cfg: SimConfig, Kr: int, dilate: int = 2,
                           chk_dilate: int = None):
    """rigid_page_map + a staleness-check plane for LAZY reuse.

    The map build runs an argsort over total_blocks_padded — several ms
    per substep at res 256 — but bodies move slowly, so frames can
    reuse the map until boundary particles approach its edge. The
    returned chk (total+1,) bool = bp blocks dilated `chk_dilate`
    (default dilate-1) times; reuse while all(chk[bid(xb_now)]),
    rebuild otherwise (exact, no drift-bound assumptions — survives
    collision position projections). Margin algebra (blocks, Chebyshev):
      * rasterize-write coverage needs chk_dilate + 1 <= dilate
        (writes reach +-2 cells = +-1 block from a bp's block);
      * the compact stage-2 tag_dilated fast test additionally needs
        every candidate stencil BASE block on-record: tags live in
        bp+1, candidates in tags+1, bases one block lower — so
        chk_dilate + 3 <= dilate (use dilate=4, chk_dilate=1)."""
    from taichi_mpm_tpu.ops import blocked

    if chk_dilate is None:
        chk_dilate = dilate - 1
    assert chk_dilate + 1 <= dilate
    nbp = blocked.num_blocks_padded(cfg)
    total = blocked.total_blocks_padded(cfg)
    bid = blocked.block_id_of(xb, cfg)
    occ = jnp.zeros((total,), bool).at[bid].set(True)
    occ = occ.reshape(nbp)
    chk = occ
    for i in range(dilate):
        if i == chk_dilate:
            chk = occ
        occ = _dilate_blocks(occ)
    occ = occ.reshape(-1)
    chk_flat = jnp.concatenate(
        [chk.reshape(-1), jnp.zeros((1,), bool)]
    )
    order = jnp.argsort(~occ, stable=True).astype(jnp.int32)
    if Kr > total:
        order = jnp.pad(order, (0, Kr - total), constant_values=total)
    n_r = jnp.sum(occ.astype(jnp.int32))
    slot_idx = jnp.arange(Kr, dtype=jnp.int32)
    rids = jnp.where(slot_idx < n_r, order[:Kr], total)
    rslot_map = jnp.full((total + 1,), Kr, jnp.int32)
    rslot_map = rslot_map.at[jnp.minimum(rids, total)].set(
        jnp.where(slot_idx < n_r, slot_idx, Kr)
    )
    rslot_map = rslot_map.at[total].set(Kr)
    return rids, rslot_map, n_r, chk_flat


def _node_to_record(idx, rslot_map, Kr: int, cfg: SimConfig):
    """Node index (..., 3) -> (record row in [0, Kr*64], ok): row Kr*64
    is the zero sentinel."""
    from taichi_mpm_tpu.ops import blocked

    nbp = blocked.num_blocks_padded(cfg)
    total = nbp[0] * nbp[1] * nbp[2]
    b = idx // 4
    l = idx - b * 4
    bid = (b[..., 0] * nbp[1] + b[..., 1]) * nbp[2] + b[..., 2]
    rs = rslot_map[jnp.clip(bid, 0, total)]
    ok = rs < Kr
    lane = l[..., 0] * 16 + l[..., 1] * 4 + l[..., 2]
    row = jnp.where(ok, rs * 64 + lane, Kr * 64)
    return row, ok


def rasterize_rigid_boundary_records(
    xb, elem_world, bp_rid, num_rigids: int, cfg: SimConfig, rslot_map,
    Kr: int, return_key: bool = False,
):
    """Rigid boundary particles -> CDF node RECORDS (Kr*64 + 1,) (last
    row = sentinel zeros). Same math as the dense rasterize; the
    scatter domain is the rigid page map instead of the whole grid."""
    d = cfg.dim
    nodes = cfg.grid_nodes
    N = Kr * 64 + 1
    pos = xb * cfg.inv_dx
    base, _, _ = bspline_weights(2, pos)
    v0_e, Minv_e = _element_frame_inverse(elem_world)

    key = jnp.full((N,), _KEY_INF, jnp.int32)
    tags = jnp.zeros((N, num_rigids), jnp.int32)

    for off in stencil_offsets(d, 2):
        idx = base + jnp.asarray(off, jnp.int32)
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
        xg = idx.astype(jnp.float32) * cfg.dx
        coord = _frame_coords(v0_e, Minv_e, xg)
        h = coord[..., d - 1]
        negative = h < 0.0
        dist_gu = jnp.abs(h) * cfg.inv_dx
        in_range = (
            (coord[..., 0] >= 0)
            & (coord[..., 1] >= 0)
            & (coord[..., 0] + coord[..., 1] <= 1.0)
        )
        row, ok = _node_to_record(idx, rslot_map, Kr, cfg)
        valid = inb & in_range & ok
        lin = jnp.where(valid, row, N - 1)
        q = jnp.minimum(dist_gu * _DIST_SCALE, _DIST_SCALE * 4 - 1).astype(jnp.int32)
        k = (q << 8) | (bp_rid + 1)
        key = key.at[lin].min(jnp.where(valid, k, _KEY_INF))
        tag = jnp.where(valid, 2 + negative.astype(jnp.int32), 0)
        tags = tags.at[lin, bp_rid].max(tag)

    key = key.at[N - 1].set(_KEY_INF)
    tags = tags.at[N - 1].set(0)
    has = key != _KEY_INF
    rid_rec = jnp.where(has, (key & 0xFF) - 1, -1)
    dist_rec = jnp.where(
        has, (key >> 8).astype(jnp.float32) / _DIST_SCALE * cfg.dx, 0.0
    )
    shifts = jnp.asarray([2 * r for r in range(num_rigids)], jnp.int32)
    states_rec = jnp.sum(tags << shifts[None, :], axis=1).astype(jnp.int32)
    states_rec = states_rec.at[N - 1].set(0)
    if return_key:
        return dist_rec, rid_rec, states_rec, key
    return dist_rec, rid_rec, states_rec


def _pack_cdf_plane(key, states, num_rigids: int):
    """One int32 plane holding (states, rid, dist) per node — so the
    hot 27-offset CDF loops pay ONE gather per offset instead of three
    (XLA gathers cost ~14 ns/row regardless of width; the CPIC budget
    loops are gather-bound, VERDICT r3 #3). Layout (R <= 3 only):
    bits 0..2R-1 states, bits 6-7 rid+1, bits 8-29 the rasterize's
    22-bit quantized distance, taken VERBATIM from the scatter-min key
    (q << 8 | rid+1) so the decode is BITWISE identical to the stored
    planes. Returns None when R > 3 (states would overlap the rid
    bits) — lookups fall back to the per-plane gathers."""
    if num_rigids is None or num_rigids > 3 or key is None:
        return None
    has = key != _KEY_INF
    pk = jnp.where(has, (key & ~0xFF) | ((key & 0xFF) << 6), 0)
    return pk | states


def _unpack_cdf(pk, num_rigids: int, cfg: SimConfig):
    # full 2-bit-per-rigid field (touched AND sign bits — state_mask
    # covers only the touched bits)
    s = pk & ((1 << (2 * num_rigids)) - 1)
    rid = ((pk >> 6) & 3) - 1
    # the exact expression the unpacked planes were decoded with
    # (rasterize: (key >> 8) / _DIST_SCALE * dx) — bitwise identical
    dist = (pk >> 8).astype(jnp.float32) / _DIST_SCALE * cfg.dx
    return s, rid, dist


class DenseNodeCDF:
    """Uniform view over the dense (N_nodes,) CDF arrays.

    num_rigids (when given and <= 3) enables the packed single-plane
    lookup; None keeps the three-plane gathers (oracle paths)."""

    def __init__(self, grid_dist, grid_rid, grid_states, cfg: SimConfig,
                 num_rigids: int = None, key=None):
        self.dist, self.rid, self.states, self.cfg = (
            grid_dist, grid_rid, grid_states, cfg
        )
        self.R = num_rigids
        self.pk = _pack_cdf_plane(key, grid_states, num_rigids)

    def lookup(self, idx, inb):
        """-> (states, rid, dist_world) at node indices idx (..., 3)."""
        nodes = self.cfg.grid_nodes
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        if self.pk is not None:
            # pk = 0 decodes to (states 0, rid -1, dist 0) — exactly the
            # masked values, so one where on the packed word suffices
            return _unpack_cdf(
                jnp.where(inb, self.pk[lin], 0), self.R, self.cfg
            )
        s = jnp.where(inb, self.states[lin], 0)
        rid = jnp.where(inb, self.rid[lin], -1)
        dist = jnp.where(inb, self.dist[lin], 0.0)
        return s, rid, dist

    def tagged_blocks(self):
        """(total_blocks_padded,) bool: blocks containing tagged nodes."""
        from taichi_mpm_tpu.ops import blocked

        cfg = self.cfg
        nodes = cfg.grid_nodes
        nbp = blocked.num_blocks_padded(cfg)
        tag = (self.states != 0).reshape(nodes)
        tag = jnp.pad(tag, tuple(
            (0, 4 * nbp[k] - nodes[k]) for k in range(3)
        ))
        return jnp.any(
            tag.reshape(nbp[0], 4, nbp[1], 4, nbp[2], 4), axis=(1, 3, 5)
        ).reshape(-1)

    def tag_dilated_center(self):
        """(N_nodes,) bool: D[c] = OR_{e in {-1,0,1}^dim} (states[c+e]
        != 0) — the quadratic-stencil near-rigid test collapsed to ONE
        lookup at the stencil CENTER node c = base+1 (always in-grid,
        unlike the base). Replaces 27 lookups per candidate in compact
        stage 2 (VERDICT r3 #3). Pure shifts, no gathers."""
        nodes = self.cfg.grid_nodes
        d = len(nodes)
        tag = (self.states != 0).reshape(nodes)
        D = jnp.pad(tag, tuple((1, 1) for _ in nodes))
        for k in range(d):
            sl = lambda e: tuple(
                slice(None) if j != k else slice(1 + e, 1 + e + D.shape[k] - 2)
                for j in range(d)
            )
            D = D[sl(-1)] | D[sl(0)] | D[sl(1)]
        return D.reshape(-1)

    def stencil_tagged(self, center):
        """exact-test fast path: OR of (states != 0) over the quadratic
        stencil whose CENTER node is `center` (..., d) — one gather
        into the dilated plane."""
        nodes = self.cfg.grid_nodes
        D = self.tag_dilated_center()
        lin = _ravel(jnp.clip(center, 0, jnp.asarray(nodes) - 1), nodes)
        return D[lin]


class RecordNodeCDF:
    """Uniform view over the record-sparse (Kr*64 + 1,) CDF arrays.

    num_rigids (when given and <= 3) enables the packed single-plane
    lookup; None keeps the three-plane gathers (oracle paths)."""

    def __init__(self, dist_rec, rid_rec, states_rec, rids, rslot_map,
                 Kr: int, cfg: SimConfig, num_rigids: int = None,
                 key=None):
        self.dist, self.rid, self.states = dist_rec, rid_rec, states_rec
        self.rids, self.rslot_map, self.Kr, self.cfg = (
            rids, rslot_map, Kr, cfg
        )
        self.R = num_rigids
        self.pk = _pack_cdf_plane(key, states_rec, num_rigids)

    def lookup(self, idx, inb):
        row, ok = _node_to_record(idx, self.rslot_map, self.Kr, self.cfg)
        row = jnp.where(inb & ok, row, self.Kr * 64)
        if self.pk is not None:
            # the sentinel row holds pk = 0 -> (0, -1, 0.0)
            return _unpack_cdf(self.pk[row], self.R, self.cfg)
        rid = jnp.where(inb & ok, self.rid[row], -1)
        return self.states[row], rid, self.dist[row]

    def tagged_blocks(self):
        from taichi_mpm_tpu.ops import blocked

        total = blocked.total_blocks_padded(self.cfg)
        has = jnp.any(
            self.states[: self.Kr * 64].reshape(self.Kr, 64) != 0, axis=1
        )
        return (
            jnp.zeros((total + 1,), bool)
            .at[jnp.minimum(self.rids, total)].max(has)[:total]
        )

    def tag_dilated_center(self):
        """(Kr*64 + 1,) bool D with D[row(c)] = OR_{e in {-1,0,1}^3}
        (states[c+e] != 0) — the quadratic-stencil near-rigid test
        collapsed to ONE record lookup at the stencil CENTER node
        c = base+1 (always in-grid under the position clamp; compact
        stage 2 previously paid 27 record lookups per candidate,
        VERDICT r3 #3).

        TPU form (round-4 rewrite): everything stays 2-D (Kr, lanes) —
        a first (Kr,6,6,6) formulation used 4-D tiny-minor-dim arrays
        and windowed updates, which padded ~21x and serialized; traced
        at ~10 ms/substep. Here the 26 neighbor planes are row-gathered
        through rslot_map into (Kr, 27*64) (no chaining through
        intermediate records — exact for any map holding all tagged
        blocks), the 6^3 extended-neighborhood assembly is ONE static
        0/1 selection matmul (64*27 -> 216 slots; the halo-merge
        idiom), and the 27-shift OR is a second selection matmul
        followed by a > 0 threshold (counts are exact small ints).

        EXACTNESS CONDITION for replacing the per-candidate loop: every
        candidate's center-node block must be on-record (else its D row
        reads the sentinel). The lazy dilate=4/chk_dilate=1 rigid page
        map guarantees it (see rigid_page_map_checked)."""
        from taichi_mpm_tpu.ops import blocked

        cfg = self.cfg
        Kr = self.Kr
        nbp = blocked.num_blocks_padded(cfg)
        total = nbp[0] * nbp[1] * nbp[2]
        bid = jnp.minimum(self.rids, total)
        live = bid < total
        bz = bid % nbp[2]
        by = (bid // nbp[2]) % nbp[1]
        bx = bid // (nbp[2] * nbp[1])
        bco = (bx, by, bz)

        T = (self.states[: Kr * 64] != 0).reshape(Kr, 64).astype(
            jnp.float32
        )
        Ts = jnp.concatenate([T, jnp.zeros((1, 64), jnp.float32)])
        offs27 = [(dx_, dy_, dz_) for dx_ in (-1, 0, 1)
                  for dy_ in (-1, 0, 1) for dz_ in (-1, 0, 1)]
        planes = []
        for dxyz in offs27:
            if dxyz == (0, 0, 0):
                planes.append(T)
                continue
            okn = live
            for k in range(3):
                okn = okn & (bco[k] + dxyz[k] >= 0)
                okn = okn & (bco[k] + dxyz[k] < nbp[k])
            nbid = (
                bid
                + dxyz[0] * nbp[1] * nbp[2]
                + dxyz[1] * nbp[2]
                + dxyz[2]
            )
            ns = self.rslot_map[
                jnp.clip(jnp.where(okn, nbid, total), 0, total)
            ]
            ns = jnp.where(okn & (ns < Kr), ns, Kr)
            planes.append(Ts[ns])
        Tcat = jnp.concatenate(planes, axis=1)  # (Kr, 27*64)
        G, H = _tag_dilate_matrices()
        E = jax.lax.dot_general(
            Tcat, G, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Kr, 216) 0/1 extended 6^3 neighborhood
        Dcnt = jax.lax.dot_general(
            E, H, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Kr, 64) neighbor-tag counts
        return jnp.concatenate(
            [(Dcnt > 0.5).reshape(Kr * 64), jnp.zeros((1,), bool)]
        )

    def stencil_tagged(self, center):
        """exact-test fast path: OR of (states != 0) over the quadratic
        stencil centered at `center` — one record gather into the
        dilated plane (see tag_dilated_center's exactness condition)."""
        D = self.tag_dilated_center()
        row, ok = _node_to_record(center, self.rslot_map, self.Kr,
                                  self.cfg)
        return D[jnp.where(ok, row, self.Kr * 64)]


def _expand_states_2d(grid_states, num_rigids: int, cfg: SimConfig, passes: int):
    """2D CDF tag dilation (rigid_transfer.cpp:79-111, the cdf_expand
    knob): per pass and axis, interior nodes adopt the tag+sign bits of
    neighbors for rigids they are not yet touched by. Neighbor states
    are read from the pre-pass grid; the two axis updates compose
    sequentially like the reference's in-place tmp array."""
    nodes = cfg.grid_nodes
    touched = jnp.int32(state_mask(num_rigids))
    s = grid_states.reshape(nodes)

    def upd(state, nei):
        add = (nei & ~state) & touched
        return state | (nei & (add | (add >> 1)))

    for _ in range(passes):
        for k in range(2):
            nei_p = jnp.roll(s, -1, axis=k)
            nei_m = jnp.roll(s, 1, axis=k)
            # zero the wrapped border rows (reference region excludes them)
            idx = [slice(None), slice(None)]
            idx[k] = slice(-1, None)
            nei_p = nei_p.at[tuple(idx)].set(0)
            idx[k] = slice(0, 1)
            nei_m = nei_m.at[tuple(idx)].set(0)
            s2 = upd(s, nei_p)
            s2 = upd(s2, nei_m)
            # only interior nodes update (region from axis(k) to
            # res - axis(k), rigid_transfer.cpp:83)
            interior = jnp.ones(nodes, bool)
            idx[k] = slice(0, 1)
            interior = interior.at[tuple(idx)].set(False)
            idx[k] = slice(nodes[k] - 2, None)
            interior = interior.at[tuple(idx)].set(False)
            s = jnp.where(interior, s2, s)
    return s.reshape(-1)


def dense_node_lookup(grid_dist, grid_states, cfg: SimConfig):
    """Node CDF lookup over dense (N_nodes,) arrays (oracle/2D path)."""
    nodes = cfg.grid_nodes

    def lookup(idx, inb):
        lin = jnp.where(inb, _ravel(idx, nodes), 0)
        s = jnp.where(inb, grid_states[lin], 0)
        dist = jnp.where(inb, grid_dist[lin], 0.0)
        return s, dist

    return lookup


def gather_cdf(p_x, p_states, grid_dist, grid_rid, grid_states, num_rigids: int, cfg: SimConfig):
    """Grid CDF -> particle affinity + boundary distance/normal, dense
    grid arrays (see gather_cdf_lookup for the record-sparse path)."""
    return gather_cdf_lookup(
        p_x, p_states, dense_node_lookup(grid_dist, grid_states, cfg),
        num_rigids, cfg,
    )


def stencil_node_data(p_x, ncdf, cfg: SimConfig):
    """Per-offset node lookups + weights for the quadratic stencil of
    each particle, computed ONCE and shared by gather_cdf_lookup AND
    the p2g/g2p correction passes (all three index the IDENTICAL
    (P, 27) node set at the same pre-advection positions — the rslot
    and pk record gathers cost ~14 ns/row each, and running them three
    times was ~a third of the res-256 CPIC substep, r5 trace).

    Returns {off: (nidx, inb, s, nrid, dist_world, wo, gradw, dpos)}.
    Only valid when cfg.kernel_order == 2 (the CDF gather order)."""
    d = cfg.dim
    nodes = cfg.grid_nodes
    pos = p_x * cfg.inv_dx
    base, w, dw = bspline_weights(2, pos)
    # per-offset lookups, deliberately: a (27, B, 3)-batched lookup was
    # tried in r5 and measured net-negative (gathers are row-cost-
    # bound; the stacked index arithmetic outweighs the saved launches)
    data = {}
    for off in stencil_offsets(d, 2):
        nidx = base + jnp.asarray(off, jnp.int32)
        inb = jnp.all((nidx >= 0) & (nidx < jnp.asarray(nodes)), -1)
        s, nrid, dist = ncdf.lookup(nidx, inb)
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
        dpos = pos - nidx.astype(pos.dtype)
        data[off] = (nidx, inb, s, nrid, dist, wo, gradw, dpos)
    return data


def gather_cdf_lookup(p_x, p_states, node_lookup, num_rigids: int, cfg: SimConfig,
                      node_data=None):
    """Grid CDF -> particle affinity + boundary distance/normal.

    Args:
      p_x: (P, d) particle positions; p_states: (P,) int32 affinity;
      node_lookup(idx, inb) -> (states, dist_world) at node indices.
      node_data: optional precomputed stencil_node_data dict (shared
        with the correction passes); None keeps the internal lookups.
    Returns (states, bdist, bnormal, near_b): updated affinity, signed
    boundary distance (world units), unit normal, near-boundary flag.
    """
    d = cfg.dim
    nodes = cfg.grid_nodes
    P = p_x.shape[0]
    R = num_rigids
    smask = state_mask(R)

    pos = p_x * cfg.inv_dx
    if node_data is None:
        base, w, _ = bspline_weights(2, pos)  # cdf_kernel_order_gather = 2

    offs = stencil_offsets(d, 2)

    _cache = {}

    def node_data_of(off):
        # both passes read the same 27 offsets: gather once, reuse
        # (each record lookup costs ~14 ns/row; P is budget-sized)
        if node_data is not None:
            _, _, s, _, dist_w, wo, _, dpos = node_data[off]
            return s, dist_w * cfg.inv_dx, wo, dpos
        if off in _cache:
            return _cache[off]
        idx = base + jnp.asarray(off, jnp.int32)
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(nodes)), -1)
        s, dist = node_lookup(idx, inb)
        dist = dist * cfg.inv_dx  # grid units
        wo = w[:, 0, off[0]]
        for k in range(1, d):
            wo = wo * w[:, k, off[k]]
        dpos = pos - idx.astype(pos.dtype)
        _cache[off] = (s, dist, wo, dpos)
        return _cache[off]


    # Pass 1: affinity update (rigid_transfer.cpp:156-207).
    all_b = jnp.zeros((P,), jnp.int32)
    rr = jnp.arange(R, dtype=jnp.int32)[None, :]
    wd_pos = jnp.zeros((P, R), jnp.float32)
    wd_neg = jnp.zeros((P, R), jnp.float32)
    for off in offs:
        s, dist, wo, _ = node_data_of(off)
        all_b = all_b | (s & smask)
        touch = ((s[:, None] >> (2 * rr + 1)) & 1).astype(jnp.float32)
        neg = ((s[:, None] >> (2 * rr)) & 1).astype(jnp.float32)
        wd = (wo * dist)[:, None] * touch
        wd_pos = wd_pos + wd * (1.0 - neg)
        wd_neg = wd_neg + wd * neg

    # Drop affinity with rigids no longer near (:163-166).
    states = p_states & (all_b | (all_b >> 1))
    avail = ((all_b[:, None] >> (2 * rr + 1)) & 1) == 1
    have = ((states[:, None] >> (2 * rr + 1)) & 1) == 1
    add = avail & (~have) & ((wd_pos + wd_neg) > 1e-7)
    neg_bit = (wd_pos < wd_neg).astype(jnp.int32)
    new_tags = jnp.where(add, 2 + neg_bit, 0)
    states = states | jnp.sum(new_tags << (2 * rr), axis=1).astype(jnp.int32)

    # Pass 2: weighted MLS reconstruction (:209-260) with the final
    # states. The (d+1)x(d+1) normal equations are accumulated and
    # solved COMPONENTWISE on (P,) arrays (unrolled Cramer's rule):
    # materializing (P, 4, 4) arrays pads ~32x on TPU and exhausted HBM
    # at large particle counts.
    m = d + 1
    XtX = [[jnp.zeros((P,), jnp.float32) for _ in range(m)] for _ in range(m)]
    XtY = [jnp.zeros((P,), jnp.float32) for _ in range(m)]
    for off in offs:
        s, dist, wo, dpos = node_data_of(off)
        valid = s != 0
        mask = (s & states & smask) >> 1
        same = (s & mask) == (states & mask)
        diff = (s ^ states) & mask
        single_neg = (diff != 0) & ((diff & (diff - 1)) == 0)
        use = valid & (same | single_neg)
        sign = jnp.where(same, 1.0, -1.0)
        wgt = jnp.where(use, wo, 0.0)
        xp = [-dpos[:, k] for k in range(d)] + [jnp.ones((P,), dpos.dtype)]
        for i in range(m):
            for j in range(i, m):
                XtX[i][j] = XtX[i][j] + wgt * xp[i] * xp[j]
        ws = wgt * sign * dist
        for i in range(m):
            XtY[i] = XtY[i] + ws * xp[i]
    for i in range(m):
        for j in range(i):
            XtX[i][j] = XtX[j][i]

    def det_ll(M):
        n = len(M)
        if n == 1:
            return M[0][0]
        acc = None
        for j in range(n):
            minor = [[M[r][c] for c in range(n) if c != j] for r in range(1, n)]
            term = M[0][j] * det_ll(minor)
            if j % 2:
                term = -term
            acc = term if acc is None else acc + term
        return acc

    det = det_ll(XtX)
    ok = (jnp.abs(det) > _GUARD[d]) & (states != 0)
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    r = []
    for j in range(m):  # Cramer: replace column j with XtY
        Mj = [[XtY[rr] if cc == j else XtX[rr][cc] for cc in range(m)] for rr in range(m)]
        r.append(det_ll(Mj) * inv_det)

    near_b = ok
    bdist = jnp.where(ok, r[d] * cfg.dx, 0.0)
    glen2 = sum(r[k] * r[k] for k in range(d))
    gok = ok & (glen2 > 1e-4)
    gscale = 1.0 / jnp.maximum(jnp.sqrt(glen2), 1e-30)
    bnormal = jnp.stack(
        [jnp.where(gok, r[k] * gscale, 0.0) for k in range(d)], -1
    )
    return states, bdist, bnormal, near_b
