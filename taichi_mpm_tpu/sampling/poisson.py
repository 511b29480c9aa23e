"""Poisson-disk particle seeding (Bridson + periodic tile + sources).

Host-side numpy re-implementation of the reference sampler
(/root/reference/src/poisson_disk_sampler.h):
  * ``bridson``: dart-throwing with a background grid (:326-390);
  * a *periodic* point set generated once per dimension and tiled over
    the target region (the reference loads `$mpm/periodic_pd_{dim}d.dat`
    precomputed the same way, :143-152; we generate and memoize);
  * ``sample_from_periodic_data``: filter tiled points by density
    texture (:157-192);
  * ``sample_from_source``: emitter — points whose advected position
    leaves the density mask this frame (:211-252);
  * ``sample_packed``: spheres-packed-in-region (:194-209).

min_distance from target ppc (get_ready, :59-66):
  2D: sqrt(dx^2/ppc * 2/3);  3D: (dx^3/ppc * 13/18)^(1/3).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

PERIODIC_BOUND = 40.0  # reference periodic_bound (poisson_disk_sampler.h:27)
_periodic_cache: dict = {}


def min_distance_for_ppc(dx: float, ppc: float, dim: int) -> float:
    """The reference uses fixed packing factors 2/3 (2D) / 13/18 (3D)
    calibrated to its own generator (poisson_disk_sampler.h:59-66); we
    calibrate to the measured density of OUR periodic tile so the
    achieved particles-per-cell matches the target exactly."""
    v = dx**dim / ppc
    pts, bound = periodic_tile(dim)
    factor = len(pts) / bound**dim  # points per unit volume at r = 1
    return (v * factor) ** (1.0 / dim)


def bridson(lo, hi, r: float, rng=None, periodic: bool = False, k: int = 30):
    """Bridson dart throwing in the box [lo, hi); min distance r."""
    rng = rng or np.random.default_rng(0)
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    d = len(lo)
    size = hi - lo
    cell = r / math.sqrt(d)
    res = np.maximum(np.ceil(size / cell).astype(int), 1)
    grid = -np.ones(res, np.int64)
    samples = []
    active = []

    def cell_of(p):
        return tuple(np.minimum(((p - lo) / cell).astype(int), res - 1))

    def fits(p):
        c = np.asarray(cell_of(p))
        rng_lo = c - 2
        rng_hi = c + 3
        for idx in np.ndindex(*(rng_hi - rng_lo)):
            ci = rng_lo + np.asarray(idx)
            off = np.zeros(d)
            if periodic:
                wrap = ci // res
                off = wrap * size
                ci = ci - wrap * res
            else:
                if np.any(ci < 0) or np.any(ci >= res):
                    continue
            j = grid[tuple(ci)]
            if j < 0:
                continue
            q = samples[j] + off
            if np.sum((p - q) ** 2) < r * r:
                return False
        return True

    p0 = lo + rng.random(d) * size
    samples.append(p0)
    grid[cell_of(p0)] = 0
    active.append(0)

    while active:
        i = active[-1]
        base = samples[i]
        placed = False
        for _ in range(k):
            rad = r * (1.0 + rng.random())
            vec = rng.normal(size=d)
            vec *= rad / np.linalg.norm(vec)
            p = base + vec
            if periodic:
                p = lo + np.mod(p - lo, size)
            elif np.any(p < lo) or np.any(p >= hi):
                continue
            if fits(p):
                grid[cell_of(p)] = len(samples)
                samples.append(p)
                active.append(len(samples) - 1)
                placed = True
                break
        if not placed:
            active.pop()
    return np.asarray(samples, np.float32)


def periodic_tile(dim: int) -> np.ndarray:
    """Unit-min-distance periodic point set in [0, bound)^dim, generated
    once, memoized in memory and on disk (reference write_periodic_data
    precomputes `$mpm/periodic_pd_{dim}d.dat` the same way,
    poisson_disk_sampler.h:254-324)."""
    if dim not in _periodic_cache:
        import os

        bound = PERIODIC_BOUND if dim == 2 else 16.0  # keep 3D gen cheap
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "taichi_mpm_tpu",
        )
        path = os.path.join(cache_dir, f"periodic_pd_{dim}d_v1.npy")
        if os.path.exists(path):
            pts = np.load(path)
        else:
            pts = bridson(
                np.zeros(dim), np.full(dim, bound), 1.0,
                rng=np.random.default_rng(12345), periodic=True,
            )
            try:
                os.makedirs(cache_dir, exist_ok=True)
                np.save(path, pts)
            except OSError:
                pass
        _periodic_cache[dim] = (pts, bound)
    return _periodic_cache[dim]


def _density_bbox(tex, lo, hi, dx, dim):
    """Bounding box + max ppc of the positive-density region sampled at
    cell centers (get_ready, poisson_disk_sampler.h:38-57)."""
    axes = [np.arange(lo[k] + dx * 0.5, hi[k], dx) for k in range(dim)]
    mesh = np.meshgrid(*axes, indexing="ij")
    pts = np.stack(mesh, -1).reshape(-1, dim)
    vals = tex(pts)
    ppc = float(vals.max()) if len(vals) else 0.0
    pos = pts[vals > 0]
    if len(pos) == 0:
        return None, None, 0.0
    return pos.min(0) - dx, pos.max(0) + dx, ppc


def sample_from_periodic_data(
    tex, lo, hi, dx: float, dim: int, specific_min_distance: Optional[float] = None
):
    """Tile the periodic set over the density bbox; keep tex > 0."""
    mn, mx, ppc = _density_bbox(tex, lo, hi, dx, dim)
    if mn is None:
        return np.zeros((0, dim), np.float32)
    r = specific_min_distance or min_distance_for_ppc(dx, ppc, dim)
    pts, bound = periodic_tile(dim)
    region_size = bound * r
    reps = np.ceil((mx - mn) / region_size).astype(int)
    out = []
    base = pts * r + mn  # tile spans [0, region_size) per axis
    for idx in np.ndindex(*reps):
        coords = base + region_size * np.asarray(idx)
        keep = tex(coords) > 0
        out.append(coords[keep])
    return np.concatenate(out).astype(np.float32) if out else np.zeros((0, dim), np.float32)


def sample_from_source(tex, lo, hi, dx: float, dim: int, sample_offset, sample_advection):
    """Emitter: tiled points inside the mask whose advected position
    leaves it this frame (poisson_disk_sampler.h:211-252). The tile
    pattern is shifted by sample_offset (= v * t) so successive frames
    emit fresh, non-overlapping layers."""
    mn, mx, ppc = _density_bbox(tex, lo, hi, dx, dim)
    if mn is None:
        return np.zeros((0, dim), np.float32)
    r = min_distance_for_ppc(dx, ppc, dim)
    pts, bound = periodic_tile(dim)
    region_size = bound * r
    off = np.asarray(sample_offset, np.float64)
    adv = np.asarray(sample_advection, np.float64)
    shifted = pts * r + off
    shifted -= np.floor(shifted / region_size + 0.5) * region_size
    reps = np.ceil((mx - mn) / region_size).astype(int)
    out = []
    for idx in np.ndindex(*reps):
        coords = mn + shifted + region_size * (np.asarray(idx) + 0.5)
        v0 = tex(coords)
        v1 = tex(coords + adv)
        keep = (v0 > 0) & (v1 == 0)
        out.append(coords[keep])
    return np.concatenate(out).astype(np.float32) if out else np.zeros((0, dim), np.float32)


def sample_packed(tex, local_tex, lo, hi, dx: float, dim: int, radius: float, gap: float):
    """Spheres-in-spheres packing (poisson_disk_sampler.h:194-209)."""
    centers = sample_from_periodic_data(tex, lo, hi, dx, dim, 2.0 * radius + gap)
    local = sample_from_periodic_data(local_tex, lo, hi, dx, dim)
    mn, mx, _ = _density_bbox(local_tex, lo, hi, dx, dim)
    if mn is None or len(centers) == 0:
        return np.zeros((0, dim), np.float32)
    mid = (mn + mx) * 0.5
    out = [local - mid + c for c in centers]
    return np.concatenate(out).astype(np.float32)
