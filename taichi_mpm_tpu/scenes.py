"""Canonical scenes: the reference's benchmark seeders and oracle setups.

``benchmark_cube`` replicates the reference's analytic benchmark seeding
(``benchmark=125`` / ``benchmark=8000``, /root/reference/src/mpm.cpp:149-186
and scripts/benchmark/benchmark_3d.py): a cube of cells each holding
8 particles on a 2x2x2 sub-lattice, dropped under gravity in a res^3 box.
"""

from __future__ import annotations

import numpy as np

from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.core import levelset


def cube_lattice(cells_per_side: int, dx: float, origin, ppc_axis: int = 2,
                 jitter: float = 0.0, seed: int = 0) -> np.ndarray:
    """ppc_axis^d particles per cell on a regular sub-lattice (8 ppc default)."""
    n = cells_per_side * ppc_axis
    h = dx / ppc_axis
    ax = (np.arange(n, dtype=np.float32) + 0.5) * h
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    if jitter > 0:
        rng = np.random.default_rng(seed)
        g = g + rng.uniform(-jitter * h, jitter * h, g.shape).astype(np.float32)
    return g + np.asarray(origin, np.float32)


def benchmark_cube(
    cells: int = 100,
    res: int = 125,
    material: str = "jelly",
    base_dt: float = 1e-4,
    gravity: float = -10.0,
    **mat_kw,
) -> MPM:
    """cells=25 -> 125k particles; cells=100 -> 8M (the reference's
    benchmark=125 / benchmark=8000)."""
    sim = MPM(
        res=(res, res, res),
        base_delta_t=base_dt,
        gravity=(0.0, gravity, 0.0),
    )
    dx = sim.cfg.dx
    margin = (res - cells) // 2 * dx
    pos = cube_lattice(cells, dx, origin=(margin, margin, margin))
    sim.add_particles(material, pos=pos, density=400.0, ppc=8.0, **mat_kw)
    pad = 3.5 * dx
    sim.add_collider(
        levelset.box_domain(
            lo=(pad, pad, pad),
            hi=(res * dx - pad, res * dx - pad, res * dx - pad),
            friction=-1.0,
        )
    )
    return sim


def elastic_block_drop(res: int = 64, cells: int = 24, **kw) -> MPM:
    """BASELINE config 2: 3D fixed-corotated elastic block drop."""
    return benchmark_cube(cells=cells, res=res, material="jelly", E=2e4, nu=0.35, **kw)


def sand_column_collapse(res: int = 64, base_dt: float = 1e-4) -> MPM:
    """BASELINE config 3: Drucker-Prager sand column collapse."""
    sim = MPM(res=(res, res, res), base_delta_t=base_dt, gravity=(0.0, -10.0, 0.0))
    dx = sim.cfg.dx
    # tall thin column resting on the floor
    w, h = res // 8, res // 2
    pos = []
    rng = np.random.default_rng(0)
    nx = w * 2
    hx = dx / 2
    ax = (np.arange(nx, dtype=np.float32) + 0.5) * hx
    ay = (np.arange(h * 2, dtype=np.float32) + 0.5) * hx
    g = np.stack(np.meshgrid(ax, ay, ax, indexing="ij"), -1).reshape(-1, 3)
    origin = np.array(
        [(res // 2 - w // 2) * dx, 4.0 * dx, (res // 2 - w // 2) * dx], np.float32
    )
    pos = g + origin
    sim.add_particles("sand", pos=pos, density=2000.0, friction_angle=35.0)
    pad = 3.5 * dx
    sim.add_collider(
        levelset.box_domain(
            lo=(pad, pad, pad),
            hi=(res * dx - pad, res * dx - pad, res * dx - pad),
            friction=0.4,
        )
    )
    return sim
