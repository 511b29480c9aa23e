"""tetris — 2D multi-material demo: elastic, plastic (snow) and liquid
tetromino blocks dropping into a box (the reference's tetris.cpp, which
switches material per particle, tetris.cpp:49-53,98-113) — here through
the framework API with per-batch materials."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.core.solver import MPM

TETROMINOES = {
    "T": [(0, 0), (1, 0), (2, 0), (1, 1)],
    "L": [(0, 0), (0, 1), (0, 2), (1, 0)],
    "O": [(0, 0), (1, 0), (0, 1), (1, 1)],
    "I": [(0, 0), (0, 1), (0, 2), (0, 3)],
}


def tetromino_particles(shape, origin, cell=0.04, ppc_axis=4):
    pts = []
    h = cell / ppc_axis
    for cx, cy in TETROMINOES[shape]:
        ax = (np.arange(ppc_axis) + 0.5) * h
        g = np.stack(np.meshgrid(ax, ax, indexing="ij"), -1).reshape(-1, 2)
        pts.append(g + np.asarray(origin) + np.asarray([cx, cy]) * cell)
    return np.concatenate(pts).astype(np.float32)


if __name__ == "__main__":
    sim = MPM(res=(128, 128), base_delta_t=1e-4, frame_dt=4e-3,
              gravity=(0, -20.0))
    sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.05, friction=0.3))
    sim.add_collider(Collider(sdf=lambda x, t: x[..., 0] - 0.05, friction=0.3))
    sim.add_collider(Collider(sdf=lambda x, t: 0.95 - x[..., 0], friction=0.3))

    mats = [("jelly", dict(E=2e4, nu=0.3)),
            ("snow", dict(E=1.4e5, nu=0.2)),
            ("water", dict(k=1e4))]
    rng = np.random.default_rng(1)
    shapes = list(TETROMINOES)
    for k in range(6):
        mat, kw = mats[k % len(mats)]
        pos = tetromino_particles(
            shapes[k % len(shapes)],
            origin=(0.2 + 0.1 * k, 0.5 + 0.06 * k),
        )
        sim.add_particles(mat, pos=pos, density=800 if mat != "water" else 1000, **kw)

    for f in range(60):
        sim.step()
        x = sim.positions()
        print(f"frame {f:03d}  n={len(x)}  y in [{x[:,1].min():.3f}, {x[:,1].max():.3f}]")
