"""Adaptive-dt snow sliding down a frictional slope (reference
scripts/async/slope.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from common import parse_args, simulate

from taichi_mpm_tpu.core.adaptive import AsyncMPM
from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=120, res=64)
r = args.res
n = np.array([0.4, 1.0, 0.0])
n = n / np.linalg.norm(n)

sim = AsyncMPM(res=(r, r, r), base_delta_t=1e-3, frame_dt=0.01,
               unit_delta_t=1e-6)
sim.add_collider(
    Collider(sdf=lambda x, t: x[..., 0] * n[0] + x[..., 1] * n[1] - 0.35,
             friction=0.25)
)
blob = texture.sphere((0.3, 0.65, 0.5), 0.08) * 6
sim.add_particles("snow", density=400, density_tex=blob, E=1.4e5, nu=0.2)

if __name__ == "__main__":
    simulate(sim, args)
    print("total particle updates:", sim.update_counter)
