"""Adaptive-dt water dam break (reference scripts/async/water.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.adaptive import AsyncMPM
from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=100, res=64)
r = args.res

sim = AsyncMPM(res=(r, r, r), base_delta_t=1e-3, frame_dt=0.01,
               unit_delta_t=1e-6)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.08, friction=0.0))
dam = texture.box((0.1, 0.08, 0.1), (0.35, 0.5, 0.9)) * 6
sim.add_particles("water", density=1000, density_tex=dam)

if __name__ == "__main__":
    simulate(sim, args)
    print("total particle updates:", sim.update_counter)
