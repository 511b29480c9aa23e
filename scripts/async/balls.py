"""Adaptive-dt: a fast ball hits a slow ball — CFL-heterogeneous scene
where adaptive dt pays (reference scripts/async/balls.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.adaptive import AsyncMPM
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=80, res=64)
r = args.res

sim = AsyncMPM(res=(r, r, r), base_delta_t=1e-3, frame_dt=0.005,
               unit_delta_t=1e-6, gravity=(0, 0, 0))
t1 = texture.sphere((0.25, 0.5, 0.5), 0.07) * 8
sim.add_particles("elastic", density=400, density_tex=t1, vel=(3.0, 0, 0),
                  E=1e5, nu=0.3)
t2 = texture.sphere((0.65, 0.5, 0.5), 0.1) * 8
sim.add_particles("elastic", density=400, density_tex=t2, E=1e4, nu=0.3)

if __name__ == "__main__":
    simulate(sim, args)
    print("total particle updates:", sim.update_counter)
