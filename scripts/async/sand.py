"""Adaptive-dt sand column collapse (reference scripts/async/sand.py,
run through the AsyncMPM redesign — global CFL dt, POT buckets)."""
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
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.4))
col = texture.box((0.45, 0.1, 0.45), (0.55, 0.5, 0.55)) * 8
sim.add_particles("sand", density=2000, friction_angle=35.0, density_tex=col)

if __name__ == "__main__":
    simulate(sim, args)
    print("total particle updates:", sim.update_counter)
