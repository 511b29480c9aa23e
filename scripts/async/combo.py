"""Adaptive-dt multi-material combo: snow + visco + sand dropping into a
box (reference scripts/async/combo.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.adaptive import AsyncMPM
from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=120, res=64)
r = args.res

sim = AsyncMPM(res=(r, r, r), base_delta_t=1e-3, frame_dt=0.01,
               unit_delta_t=1e-6)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.3))

sim.add_particles("snow", density=400, E=1.4e5, nu=0.2,
                  density_tex=texture.sphere((0.3, 0.6, 0.5), 0.07) * 6)
sim.add_particles("visco", density=800, E=5e3, nu=0.4,
                  density_tex=texture.sphere((0.5, 0.75, 0.5), 0.07) * 6)
sim.add_particles("sand", density=2000, friction_angle=35.0,
                  density_tex=texture.sphere((0.7, 0.6, 0.5), 0.07) * 6)

if __name__ == "__main__":
    simulate(sim, args)
    print("total particle updates:", sim.update_counter)
