"""Two elastic balls colliding under gravity in a box — quick 3D
integration check (reference scripts/benchmark/colliding_balls_3d_test.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=60, res=64)
r = args.res

sim = MPM(res=(r, r, r), base_delta_t=1e-4, frame_dt=0.01)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.08, friction=0.2))
for cx, vx in ((0.3, 1.0), (0.7, -1.0)):
    tex = texture.sphere((cx, 0.4, 0.5), 0.08) * 8
    sim.add_particles("jelly", density=400, density_tex=tex,
                      vel=(vx, 0, 0), E=2e4, nu=0.35)

if __name__ == "__main__":
    simulate(sim, args)
