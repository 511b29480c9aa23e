"""Energy-conservation benchmark: two elastic balls colliding in zero
gravity, per-frame mechanical energy printed (reference
scripts/benchmark/colliding_balls_energy.py, optimized=False)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=100, res=100)
r = args.res

sim = MPM(res=(r, r, r), base_delta_t=3e-4, frame_dt=0.01,
          gravity=(0, 0, 0), optimized=False)
for cx, vx in ((0.35, 0.5), (0.65, -0.5)):
    tex = texture.sphere((cx, 0.5, 0.5), 0.1) * 8
    sim.add_particles("jelly", density=400, density_tex=tex,
                      vel=(vx, 0, 0), E=5e3, nu=0.3)

if __name__ == "__main__":
    simulate(sim, args, print_energy=True)
