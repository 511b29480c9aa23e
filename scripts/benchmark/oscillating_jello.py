"""Energy-conservation benchmark: a stretched jello block oscillating in
zero gravity (reference scripts/benchmark/oscillating_jello.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from common import parse_args, simulate

from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.sampling import texture, poisson

args = parse_args(frames=100, res=50)
r = args.res

sim = MPM(res=(r, r, r), base_delta_t=5e-4, frame_dt=0.01,
          gravity=(0, 0, 0), optimized=False)
tex = texture.box((0.35, 0.4, 0.4), (0.65, 0.6, 0.6)) * 8
pos = poisson.sample_from_periodic_data(
    tex, np.zeros(3), np.ones(3), sim.cfg.dx, 3
)
# initial stretch: outward velocity proportional to x-offset
vel = np.zeros_like(pos)
vel[:, 0] = (pos[:, 0] - 0.5) * 4.0
sim.add_particles("jelly", pos=pos, vel=vel, density=400, E=5e3, nu=0.3)

if __name__ == "__main__":
    simulate(sim, args, print_energy=True)
