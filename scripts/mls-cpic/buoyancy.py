"""A light rigid box bobbing up in water (reference
scripts/mls-cpic/buoyancy.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.rigid.mesh import box_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=150, res=64)
r = args.res

sim = MPM(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.0))

# water pool
pool = texture.box((0.15, 0.1, 0.15), (0.85, 0.45, 0.85)) * 4
sim.add_particles("water", density=1000, density_tex=pool)

# submerged light box (density << water): must rise
sim.add_particles(
    "rigid", mesh=box_mesh((0.05, 0.05, 0.05)), codimensional=False,
    density=150.0, friction=0.1, initial_position=(0.5, 0.2, 0.5),
)

if __name__ == "__main__":
    simulate(sim, args)
