"""Rigid boxes dropped into viscous goo (reference
scripts/mls-cpic/goo_blocks.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import mpm_class, parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import box_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=150, res=64)
r = args.res

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.3))

goo = texture.box((0.2, 0.1, 0.2), (0.8, 0.35, 0.8)) * 4
sim.add_particles("visco", density=800, density_tex=goo, E=5e3, nu=0.4)

for k, (cx, cz) in enumerate(((0.35, 0.4), (0.6, 0.55), (0.48, 0.65))):
    sim.add_particles(
        "rigid", mesh=box_mesh((0.04, 0.04, 0.04)), codimensional=False,
        density=600.0, friction=0.2,
        initial_position=(cx, 0.6 + 0.1 * k, cz),
    )

if __name__ == "__main__":
    simulate(sim, args)
