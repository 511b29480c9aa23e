"""Splitting a jelly blob with a thin scripted cutter plate
(reference scripts/mls-cpic/bunny_split.py; bunny mesh -> sphere)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import mpm_class, parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import plate_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=150, res=96)
r = args.res

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.2))

tex = texture.sphere((0.5, 0.6, 0.5), 0.12) * 8
sim.add_particles("jelly", density=400, density_tex=tex, E=5e4, nu=0.35)

# static vertical blade under the falling blob
sim.add_particles(
    "rigid", mesh=plate_mesh(half_u=0.18, half_v=0.18, axis=0),
    codimensional=True, friction=0.0,
    scripted_position=lambda t: (0.5, 0.25, 0.5),
    scripted_rotation=lambda t: (0.0, 0.0, 0.0),
)

if __name__ == "__main__":
    simulate(sim, args)
