"""2D sand falling through a free-spinning segment-mesh wheel
(reference scripts/mls-cpic/sand_wheel_2D.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.rigid.mesh import wheel_mesh_2d
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=200, res=128)
r = args.res

sim = MPM(res=(r, r), base_delta_t=1e-4, frame_dt=0.01, penalty=1e3,
          gravity=(0, -10.0), capacity=100_000)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.05, friction=0.4))

sim.add_particles(
    "rigid", mesh=wheel_mesh_2d(radius=0.12, n_spokes=6, spoke_width=0.03),
    codimensional=True, friction=0.3, density=5.0,
    scripted_position=lambda t: (0.5, 0.45),
)

src = texture.box((0.46, 0.8), (0.54, 0.88)) * 6


def frame_update(s, f):
    if f < 150:
        s.add_particles("sand", density=2000, friction_angle=35.0,
                        density_tex=src, pd_source=True,
                        vel=(0.0, -0.6), delta_t=s.frame_dt)


if __name__ == "__main__":
    simulate(sim, args, frame_update=frame_update)
