"""Sand paddles: scripted-rotation paddles stirring a sand source
(reference scripts/mls-cpic/sand_paddles.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import mpm_class, parse_args, simulate

import numpy as np

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.sampling import texture

from taichi_mpm_tpu.rigid.mesh import paddle_wheel_mesh

args = parse_args(frames=120, res=64)
r = args.res

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3,
          capacity=50_000)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.12, friction=0.4))

for k, cx in enumerate((0.35, 0.65)):
    sim.add_particles(
        "rigid", mesh=paddle_wheel_mesh(n_paddles=4, inner=0.02, outer=0.1, half_w=0.04),
        density=1.0, friction=0.4, codimensional=True,
        scripted_position=lambda t, cx=cx: (cx, 0.3, 0.5),
        scripted_rotation=lambda t, k=k: (0.0, 0.0, (1 - 2 * (k % 2)) * 180.0 * t),
    )

src = texture.sphere((0.5, 0.85, 0.5), 0.05) * 8


def frame_update(s, f):
    if f < 80:
        s.add_particles("sand", density=2000, friction_angle=35.0,
                        density_tex=src, pd_source=True,
                        vel=(0, -0.8, 0), delta_t=s.frame_dt)


if __name__ == "__main__":
    simulate(sim, args, frame_update=frame_update)
