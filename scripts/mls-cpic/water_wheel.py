"""Water wheel: rotation-articulated rigid wheel assembly spun by a
water source (reference scripts/mls-cpic/water_wheel.py — the ww_*.obj
meshes are re-created procedurally as hub + paddle wheel)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import mpm_class, parse_args, simulate

import numpy as np

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import cylinder_mesh, paddle_wheel_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=120, res=64)
r = args.res
center = (0.5, 0.5, 0.5)

# SHARDS=N runs this scene multichip through DistributedMPM.
# The source emits ~volume/dx^3 particles per frame, so capacity scales
# with resolution (the reference runs this at res 400, water_wheel.py:4)
sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01,
                  penalty=1e3, capacity=max(50_000, int(0.025 * r**3)))
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.2))

hub = sim.add_particles(
    "rigid", mesh=cylinder_mesh(radius=0.04, half_height=0.06, n=16, axis=2),
    density=1.0, friction=0.2, codimensional=True, angular_damping=3.0,
    scripted_position=lambda t: center, rotation_axis=(0, 0, 1),
)
wheel = sim.add_particles(
    "rigid", mesh=paddle_wheel_mesh(), density=1.0, friction=0.2,
    codimensional=True, angular_damping=3.0,
    scripted_position=lambda t: center, rotation_axis=(0, 0, 1),
)
sim.add_articulation("rotation", hub, wheel)

# the stream must actually strike the paddles: paddle reach is
# |x - 0.5| <= 0.15, so pour at x = 0.40 (left of the axle -> torque)
src = texture.ring((0.40, 0.85), inner=0.0, outer=0.04, axis=2).bound(
    2, 0.47, 0.53
) * 8


def frame_update(s, f):
    s.add_particles("water", density=1000, density_tex=src, pd_source=True,
                    vel=(0, -0.5, 0), delta_t=s.frame_dt)


if __name__ == "__main__":
    simulate(sim, args, frame_update=frame_update)
