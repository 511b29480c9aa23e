"""Articulated wheeled walker driven by motor + stepper joints over sand
(reference scripts/mls-cpic/robot.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import mpm_class, parse_args, simulate

import numpy as np

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import box_mesh, cylinder_mesh
from taichi_mpm_tpu.sampling import texture

REVERSED = bool(int(os.environ.get("ROBOT_REVERSED", "0")))

args = parse_args(frames=200, res=64)
r = args.res

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.12, friction=0.4))

# sand bed
bed = texture.box((0.1, 0.12, 0.35), (0.9, 0.2, 0.65)) * 4
sim.add_particles("sand", density=2000, friction_angle=35.0, density_tex=bed)

body = sim.add_particles(
    "rigid", mesh=box_mesh((0.08, 0.02, 0.05)), codimensional=False,
    density=300.0, friction=0.3,
    initial_position=(0.35, 0.27, 0.5),
)
spin = 12.0 if not REVERSED else -12.0
wheels = []
for dxw in (-0.06, 0.06):
    w = sim.add_particles(
        "rigid", mesh=cylinder_mesh(radius=0.045, half_height=0.055, n=16, axis=2),
        codimensional=True, density=50.0, friction=0.8,
        initial_position=(0.35 + dxw, 0.24, 0.5),
    )
    wheels.append(w)
    # axial rotation joint wheel<->body + stepper driving the spin
    sim.add_articulation("stepper", w, body, axis=(0, 0, 1),
                         angular_velocity=spin, axis_length=0.05,
                         offset0=(0.0, 0.0, 0.0), penalty=1e3)

if __name__ == "__main__":
    simulate(sim, args)
