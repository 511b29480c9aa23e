"""Adaptive-dt CPIC: 2D sand through a free-spinning wheel under the
global POT-snapped dt scheduler (VERDICT r4 #5 — the reference AsyncMPM
reuses the full coupled substep incl. rigid coupling,
/root/reference/src/async/async_mpm.cpp:330)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.adaptive import AsyncMPM
from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import wheel_mesh_2d
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=200, res=128)
r = args.res

sim = AsyncMPM(res=(r, r), base_delta_t=2e-4, frame_dt=0.01,
               unit_delta_t=1e-6, penalty=1e3, gravity=(0, -10.0),
               capacity=100_000)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.05, friction=0.4))

sim.add_particles(
    "rigid", mesh=wheel_mesh_2d(radius=0.12, n_spokes=6, spoke_width=0.03),
    codimensional=True, friction=0.3, density=5.0,
    scripted_position=lambda t: (0.5, 0.45),
)

col = texture.box((0.44, 0.62), (0.56, 0.82)) * 6
sim.add_particles("sand", density=2000, friction_angle=35.0,
                  density_tex=col)

if __name__ == "__main__":
    simulate(sim, args)
    print("total particle updates:", sim.update_counter)
