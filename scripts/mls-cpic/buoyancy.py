"""Buoyancy: water jets pour into a tank holding six rigid cubes of
graded density (200/400/600 kg/m^3); the lighter cubes ride the rising
water (reference scripts/mls-cpic/buoyancy.py — its $mpm/*.obj tank
walls become domain colliders and the cube/jet meshes are procedural).
Note the reference demonstrates buoyancy DYNAMICALLY (jets + floating
cubes), not as static hydrostatic lift of a submerged body — explicit
weakly-compressible CPIC transmits fluid force through velocity
differences and the stress term, which needs moving water."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import mpm_class, parse_args, simulate

from taichi_mpm_tpu.core import levelset
from taichi_mpm_tpu.rigid.mesh import box_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=150, res=64)
r = args.res
friction = 0.3

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3,
          pushing_force=0.0, capacity=120_000)
# tank: floor + 4 walls (the reference's five scripted rigid slabs)
sim.add_collider(levelset.box_domain(
    lo=(0.2, 0.18, 0.35), hi=(0.8, 0.95, 0.65), friction=friction,
))

# six cubes, density graded 200/400/600 in two rows
cube = box_mesh((0.018, 0.018, 0.018))
for j in range(2):
    for k in range(3):
        sim.add_particles(
            "rigid", mesh=cube, density=200.0 * (k + 1), friction=friction,
            codimensional=False,
            initial_position=(0.56, 0.255 + 0.04 * j, 0.44 + 0.04 * k),
        )

# starting pool so the cubes have something to float on
pool = texture.box((0.21, 0.19, 0.36), (0.79, 0.24, 0.64)) * 4
sim.add_particles("water", density=1000, density_tex=pool)

# two water jets for t < t0 (reference cylinder_jet sources, v = -2)
t0 = 1.0
jet1 = texture.ring((0.33, 0.8), inner=0.0, outer=0.035, axis=2).bound(
    2, 0.41, 0.47
) * 8
jet2 = texture.ring((0.33, 0.8), inner=0.0, outer=0.035, axis=2).bound(
    2, 0.53, 0.59
) * 8


def frame_update(s, f):
    if float(s.t) < t0:
        for jet in (jet1, jet2):
            s.add_particles("water", density=1000, density_tex=jet,
                            pd_source=True, vel=(0, -2.0, 0),
                            delta_t=s.frame_dt)


if __name__ == "__main__":
    simulate(sim, args, frame_update=frame_update)
