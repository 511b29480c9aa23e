"""A scripted blade sweeping a pile of sand sideways (reference
scripts/mls-cpic/sand_sweep.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import mpm_class, parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import plate_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=150, res=64)
r = args.res

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.4))

pile = texture.box((0.4, 0.1, 0.35), (0.6, 0.22, 0.65)) * 4
sim.add_particles("sand", density=2000, friction_angle=35.0, density_tex=pile)


def blade_pos(t):
    import jax.numpy as jnp

    return (0.15 + 0.4 * jnp.minimum(t, 1.2), 0.18, 0.5)


sim.add_particles(
    "rigid", mesh=plate_mesh(half_u=0.08, half_v=0.15, axis=0),
    codimensional=True, friction=0.3,
    scripted_position=blade_pos,
    scripted_rotation=lambda t: (0.0, 0.0, 0.0),
)

if __name__ == "__main__":
    simulate(sim, args)
