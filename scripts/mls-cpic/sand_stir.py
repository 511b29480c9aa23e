"""A scripted stirring rod dragging through a sand bed (reference
scripts/mls-cpic/sand_stir.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import math

from common import mpm_class, parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import cylinder_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=200, res=64)
r = args.res

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.4))

bed = texture.box((0.2, 0.1, 0.2), (0.8, 0.25, 0.8)) * 4
sim.add_particles("sand", density=2000, friction_angle=35.0, density_tex=bed)


def rod_pos(t):
    import jax.numpy as jnp

    w = 2.0 * math.pi * 0.4
    return (0.5 + 0.18 * jnp.cos(w * t), 0.22, 0.5 + 0.18 * jnp.sin(w * t))


sim.add_particles(
    "rigid", mesh=cylinder_mesh(radius=0.02, half_height=0.12, n=12, axis=1),
    codimensional=True, friction=0.4,
    scripted_position=rod_pos,
    scripted_rotation=lambda t: (0.0, 0.0, 0.0),
)

if __name__ == "__main__":
    simulate(sim, args)
