"""Cutting a von Mises banana with a scripted thin cutter
(reference scripts/mls-cpic/banana.py; the banana.obj asset becomes a
procedural ellipsoid, the cutter the same zig-zag scripted plate)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from math import floor

from common import mpm_class, parse_args, simulate

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.rigid.mesh import plate_mesh, sphere_mesh
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=200, res=96)
r = args.res

sim = mpm_class()(res=(r, r, r), base_delta_t=5e-5, frame_dt=0.01, penalty=1e3,
          cfl=0.5, rpic_damping=1.0)
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.42, friction=-1.0))
sim.add_collider(Collider(sdf=lambda x, t: x[..., 0] - 0.16, friction=-1.0))

# the "banana": a squashed ellipsoid of von Mises plastic material
tex = texture.mesh(
    sphere_mesh(1.0, subdiv=2), translate=(0.5, 0.47, 0.5),
    scale=(0.16, 0.05, 0.07),
) * 8
sim.add_particles("von_mises", density=400, density_tex=tex,
                  E=4e5, nu=0.4, yield_stress=5.0)

# zig-zag cutter motion (banana.py:43-66)
length, width = 0.20, 0.03
x_pos, y_pos, z_pos, velo = 0.6, 0.67, 0.5, 0.5
period = (2 * length + 3 * width) / velo


def cutter_pos(t):
    t = float(t) if not hasattr(t, "dtype") else t
    import jax.numpy as jnp

    i = jnp.floor(t / period)
    dis = velo * (t - period * i)
    x0 = x_pos - width * i
    # down -> sideways -> up -> sideways
    seg1 = (x0, y_pos - dis, z_pos)
    seg2 = (x0 + (dis - length), y_pos - length, z_pos)
    seg3 = (x0 + width, y_pos - (2 * length + width - dis), z_pos)
    seg4 = (x0 + width - (dis - (2 * length + width)) * 0.0, y_pos, z_pos)
    px = jnp.where(dis < length, seg1[0],
         jnp.where(dis < length + width, seg2[0],
         jnp.where(dis < 2 * length + width, seg3[0], seg4[0])))
    py = jnp.where(dis < length, seg1[1],
         jnp.where(dis < length + width, seg2[1],
         jnp.where(dis < 2 * length + width, seg3[1], seg4[1])))
    return (px, py, z_pos)


sim.add_particles(
    "rigid", mesh=plate_mesh(half_u=0.1, half_v=0.1, axis=0),
    codimensional=True, friction=-1.0,
    scripted_position=cutter_pos,
    scripted_rotation=lambda t: (0.0, 0.0, 0.0),
)

if __name__ == "__main__":
    simulate(sim, args)
