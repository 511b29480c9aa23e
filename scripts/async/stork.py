"""Adaptive-dt stork: zero gravity, a multi-stiffness elastic bird
nodding on a sticky pedestal (reference scripts/async/stork.py — the
$mpm/stork.obj mesh texture is replaced by procedural geometry, like
the rest of this repo's scenes; the four elastic regions keep the
reference's stiffness split E = 4e3 body/neck, 2e4 joint, 4e5 base,
which is what makes the scene CFL-heterogeneous and adaptive-dt
friendly, strength_dt_mul=0.8)."""
import sys, os
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import parse_args, simulate

from taichi_mpm_tpu.core.adaptive import AsyncMPM
from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=120, res=64)
r = args.res

sim = AsyncMPM(res=(r, r, r), base_delta_t=8e-4, frame_dt=0.01,
               unit_delta_t=1e-6, strength_dt_mul=0.8,
               gravity=(0.0, 0.0, 0.0))

# sticky pedestal (reference levelset.add_cuboid((.5,.1,.3),(.7,.35,.7)),
# friction -1)
lo = np.asarray([0.5, 0.1, 0.3])
hi = np.asarray([0.7, 0.35, 0.7])


def _box_sdf(x, t):
    import jax.numpy as jnp

    c = (lo + hi) / 2.0
    h = (hi - lo) / 2.0
    q = jnp.abs(x - c) - h
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


sim.add_collider(Collider(sdf=_box_sdf, friction=-1.0))

# procedural stork: stiff legs rise from the pedestal, a soft body,
# a stiff shoulder joint, and a soft neck+head that nods (initial
# angular-ish velocity on the head region)
legs = texture.box((0.585, 0.32, 0.48), (0.615, 0.5, 0.52)) * 10
body = texture.sphere((0.6, 0.52, 0.5), 0.055) * 10
joint = texture.sphere((0.56, 0.56, 0.5), 0.03) * 10
neck = texture.box((0.47, 0.56, 0.485), (0.56, 0.60, 0.515)) * 10
head = texture.sphere((0.46, 0.62, 0.5), 0.035) * 10

speed = 4.0
sim.add_particles("elastic", density=10, E=4e5, nu=0.3, density_tex=legs)
sim.add_particles("elastic", density=10, E=4e3, nu=0.3, density_tex=body)
sim.add_particles("elastic", density=10, E=2e4, nu=0.3, density_tex=joint)
sim.add_particles("elastic", density=10, E=4e3, nu=0.3, density_tex=neck)
sim.add_particles("elastic", density=10, E=4e3, nu=0.3,
                  vel=(0.0, -0.25 * speed, 0.0), density_tex=head)

if __name__ == "__main__":
    simulate(sim, args)
    print("total particle updates:", sim.update_counter)
