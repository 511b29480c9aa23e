"""Sand column with texture-modulated per-particle cohesion.

The reference samples cohesion_tex / theta_c_tex / theta_s_tex at each
seed coordinate into that particle's own material params
(/root/reference/src/mpm.cpp:100-109) — the paper's spatially-varying
sand scenes. Here a horizontally-banded cohesion texture makes the
weak layers of a collapsing column shear away while the cohesive bands
hold together.
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from common import parse_args, simulate

import numpy as np

from taichi_mpm_tpu.core.levelset import Collider
from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.sampling import texture

args = parse_args(frames=100, res=64)
r = args.res

sim = MPM(res=(r, r, r), base_delta_t=2e-4, frame_dt=0.01,
          gravity=(0, -9.8, 0))
sim.add_collider(Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.4))

col = texture.box((0.42, 0.1, 0.42), (0.58, 0.55, 0.58)) * 8


def cohesion_tex(p):
    # four horizontal bands alternating loose / strongly cohesive
    band = np.floor((p[..., 1] - 0.1) / 0.1125).astype(np.int32)
    return np.where(band % 2 == 0, 1e-4, 4e-2)


sim.add_particles("sand", density=2000, friction_angle=35.0,
                  density_tex=col, cohesion_tex=cohesion_tex)

if __name__ == "__main__":
    simulate(sim, args)
