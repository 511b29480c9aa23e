"""CPIC rigid-body coupling subsystem (SURVEY.md §2.2).

body: rigid dynamics; mesh: host-side geometry; cdf: grid CDF
rasterize/gather; cpic: colored two-way transfers; articulation:
constraints; scene: build-time assembly.
"""

from taichi_mpm_tpu.rigid.body import RigidBodies  # noqa: F401
from taichi_mpm_tpu.rigid.scene import CPICScene, RigidSceneBuilder  # noqa: F401
