"""Typed, frozen simulation configuration.

Replaces the reference's string-keyed ``Config`` dict (consulted mid-run
with ~50 ad-hoc ``config.get(key, default)`` lookups, see SURVEY.md §5):
everything the compiler must specialize on lives in one hashable frozen
dataclass so it can be a static jit argument. Parameter names and defaults
mirror ``MPM<dim>::initialize`` (/root/reference/src/mpm.cpp:26-75).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SimConfig:
    # Discretization
    res: Tuple[int, ...] = (128, 128, 128)
    dx: float = 0.0  # 0 => auto: 1 / res[0] (reference delta_x convention)
    base_dt: float = 1e-4
    kernel_order: int = 2  # quadratic = the MLS-MPM default (mpm_fwd.h:17)

    # Physics
    gravity: Tuple[float, ...] = (0.0, -10.0, 0.0)
    particle_gravity: bool = False  # add gravity on particles in P2G
    apic: bool = True
    rpic_damping: float = 0.0  # damp symmetric part of B (mpm.h:465-469)
    apic_damping: float = 0.0  # damp skew part of B
    penalty: float = 0.0  # boundary penetration penalty (CPIC)
    pushing_force: float = 20000.0  # CPIC ghost-velocity push (mpm.cpp:37)
    cfl: float = 1.0  # global adaptive dt multiplier (0 => fixed dt)

    # Materials present in the scene (static dispatch set).
    active_materials: Tuple[int, ...] = ()

    # Position clamp epsilon (transfer.cpp:667-670).
    clamp_eps: float = 1e-4

    # Per-particle levelset projection after G2P
    # (particle_collision_resolution, mpm.cpp:414-427).
    particle_collision: bool = False
    # Deactivate particles within 7 cells of the domain boundary each
    # substep (clear_boundary_particles + near_boundary, mpm.cpp:582-633,
    # mpm.h:269-276).
    clean_boundary: bool = False

    # Rigid-body coupling (CPIC) — compiled in only when the scene has rigids.
    num_rigids: int = 0
    # Iterations of the {rigidify, articulate, rasterize} prologue per
    # substep (mpm.cpp:467-471).
    coupling_iterations: int = 1
    # 2D CDF tag dilation passes (rigid_transfer.cpp:79-111).
    cdf_expand: int = 0

    def __post_init__(self):
        if self.dx == 0.0:
            object.__setattr__(self, "dx", 1.0 / self.res[0])

    @property
    def dim(self) -> int:
        return len(self.res)

    @property
    def inv_dx(self) -> float:
        return 1.0 / self.dx

    @property
    def grid_nodes(self) -> Tuple[int, ...]:
        # res+2 nodes per axis: the reference oversizes its sparse grid to a
        # POT >= res+1 (mpm.cpp:50-62); +2 gives the quadratic stencil of a
        # clamped particle (pos_grid <= res - eps) full in-bounds support.
        return tuple(r + 2 for r in self.res)

    def with_materials(self, mats) -> "SimConfig":
        return dataclasses.replace(self, active_materials=tuple(sorted(set(mats))))
