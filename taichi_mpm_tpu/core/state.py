"""Simulation state pytrees.

SoA particle arrays with a fixed capacity + validity mask replace the
reference's AoS pool of polymorphic 320-byte particles
(/root/reference/src/particle_allocator.h:32-88): JAX shapes are static,
so deletion (``clear_boundary_particles``) is masking and emission
(sources) fills free slots.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from taichi_mpm_tpu.utils import pytree_dataclass


@pytree_dataclass
class Particles:
    """Structure-of-arrays particle state (capacity P, dimension d).

    C is the APIC affine matrix in the reference's grid-unit convention
    (``apic_b``, transfer.cpp:644): B = sum_i w_i v_i (x_p - x_i)/dx.
    aux is the per-material mutable scalar (snow Jp / water j / sand
    logJp / visco tau). states holds the CPIC affinity bit field
    (2 bits per rigid body, mpm_fwd.h:78-112); zero when no rigids.
    """

    x: jnp.ndarray  # (P, d) positions, physical units
    v: jnp.ndarray  # (P, d) velocities
    F: jnp.ndarray  # (P, d, d) elastic deformation gradient
    C: jnp.ndarray  # (P, d, d) APIC B (grid units)
    aux: jnp.ndarray  # (P,)
    mass: jnp.ndarray  # (P,)
    vol: jnp.ndarray  # (P,)
    mat: jnp.ndarray  # (P,) int32 material id
    params: jnp.ndarray  # (P, 8) material parameters
    active: jnp.ndarray  # (P,) bool
    # CPIC fields (zero/inert when the scene has no rigid bodies):
    states: jnp.ndarray  # (P,) int32 affinity bits, 2 per rigid
    bdist: jnp.ndarray  # (P,) signed boundary distance (world units)
    bnormal: jnp.ndarray  # (P, d) boundary normal
    near_b: jnp.ndarray  # (P,) bool near-boundary flag

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dim(self) -> int:
        return self.x.shape[1]

    def count(self):
        return jnp.sum(self.active.astype(jnp.int32))


def empty_particles(capacity: int, dim: int) -> Particles:
    eye = np.broadcast_to(np.eye(dim, dtype=np.float32), (capacity, dim, dim))
    return Particles(
        x=jnp.zeros((capacity, dim), jnp.float32),
        v=jnp.zeros((capacity, dim), jnp.float32),
        F=jnp.asarray(eye),
        C=jnp.zeros((capacity, dim, dim), jnp.float32),
        aux=jnp.zeros((capacity,), jnp.float32),
        mass=jnp.zeros((capacity,), jnp.float32),
        vol=jnp.zeros((capacity,), jnp.float32),
        mat=jnp.zeros((capacity,), jnp.int32),
        params=jnp.zeros((capacity, 8), jnp.float32),
        active=jnp.zeros((capacity,), bool),
        states=jnp.zeros((capacity,), jnp.int32),
        bdist=jnp.zeros((capacity,), jnp.float32),
        bnormal=jnp.zeros((capacity, dim), jnp.float32),
        near_b=jnp.zeros((capacity,), bool),
    )


def concat_particles(a: Particles, b: Particles) -> Particles:
    import jax

    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], 0), a, b)
