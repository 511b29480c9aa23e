"""Analytic level-set boundaries and the friction projection.

The reference delegates boundary SDFs to taichi's ``DynamicLevelSet``
(sampled per grid node, mpm.cpp:296-372). Here boundaries are a small
library of analytic colliders — pure functions of (position, time) —
applied as a vectorized pass over the whole grid.

Friction encoding follows mpm_fwd.h:26-57 / README.md:326-330:
  mu >= 0  : Coulomb friction coefficient
  mu == -1 : sticky (velocity = boundary velocity)
  mu <= -2 : slip with friction (-mu - 2), normal velocity removed
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def friction_project(velocity, base_velocity, normal, friction):
    """Vectorized port of the reference semantics (mpm_fwd.h:26-57).

    All args broadcast; ``friction`` may be scalar or per-point.
    """
    friction = jnp.asarray(friction, velocity.dtype)
    rel = velocity - base_velocity

    sticky = friction == -1.0
    slip = friction <= -2.0
    mu = jnp.where(slip, -friction - 2.0, friction)

    vn = jnp.sum(normal * rel, -1, keepdims=True)
    vt = rel - vn * normal
    vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
    scale = jnp.maximum(vt_norm + jnp.minimum(vn, 0.0) * mu[..., None], 0.0) / jnp.maximum(
        vt_norm, 1e-30
    )
    keep_normal = jnp.where(slip[..., None], 0.0, jnp.maximum(vn, 0.0))
    projected = scale * vt + keep_normal * normal + base_velocity
    return jnp.where(sticky[..., None], base_velocity, projected)


@dataclasses.dataclass(frozen=True)
class Collider:
    """An analytic SDF boundary.

    sdf(x, t): signed distance, negative inside the obstacle.
    velocity(x, t): boundary velocity field (defaults to static).
    friction: see module docstring.
    """

    sdf: Callable
    friction: float = 0.0
    velocity: Optional[Callable] = None
    # Analytic unit-normal field (x, t) -> (..., d); None = central
    # differences of the SDF (6 extra SDF evaluations).
    normal_fn: Optional[Callable] = None
    # False => the SDF/velocity ignore t, so node fields can be computed
    # once per frame instead of per substep (a DynamicLevelSet that
    # actually moves sets True; mpm.cpp:296-372 samples per substep).
    time_varying: bool = False
    # Nodes with sdf in (band_lo*dx, band_hi*dx] get projected; mirrors the
    # reference's `phi < -3 || 0 < phi -> skip` (mpm.cpp:322-325, grid units).
    band_lo: float = -3.0
    band_hi: float = 0.0

    def normal(self, x, t, eps):
        """Unit outward normal: analytic if provided, else central
        differences of the SDF."""
        if self.normal_fn is not None:
            return self.normal_fn(x, t)
        d = x.shape[-1]
        grads = []
        for k in range(d):
            e = jnp.zeros((d,), x.dtype).at[k].set(eps)
            grads.append((self.sdf(x + e, t) - self.sdf(x - e, t)) / (2 * eps))
        g = jnp.stack(grads, -1)
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

    def boundary_velocity(self, x, t):
        if self.velocity is None:
            return jnp.zeros_like(x)
        return self.velocity(x, t)


# ---------------------------------------------------------------------------
# SDF constructors (physical units; negative inside the obstacle)
# ---------------------------------------------------------------------------


def plane(point, normal_vec, friction=0.0, velocity=None) -> Collider:
    """Half-space obstacle: the region behind the plane (opposite normal)."""
    p = jnp.asarray(point, jnp.float32)
    n = jnp.asarray(normal_vec, jnp.float32)
    n = n / jnp.linalg.norm(n)

    def sdf(x, t):
        return jnp.sum((x - p) * n, -1)

    def normal_fn(x, t):
        return jnp.broadcast_to(n, x.shape)

    return Collider(sdf=sdf, friction=friction, velocity=velocity, normal_fn=normal_fn)


def sphere(center, radius, friction=0.0, inside_out=False, velocity=None) -> Collider:
    c = jnp.asarray(center, jnp.float32)

    def sdf(x, t):
        d = jnp.linalg.norm(x - c, axis=-1) - radius
        return -d if inside_out else d

    def normal_fn(x, t):
        r = x - c
        nrm = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)
        return -nrm if inside_out else nrm

    return Collider(sdf=sdf, friction=friction, velocity=velocity, normal_fn=normal_fn)


def box_domain(lo, hi, friction=0.0, velocity=None) -> Collider:
    """Container: allowed region is the axis-aligned box [lo, hi].

    SDF is the distance *into* the domain from the nearest wall (positive
    inside, negative outside) — the union-of-six-planes levelset every
    reference scene builds first (README.md:324-331).
    """
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)

    def sdf(x, t):
        return jnp.minimum(
            jnp.min(x - lo, axis=-1), jnp.min(hi - x, axis=-1)
        )

    def normal_fn(x, t):
        # inward normal of the nearest wall (one-hot on the argmin face)
        d_lo = x - lo
        d_hi = hi - x
        dist = jnp.concatenate([d_lo, d_hi], -1)
        k = jnp.argmin(dist, -1)
        d = x.shape[-1]
        sign = jnp.where(k < d, 1.0, -1.0)
        axis = jnp.where(k < d, k, k - d)
        return sign[..., None] * jax.nn.one_hot(axis, d, dtype=x.dtype)

    return Collider(sdf=sdf, friction=friction, velocity=velocity, normal_fn=normal_fn)


def cylinder(center, axis: int, radius, friction=0.0, velocity=None) -> Collider:
    """Infinite cylinder obstacle along the given axis."""
    c = jnp.asarray(center, jnp.float32)

    def sdf(x, t):
        d = x.shape[-1]
        idx = tuple(k for k in range(d) if k != axis)
        r = jnp.sqrt(sum((x[..., k] - c[k]) ** 2 for k in idx))
        return r - radius

    return Collider(sdf=sdf, friction=friction, velocity=velocity)


def union(*colliders_same_friction) -> Tuple[Collider, ...]:
    return tuple(colliders_same_friction)


# ---------------------------------------------------------------------------
# Dirichlet regions (apply_dirichlet_boundary_conditions, mpm.cpp:374-412)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DirichletRegion:
    """Pins grid velocity to `velocity` wherever mask(x, t) is True —
    the cleaned-up analog of the reference's hardcoded Dirichlet bands
    (mpm.cpp:374-412: slabs near the left/right walls / y > 0.525)."""

    mask: Callable  # (x (..., d), t) -> bool (...)
    velocity: Tuple[float, ...] = ()

    def apply(self, v, x, t):
        vel = jnp.asarray(
            self.velocity if self.velocity else (0.0,) * v.shape[-1],
            v.dtype,
        )
        return jnp.where(self.mask(x, t)[..., None], vel, v)


def dirichlet_slab(axis: int, lo: float, hi: float, velocity=()) -> DirichletRegion:
    return DirichletRegion(
        mask=lambda x, t: (x[..., axis] >= lo) & (x[..., axis] < hi),
        velocity=tuple(velocity),
    )
