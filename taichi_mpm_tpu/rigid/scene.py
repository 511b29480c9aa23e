"""CPIC scene construction: rigid bodies + boundary particles + statics.

The build-time half of the reference's MPM::add_particles(type='rigid')
(/root/reference/src/mpm_rigid_body.cpp:135-271): mesh -> mass/inertia ->
recenter -> boundary-particle sampling, all host-side numpy, producing
one RigidBodies pytree and one CPICScene of static arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

from taichi_mpm_tpu.rigid import mesh as meshlib
from taichi_mpm_tpu.rigid.body import RigidBodies
from taichi_mpm_tpu.utils import pytree_dataclass

MAX_RIGIDS = 12  # int32 tag bits, 2 per rigid (mpm_fwd.h:77-84)


@pytree_dataclass(
    meta_fields=("pos_funcs", "rot_funcs", "articulations", "colliders", "collision")
)
class CPICScene:
    """Static CPIC data: boundary particles (body frame) + scene meta."""

    bp_offset: object  # (B, d) offsets from the body centroid
    bp_normal: object  # (B, d) body-frame normals
    bp_elem: object  # (B, d, d) body-frame element vertices
    bp_rid: object  # (B,) int32
    hull_verts: object  # (R, V, d) body-frame hull vertices per rigid
    pos_funcs: Tuple[Optional[Callable], ...] = ()
    rot_funcs: Tuple[Optional[Callable], ...] = ()
    articulations: Tuple = ()
    colliders: Tuple = ()
    collision: object = None  # CollisionConfig | None


class RigidSceneBuilder:
    """Accumulates rigid bodies; emits (RigidBodies, CPICScene).

    Index 0 is the background body (infinite mass, id 0 in the
    reference, mpm.cpp:72-74) so articulations can link to the world.
    """

    def __init__(self, dim: int, dx: float, rigid_collision: bool = True, rigid_penalty: float = 1e3):
        self.dim = dim
        self.dx = dx
        self.rigid_collision = rigid_collision
        self.rigid_penalty = rigid_penalty
        self.bodies = []
        self.bp = []
        self.meshes = [None]  # body-frame full element soup per rigid
        self.pos_funcs = [None]
        self.rot_funcs = [None]
        self.articulations = []
        # background body
        self.bodies.append(
            dict(
                pos=np.zeros(dim, np.float32),
                vel=np.zeros(dim, np.float32),
                rot=self._rot_identity(),
                omega=self._omega_zero(),
                mass_inv=0.0,
                inertia_inv=self._inertia_zero(),
                friction=(0.0, 0.0),
                restitution=0.0,
                rotation_axis=np.zeros(3, np.float32),
                linear_damping=0.0,
                angular_damping=0.0,
            )
        )

    def _rot_identity(self):
        if self.dim == 2:
            return np.zeros(1, np.float32)
        q = np.zeros(4, np.float32)
        q[0] = 1.0
        return q

    def _omega_zero(self):
        return np.zeros(1 if self.dim == 2 else 3, np.float32)

    def _inertia_zero(self):
        if self.dim == 2:
            return np.zeros(1, np.float32)
        return np.zeros((3, 3), np.float32)

    def add_rigid(
        self,
        mesh: np.ndarray,
        density: float = None,
        codimensional: bool = True,
        scale=None,
        initial_position=None,
        initial_velocity=None,
        initial_rotation=None,
        initial_angular_velocity=None,
        scripted_position: Optional[Callable] = None,
        scripted_rotation: Optional[Callable] = None,
        friction: Optional[float] = None,
        friction0: float = 0.0,
        friction1: float = 0.0,
        restitution: float = 0.0,
        rotation_axis=None,
        linear_damping: float = 0.0,
        angular_damping: float = 0.0,
        recenter: bool = True,
        t0: float = 0.0,
    ) -> int:
        """Returns the rigid id (>= 1). Mirrors create_rigid_body +
        add_rigid_particle defaults (mpm_rigid_body.cpp:58-271):
        codimensional default density 40, solid 400; scripted bodies get
        infinite mass/inertia; mesh recentred to its center of mass."""
        d = self.dim
        rid = len(self.bodies)
        assert rid < MAX_RIGIDS, f"at most {MAX_RIGIDS - 1} rigid bodies"
        elem = np.asarray(mesh, np.float32).copy()
        if scale is not None:
            s = np.asarray(scale, np.float32)
            elem = elem * s
        if density is None:
            density = 40.0 if codimensional else 400.0

        mass, com, inertia = meshlib.mass_properties(elem, density, codimensional)
        if not recenter:
            # keep the mesh frame (requires scripted motion; the body
            # rotates about the mesh origin, mpm_rigid_body.cpp:192-195)
            assert scripted_position is not None, "recenter=False needs scripting"
            com = np.zeros_like(com)
        elem = elem - com  # mesh frame = centroid frame

        # initial transforms
        if scripted_position is not None:
            pos = np.asarray(scripted_position(t0), np.float32)
        else:
            pos = np.asarray(
                initial_position if initial_position is not None else np.zeros(d),
                np.float32,
            )
        if d == 2:
            ang = (
                float(scripted_rotation(t0))
                if scripted_rotation is not None
                else float(initial_rotation or 0.0)
            )
            rot = np.asarray([np.deg2rad(ang)], np.float32)
        else:
            from taichi_mpm_tpu.math.quat import quat_from_euler_xyz
            import jax.numpy as jnp

            euler = (
                np.asarray(scripted_rotation(t0), np.float32)
                if scripted_rotation is not None
                else np.asarray(
                    initial_rotation if initial_rotation is not None else np.zeros(3),
                    np.float32,
                )
            )
            rot = np.asarray(quat_from_euler_xyz(jnp.deg2rad(euler)), np.float32)

        mass_inv = 0.0 if scripted_position is not None else 1.0 / max(mass, 1e-30)
        if scripted_rotation is not None:
            inertia_inv = self._inertia_zero()
        elif d == 2:
            inertia_inv = np.asarray([1.0 / max(inertia, 1e-30)], np.float32)
        else:
            inertia_inv = np.linalg.inv(
                inertia + 1e-12 * np.eye(3)
            ).astype(np.float32)

        if friction is not None:
            friction0 = friction1 = friction

        vel = np.asarray(
            initial_velocity if initial_velocity is not None else np.zeros(d),
            np.float32,
        )
        if initial_angular_velocity is not None:
            omega = np.atleast_1d(np.asarray(initial_angular_velocity, np.float32))
        else:
            omega = self._omega_zero()

        self.bodies.append(
            dict(
                pos=pos,
                vel=vel,
                rot=rot,
                omega=omega,
                mass_inv=mass_inv,
                inertia_inv=inertia_inv,
                friction=(friction0, friction1),
                restitution=restitution,
                rotation_axis=np.asarray(
                    rotation_axis if rotation_axis is not None else np.zeros(3),
                    np.float32,
                ),
                linear_damping=linear_damping,
                angular_damping=angular_damping,
            )
        )
        self.pos_funcs.append(scripted_position)
        self.rot_funcs.append(scripted_rotation)

        # boundary particles in the centroid frame
        self.meshes.append(elem)
        bpos, bnrm, eidx = meshlib.sample_boundary_particles(elem, self.dx)
        self.bp.append(
            dict(
                offset=bpos,
                normal=bnrm,
                elem=elem[eidx],
                rid=np.full(len(bpos), rid, np.int32),
            )
        )
        return rid

    def add_articulation(self, kind: str, obj0: int, obj1: int = 0, **kw):
        from taichi_mpm_tpu.rigid.articulation import build_articulation

        bodies_np = {
            "pos": np.stack([b["pos"] for b in self.bodies]),
            "rot": np.stack([b["rot"] for b in self.bodies]),
        }
        self.articulations.append(
            build_articulation(kind, obj0, obj1, bodies_np, self.dim, **kw)
        )

    @property
    def num(self) -> int:
        return len(self.bodies)

    def build(self, colliders=()) -> Tuple[RigidBodies, CPICScene]:
        import jax.numpy as jnp

        def stack(key):
            return jnp.asarray(np.stack([np.asarray(b[key], np.float32) for b in self.bodies]))

        bodies = RigidBodies(
            pos=stack("pos"),
            vel=stack("vel"),
            rot=stack("rot"),
            omega=stack("omega"),
            mass_inv=jnp.asarray([b["mass_inv"] for b in self.bodies], jnp.float32),
            inertia_inv=stack("inertia_inv"),
            friction=jnp.asarray([b["friction"] for b in self.bodies], jnp.float32),
            restitution=jnp.asarray([b["restitution"] for b in self.bodies], jnp.float32),
            rotation_axis=stack("rotation_axis"),
            linear_damping=jnp.asarray(
                [b["linear_damping"] for b in self.bodies], jnp.float32
            ),
            angular_damping=jnp.asarray(
                [b["angular_damping"] for b in self.bodies], jnp.float32
            ),
        )
        assert self.bp, "no rigid bodies with boundary particles"

        # rigid-rigid collision setup (3D only, like the reference:
        # RigidSolver<2>::detect is TC_NOT_IMPLEMENTED)
        from taichi_mpm_tpu.rigid.collision import (
            CollisionConfig,
            hull_vertices,
        )

        scripted = tuple(
            self.pos_funcs[i] is not None and self.rot_funcs[i] is not None
            for i in range(self.num)
        )
        pairs = []
        if self.dim == 3 and self.rigid_collision:
            for i in range(1, self.num):
                for j in range(i + 1, self.num):
                    if scripted[i] and scripted[j]:
                        continue
                    pairs.append((i, j))
        collision = (
            CollisionConfig(pairs=tuple(pairs), penalty=self.rigid_penalty)
            if pairs
            else None
        )
        elems_per_rigid = [np.zeros((1, self.dim, self.dim), np.float32)] + [
            b["elem"] for b in self.bp
        ]
        hulls = hull_vertices(elems_per_rigid, self.dim)

        scene = CPICScene(
            bp_offset=jnp.asarray(np.concatenate([b["offset"] for b in self.bp])),
            bp_normal=jnp.asarray(np.concatenate([b["normal"] for b in self.bp])),
            bp_elem=jnp.asarray(np.concatenate([b["elem"] for b in self.bp])),
            bp_rid=jnp.asarray(np.concatenate([b["rid"] for b in self.bp])),
            hull_verts=jnp.asarray(hulls),
            pos_funcs=tuple(self.pos_funcs),
            rot_funcs=tuple(self.rot_funcs),
            articulations=tuple(self.articulations),
            colliders=tuple(colliders),
            collision=collision,
        )
        return bodies, scene
