"""Rigid-rigid collision (sampled-SAT rigidify) + rigid-levelset tests."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from taichi_mpm_tpu.rigid import collision as coll
from taichi_mpm_tpu.rigid.mesh import box_mesh
from taichi_mpm_tpu.rigid.scene import RigidSceneBuilder


def _two_boxes(gap_y: float, v2=(0, -1.0, 0)):
    b = RigidSceneBuilder(3, 1 / 32)
    b.add_rigid(
        box_mesh((0.1, 0.1, 0.1)), codimensional=False, density=1000,
        initial_position=(0.5, 0.5, 0.5),
    )
    b.add_rigid(
        box_mesh((0.1, 0.1, 0.1)), codimensional=False, density=1000,
        initial_position=(0.5, 0.5 + gap_y, 0.5), initial_velocity=v2,
    )
    return b.build()


class TestDetect:
    def test_overlap_depth_normal_point(self):
        bodies, scene = _two_boxes(0.18)  # 0.02 overlap in y
        dirs = jnp.asarray(coll.icosphere_directions())
        hit, depth, normal, point = jax.jit(
            lambda b: coll.detect(b, scene.hull_verts, scene.collision.pairs, dirs)
        )(bodies)
        assert bool(hit[0])
        assert abs(float(depth[0]) - 0.02) < 0.01
        n = np.asarray(normal[0])
        assert n[1] > 0.95  # separation axis = +y (from body1 toward body2)
        p = np.asarray(point[0])
        assert np.allclose(p, [0.5, 0.59, 0.5], atol=0.01)  # overlap center

    def test_separated_no_hit(self):
        bodies, scene = _two_boxes(0.5)
        dirs = jnp.asarray(coll.icosphere_directions())
        hit, depth, _, _ = coll.detect(
            bodies, scene.hull_verts, scene.collision.pairs, dirs
        )
        assert not bool(hit[0])
        assert float(depth[0]) < 0


class TestRigidify:
    def test_head_on_momentum_conserved(self):
        bodies, scene = _two_boxes(0.18)
        dirs = jnp.asarray(coll.icosphere_directions())
        out = jax.jit(
            lambda b: coll.rigidify(b, scene.hull_verts, scene.collision, dirs, 1e-3)
        )(bodies)
        v = np.asarray(out.vel)[1:]
        # equal masses, restitution 0: velocities approach (-0.5, -0.5);
        # momentum conserved exactly
        assert abs(v[:, 1].sum() - (-1.0)) < 1e-5
        assert abs(v[0, 1] - (-0.5)) < 0.1 and abs(v[1, 1] - (-0.5)) < 0.1
        # face-face central contact: no spin
        assert np.abs(np.asarray(out.omega)[1:]).max() < 1e-4

    def test_separated_untouched(self):
        bodies, scene = _two_boxes(0.18)
        dirs = jnp.asarray(coll.icosphere_directions())
        far = dc.replace(bodies, pos=bodies.pos.at[2, 1].set(0.95))
        out = coll.rigidify(far, scene.hull_verts, scene.collision, dirs, 1e-3)
        assert np.allclose(np.asarray(out.vel), np.asarray(far.vel))
        assert np.allclose(np.asarray(out.omega), np.asarray(far.omega))

    def test_scripted_pairs_excluded(self):
        b = RigidSceneBuilder(3, 1 / 32)
        for k in range(2):
            b.add_rigid(
                box_mesh((0.1, 0.1, 0.1)), codimensional=False,
                scripted_position=lambda t: (0.5, 0.5, 0.5),
                scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            )
        _, scene = b.build()
        assert scene.collision is None  # both scripted -> no candidate pairs


class TestRigidLevelset:
    def test_bounce_off_floor(self):
        from taichi_mpm_tpu.core.levelset import Collider
        from taichi_mpm_tpu.rigid.body import boundary_particle_world

        b = RigidSceneBuilder(3, 1 / 32)
        rid = b.add_rigid(
            box_mesh((0.05, 0.05, 0.05)), codimensional=False, density=1000,
            initial_position=(0.5, 0.14, 0.5), initial_velocity=(0, -1.0, 0),
            restitution=0.5, friction=0.0,
        )
        bodies, scene = b.build()
        floor = Collider(sdf=lambda x, t: x[..., 1] - 0.1, friction=0.0)
        xb, _, _ = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal, scene.bp_elem
        )
        out = coll.rigid_levelset_collision(bodies, xb, scene.bp_rid, (floor,), 0.0, 1e-3)
        # box bottom at 0.09 < floor 0.1 -> restitution bounce upward
        assert float(out.vel[rid, 1]) > 0.1
