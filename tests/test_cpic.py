"""CPIC rigid-coupling tests: CDF correctness, ghost-velocity separation,
two-way momentum exchange, articulation constraints, cutting affinity.

Mirrors the reference's de-facto validation (scene-level behavior checks;
SURVEY.md §4) plus unit tests the reference lacks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.rigid import cdf
from taichi_mpm_tpu.rigid.body import (
    boundary_particle_world,
    velocity_at,
    apply_impulse_single,
    impulse_contribution,
)
from taichi_mpm_tpu.rigid.mesh import (
    box_mesh,
    polygon_mesh_2d,
    segment_mesh_2d,
    sphere_mesh,
    shell_mass_properties,
    solid_mass_properties,
)
from taichi_mpm_tpu.rigid.scene import RigidSceneBuilder


def _plate_scene(cfg):
    b = RigidSceneBuilder(2, cfg.dx)
    b.add_rigid(
        segment_mesh_2d((-0.3, 0.0), (0.3, 0.0)),
        codimensional=True,
        initial_position=(0.5, 0.5),
    )
    return b.build()


class TestMeshProperties:
    def test_solid_box_inertia(self):
        # box 2a x 2b x 2c, density rho: I_xx = m/3 (b^2 + c^2)
        a, b, c, rho = 0.1, 0.2, 0.3, 700.0
        mass, com, I = solid_mass_properties(box_mesh((a, b, c)), rho)
        vol = 8 * a * b * c
        assert np.isclose(mass, rho * vol, rtol=1e-5)
        assert np.allclose(com, 0, atol=1e-7)
        assert np.isclose(I[0, 0], mass / 3 * (b * b + c * c), rtol=1e-4)
        assert np.isclose(I[1, 1], mass / 3 * (a * a + c * c), rtol=1e-4)
        assert np.isclose(I[2, 2], mass / 3 * (a * a + b * b), rtol=1e-4)

    def test_shell_sphere(self):
        # thin spherical shell: m = rho 4 pi r^2, I = 2/3 m r^2
        r, rho = 0.25, 10.0
        mass, com, I = shell_mass_properties(sphere_mesh(r, subdiv=3), rho)
        assert np.isclose(mass, rho * 4 * np.pi * r * r, rtol=2e-2)
        assert np.allclose(com, 0, atol=1e-6)
        assert np.isclose(I[0, 0], 2 / 3 * mass * r * r, rtol=3e-2)


class TestRigidBodyDynamics:
    def test_velocity_at_and_impulse(self):
        cfg = SimConfig(res=(32, 32, 32))
        b = RigidSceneBuilder(3, cfg.dx)
        rid = b.add_rigid(
            box_mesh((0.1, 0.1, 0.1)),
            codimensional=False,
            density=1000.0,
            initial_position=(0.5, 0.5, 0.5),
        )
        bodies, _ = b.build()
        at = jnp.asarray([0.5, 0.6, 0.5])
        J = jnp.asarray([1e-3, 0.0, 0.0])
        b2 = apply_impulse_single(bodies, rid, J, at)
        # linear momentum: dv = J / m
        m = 1.0 / float(bodies.mass_inv[rid])
        assert np.allclose(np.asarray(b2.vel[rid]), np.asarray(J) / m, rtol=1e-5)
        # angular: impulse at +y offset with +x impulse -> -z torque
        assert float(b2.omega[rid, 2]) < 0
        # velocity field: v(at) > v(com)
        v_at = velocity_at(b2, jnp.asarray(rid), at)
        assert float(v_at[0]) > float(b2.vel[rid, 0])

    def test_impulse_contribution_point_mass(self):
        cfg = SimConfig(res=(16, 16, 16))
        b = RigidSceneBuilder(3, cfg.dx)
        rid = b.add_rigid(
            box_mesh((0.1, 0.1, 0.1)), codimensional=False, density=1000.0,
            initial_position=(0.5, 0.5, 0.5),
        )
        bodies, _ = b.build()
        # at the center of mass K = 1/m exactly
        n = jnp.asarray([1.0, 0.0, 0.0])
        K = impulse_contribution(bodies, jnp.asarray(rid), jnp.zeros(3), n)
        assert np.isclose(float(K), float(bodies.mass_inv[rid]), rtol=1e-6)


class TestCDF:
    def test_rasterize_and_gather_2d_plate(self):
        cfg = SimConfig(res=(32, 32), active_materials=(1,))
        bodies, scene = _plate_scene(cfg)
        xb, _, elemw = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal, scene.bp_elem
        )
        gd, gr, gs = cdf.rasterize_rigid_boundary(xb, elemw, scene.bp_rid, bodies.num, cfg)
        n = cfg.grid_nodes
        grr = np.asarray(gr).reshape(n)
        gdr = np.asarray(gd).reshape(n)
        # nodes on the surface row tagged with rigid id 1, distance ~ 0
        assert grr[16, 16] == 1
        assert gdr[16, 16] < 0.2 * cfg.dx
        # one row away: distance ~ dx
        assert np.isclose(gdr[16, 17], cfg.dx, rtol=1e-3)
        # gather: particles above/below get opposite sign bits and
        # outward normals; far particle untouched
        px = jnp.asarray([[0.5, 0.53], [0.5, 0.47], [0.5, 0.2]])
        st, bd, bn, nb = cdf.gather_cdf(
            px, jnp.zeros(3, jnp.int32), gd, gr, gs, bodies.num, cfg
        )
        st = np.asarray(st)
        assert st[0] != st[1] and st[0] != 0 and st[1] != 0 and st[2] == 0
        assert bool(nb[0]) and bool(nb[1]) and not bool(nb[2])
        bn = np.asarray(bn)
        assert bn[0, 1] > 0.9 and bn[1, 1] < -0.9  # normals point away from plate
        bd = np.asarray(bd)
        assert bd[0] > 0 and bd[1] > 0  # positive = on own side (no penetration)
        assert np.isclose(bd[0], 0.03, atol=0.01)


class TestCPICCoupling:
    def test_particles_rest_on_thin_plate(self):
        sim = MPM(res=(32, 32), base_delta_t=1e-4, frame_dt=2e-3, gravity=(0, -10.0))
        xs = np.linspace(0.4, 0.6, 8)
        ys = np.linspace(0.53, 0.6, 4)
        pos = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        sim.add_particles("jelly", pos=pos, vel=(0.0, -0.5), E=1e4, nu=0.3)
        sim.add_particles(
            "rigid",
            mesh=segment_mesh_2d((-0.3, 0.0), (0.3, 0.0)),
            scripted_position=lambda t: (0.5, 0.5),
            codimensional=True,
            friction=0.0,
        )
        for _ in range(50):
            sim.step()
        x = sim.positions()
        # free fall would be at ~0.43; the plate stops everything
        assert x[:, 1].min() > 0.51
        assert int(np.asarray(sim.particles.active).sum()) == len(pos)

    def test_two_way_momentum_transfer(self):
        sim = MPM(res=(32, 32), base_delta_t=1e-4, frame_dt=2e-3, gravity=(0, 0.0))
        xs = np.linspace(0.2, 0.3, 6)
        ys = np.linspace(0.45, 0.55, 6)
        pos = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        sim.add_particles("jelly", pos=pos, vel=(2.0, 0.0), E=1e4, nu=0.3, density=1000)
        sq = polygon_mesh_2d([[-0.05, -0.1], [0.05, -0.1], [0.05, 0.1], [-0.05, 0.1]])
        rid = sim.add_particles(
            "rigid", mesh=sq, initial_position=(0.55, 0.5),
            codimensional=False, density=500, friction=0.0,
        )
        for _ in range(60):
            sim.step()
        b = sim.bodies
        # the struck body moves right; most x-momentum ends up in it
        assert float(b.vel[rid, 0]) > 0.01
        mom_r = float(b.vel[rid, 0]) / float(b.mass_inv[rid])
        mom_init = float(np.asarray(sim.particles.mass).sum() * 0.0 + pos.shape[0] * 0)
        p = sim.particles
        act = np.asarray(p.active)
        mom_init = np.asarray(p.mass)[act].sum() * 2.0
        assert mom_r > 0.5 * mom_init
        # y stays symmetric
        assert abs(float(b.vel[rid, 1])) < 0.05

    def test_cutting_assigns_two_sides(self):
        """A thin cutter inside a jelly block: particles on the two sides
        acquire opposite affinity bits (the mechanism behind the banana/
        bunny_split cutting scenes)."""
        sim = MPM(res=(32, 32), base_delta_t=1e-4, frame_dt=1e-3, gravity=(0, 0.0))
        xs = np.linspace(0.4, 0.6, 10)
        ys = np.linspace(0.4, 0.6, 10)
        pos = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        sim.add_particles("jelly", pos=pos, E=1e4, nu=0.3)
        sim.add_particles(
            "rigid",
            mesh=segment_mesh_2d((0.0, -0.2), (0.0, 0.2)),  # vertical cutter
            scripted_position=lambda t: (0.5, 0.5),
            codimensional=True,
            friction=-1.0,
        )
        sim.step()
        st = np.asarray(sim.particles.states)
        x = np.asarray(sim.particles.x)
        act = np.asarray(sim.particles.active)
        near = act & (np.abs(x[:, 0] - 0.5) < 0.05)
        sides = set(st[near][st[near] != 0].tolist())
        assert len(sides) == 2  # both colors present

    def test_scripted_wheel_drags_particles(self):
        """A scripted-rotation wheel in 2D spins; nearby resting particles
        acquire tangential velocity through CPIC friction (water_wheel
        mechanism in miniature)."""
        from taichi_mpm_tpu.rigid.mesh import wheel_mesh_2d

        sim = MPM(res=(32, 32), base_delta_t=1e-4, frame_dt=1e-3, gravity=(0, 0.0))
        # ring of particles around the wheel
        ang = np.linspace(0, 2 * np.pi, 60, endpoint=False)
        rad = 0.16
        pos = 0.5 + np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
        sim.add_particles("jelly", pos=pos, E=5e3, nu=0.3)
        sim.add_particles(
            "rigid",
            mesh=wheel_mesh_2d(radius=0.14, n_spokes=6, spoke_width=0.03),
            scripted_position=lambda t: (0.5, 0.5),
            scripted_rotation=lambda t: 360.0 * t,  # degrees
            codimensional=True,
            friction=0.3,
        )
        for _ in range(30):
            sim.step()
        b = sim.bodies
        # scripted rotation must hold exactly
        assert np.isclose(
            float(b.rot[1, 0]), np.deg2rad(360.0 * float(sim.t)), atol=1e-3
        )
        assert int(np.asarray(sim.particles.active).sum()) == len(pos)


class TestArticulations:
    def _two_body_builder(self):
        cfg = SimConfig(res=(32, 32, 32))
        b = RigidSceneBuilder(3, cfg.dx)
        b.add_rigid(
            box_mesh((0.05, 0.05, 0.05)), codimensional=False, density=1000.0,
            initial_position=(0.4, 0.5, 0.5),
        )
        b.add_rigid(
            box_mesh((0.05, 0.05, 0.05)), codimensional=False, density=1000.0,
            initial_position=(0.6, 0.5, 0.5),
        )
        return b

    def test_rotation_articulation_shares_omega(self):
        from taichi_mpm_tpu.rigid.articulation import articulate

        import dataclasses as dc

        b = self._two_body_builder()
        b.add_articulation("rotation", 1, 2)
        bodies, scene = b.build()
        bodies = dc.replace(
            bodies, omega=bodies.omega.at[1].set(jnp.asarray([0.0, 0.0, 2.0]))
        )
        out = articulate(bodies, scene.articulations, 1e-4, iterations=3)
        # equal inertia boxes -> shared omega = mean
        assert np.allclose(np.asarray(out.omega[1]), np.asarray(out.omega[2]), atol=1e-5)
        assert np.isclose(float(out.omega[1, 2]), 1.0, rtol=1e-4)

    def test_distance_articulation_removes_relative_normal_velocity(self):
        from taichi_mpm_tpu.rigid.articulation import articulate
        import dataclasses as dc

        b = self._two_body_builder()
        b.add_articulation("distance", 1, 2)
        bodies, scene = b.build()
        bodies = dc.replace(bodies, vel=bodies.vel.at[1].set(jnp.asarray([1.0, 0.0, 0.0])))
        out = articulate(bodies, scene.articulations, 1e-4, iterations=50)
        # relative velocity along the connecting axis (x) is projected out
        rel = float(out.vel[1, 0] - out.vel[2, 0])
        assert abs(rel) < 1e-3

    def test_stepper_drives_relative_omega(self):
        from taichi_mpm_tpu.rigid.articulation import articulate

        b = self._two_body_builder()
        b.add_articulation(
            "stepper", 1, 2, axis=(0.0, 0.0, 1.0), angular_velocity=5.0, axis_length=0.05
        )
        bodies, scene = b.build()
        out = articulate(bodies, scene.articulations, 1e-4, iterations=50)
        rel = float(out.omega[1, 2] - out.omega[2, 2])
        assert np.isclose(rel, 5.0, rtol=1e-2)


class TestCPICBlocked:
    def test_matches_oracle_cpic(self):
        """The compute-then-correct blocked CPIC path must match the
        oracle colored transfers (particles AND rigid states)."""
        import dataclasses as dc

        import jax

        from taichi_mpm_tpu.ops.blocked import sort_particles
        from taichi_mpm_tpu.rigid.cpic import cpic_substep
        from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_substep
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        rng = np.random.default_rng(3)
        sim = MPM(res=(16, 16, 16), base_delta_t=2e-4, gravity=(0, -10.0, 0),
                  penalty=1e3)
        pos = rng.uniform(0.3, 0.7, size=(200, 3)).astype(np.float32)
        sim.add_particles("jelly", pos=pos, vel=(0, -0.5, 0), E=1e4, nu=0.3,
                          density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.25, half_v=0.25, axis=1),
            scripted_position=lambda t: (0.5, 0.45, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        sim._finalize()
        cfg, scene = sim.cfg, sim.rigid_scene
        p0, _, _ = sort_particles(sim.particles, cfg)
        b0 = sim.bodies
        dt = cfg.base_dt

        p_o, b_o = p0, b0
        p_b, b_b = p0, b0
        t = jnp.float32(0.0)
        for _ in range(4):
            p_o, b_o, _ = cpic_substep(p_o, b_o, t, cfg, scene, dt)
            (p_b, b_b, _), n_act, n_near = cpic_blocked_substep(
                p_b, b_b, t, cfg, scene, dt, K=96, near_budget=256,
                interpret=True,
            )
            assert int(n_near) <= 256 and int(n_act) <= 96
            p_o, _, _ = sort_particles(p_o, cfg)
            p_b, _, _ = sort_particles(p_b, cfg)
            t = t + dt

        np.testing.assert_allclose(np.asarray(p_b.x), np.asarray(p_o.x), atol=5e-6)
        np.testing.assert_allclose(np.asarray(p_b.v), np.asarray(p_o.v), atol=5e-4)
        np.testing.assert_allclose(np.asarray(p_b.F), np.asarray(p_o.F), atol=5e-5)
        np.testing.assert_array_equal(np.asarray(p_b.states), np.asarray(p_o.states))
        np.testing.assert_allclose(
            np.asarray(b_b.omega), np.asarray(b_o.omega), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b_b.vel), np.asarray(b_o.vel), atol=1e-5
        )

    def test_lazy_resort_frame_matches_per_substep_sort(self):
        """cpic_blocked_frame's drift-triggered lazy re-sort must
        reproduce the per-substep-sort trajectory, including the rigid
        body states, when fast drift forces in-scan re-sorts."""
        from taichi_mpm_tpu.rigid.cpic_blocked import (
            cpic_blocked_frame,
            cpic_blocked_substep,
        )
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        rng = np.random.default_rng(7)
        sim = MPM(res=(16, 16, 16), base_delta_t=2e-4, gravity=(0, -10.0, 0),
                  penalty=1e3)
        pos = rng.uniform(0.25, 0.65, size=(200, 3)).astype(np.float32)
        cfg0 = 16.0  # inv_dx
        vdrift = 0.1 / (2e-4 * cfg0)  # ~0.1 cells/substep
        sim.add_particles("jelly", pos=pos, vel=(vdrift, -0.5, 0), E=1e4,
                          nu=0.3, density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.25, half_v=0.25, axis=1),
            scripted_position=lambda t: (0.5, 0.4, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        sim._finalize()
        cfg, scene = sim.cfg, sim.rigid_scene
        dt = cfg.base_dt

        p_ref, b_ref = sim.particles, sim.bodies
        t = jnp.float32(0.0)
        for _ in range(10):
            (p_ref, b_ref, t), _, _ = cpic_blocked_substep(
                p_ref, b_ref, t, cfg, scene, dt, K=96, near_budget=256,
                interpret=True,
            )

        p_l, b_l, t2, n_act, n_near, n_coarse, _, nsorts, _ = cpic_blocked_frame(
            sim.particles, sim.bodies, jnp.float32(0.0), cfg, scene, dt,
            10, 96, 256, interpret=True,
        )
        assert int(nsorts) >= 2  # drift actually triggered re-sorts
        assert int(n_act) <= 96 and int(n_near) <= 256
        a = np.asarray(p_ref.x)[np.asarray(p_ref.active)]
        b = np.asarray(p_l.x)[np.asarray(p_l.active)]
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a, b, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(b_l.vel), np.asarray(b_ref.vel), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b_l.omega), np.asarray(b_ref.omega), atol=1e-5
        )


class TestCouplingKnobs:
    """coupling_iterations + cdf_expand must be REAL effects, not
    silently ignored config keys (VERDICT r1 #5)."""

    def test_cdf_expand_dilates_2d_tags(self):
        import dataclasses as dc

        from taichi_mpm_tpu.config import SimConfig
        from taichi_mpm_tpu.rigid import cdf
        from taichi_mpm_tpu.rigid.mesh import segment_mesh_2d
        from taichi_mpm_tpu.rigid.scene import RigidSceneBuilder

        cfg0 = SimConfig(res=(32, 32), gravity=(0, -10.0))
        b = RigidSceneBuilder(2, cfg0.dx)
        b.add_rigid(
            segment_mesh_2d((0.3, 0.5), (0.7, 0.5)), codimensional=True,
            scripted_position=lambda t: (0.5, 0.5),
            scripted_rotation=lambda t: 0.0,
        )
        bodies, scene = b.build(())
        from taichi_mpm_tpu.rigid.body import boundary_particle_world

        xb, _, elem = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        R = bodies.num  # includes background body 0
        _, _, s0 = cdf.rasterize_rigid_boundary(xb, elem, scene.bp_rid, R, cfg0)
        cfg2 = dc.replace(cfg0, cdf_expand=2)
        _, _, s2 = cdf.rasterize_rigid_boundary(xb, elem, scene.bp_rid, R, cfg2)
        n0 = int((np.asarray(s0) != 0).sum())
        n2 = int((np.asarray(s2) != 0).sum())
        assert n2 > n0  # tags actually dilated
        # every originally tagged node keeps its tags
        assert np.all((np.asarray(s0) & np.asarray(s2)) == np.asarray(s0))
        # dilation reach <= 2 nodes chebyshev (sequential axis passes
        # compose diagonally); manhattan-4 mask covers it
        g0 = (np.asarray(s0) != 0).reshape(cfg0.grid_nodes)
        g2 = (np.asarray(s2) != 0).reshape(cfg0.grid_nodes)
        grown = g0.copy()
        for _ in range(4):
            grown = (
                grown
                | np.roll(grown, 1, 0) | np.roll(grown, -1, 0)
                | np.roll(grown, 1, 1) | np.roll(grown, -1, 1)
            )
        assert np.all(~g2 | grown)

    def test_coupling_iterations_differential(self):
        """Blocked path with coupling_iterations=2 still matches the
        oracle path (both loop the prologue identically)."""
        import dataclasses as dc

        from taichi_mpm_tpu.ops.blocked import sort_particles
        from taichi_mpm_tpu.rigid.cpic import cpic_substep
        from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_substep
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        rng = np.random.default_rng(5)
        sim = MPM(res=(16, 16, 16), base_delta_t=2e-4, gravity=(0, -10.0, 0),
                  penalty=1e3, coupling_iterations=2)
        pos = rng.uniform(0.3, 0.7, size=(150, 3)).astype(np.float32)
        sim.add_particles("jelly", pos=pos, vel=(0, -0.5, 0), E=1e4, nu=0.3,
                          density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.25, half_v=0.25, axis=1),
            initial_position=(0.5, 0.45, 0.5), density=500.0,
            codimensional=True, friction=0.2,
        )
        sim._finalize()
        assert sim.cfg.coupling_iterations == 2
        cfg, scene = sim.cfg, sim.rigid_scene
        p0, _, _ = sort_particles(sim.particles, cfg)
        b0 = sim.bodies
        dt = cfg.base_dt
        t = jnp.float32(0.0)
        p_o, b_o, _ = cpic_substep(p0, b0, t, cfg, scene, dt)
        (p_b, b_b, _), _, _ = cpic_blocked_substep(
            p0, b0, t, cfg, scene, dt, K=96, near_budget=256, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(p_b.x), np.asarray(p_o.x), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(b_b.vel), np.asarray(b_o.vel), atol=1e-5
        )


class TestSharedSortCompaction:
    def test_ranges_match_argsort_compaction(self):
        """The shared-sort (range-based) near-rigid compaction must
        select the same particle SET as the argsort formulation
        (VERDICT r1 #6); both feed identical downstream corrections."""
        from taichi_mpm_tpu.ops.blocked import sort_particles
        from taichi_mpm_tpu.ops.substep import build_page_map_full
        from taichi_mpm_tpu.rigid.body import boundary_particle_world
        from taichi_mpm_tpu.rigid import cdf
        from taichi_mpm_tpu.rigid.cpic_blocked import (
            compact_near_rigid,
            compact_near_rigid_ranges,
        )
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        rng = np.random.default_rng(7)
        sim = MPM(res=(32, 32, 32), base_delta_t=2e-4, gravity=(0, -10.0, 0))
        pos = rng.uniform(0.2, 0.8, size=(800, 3)).astype(np.float32)
        sim.add_particles("jelly", pos=pos, E=1e4, nu=0.3, density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.2, half_v=0.2, axis=1),
            scripted_position=lambda t: (0.5, 0.5, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        sim._finalize()
        cfg, scene, bodies = sim.cfg, sim.rigid_scene, sim.bodies
        p, keys, _ = sort_particles(sim.particles, cfg)
        pm = build_page_map_full(keys, cfg, 512)
        xb, _, elem = boundary_particle_world(
            bodies, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        _, _, grid_states = cdf.rasterize_rigid_boundary(
            xb, elem, scene.bp_rid, bodies.num, cfg
        )
        budget, b1 = 512, 1024
        i1, v1, n1, c1 = compact_near_rigid(p, grid_states, cfg, budget, b1)
        ncdf = cdf.DenseNodeCDF(jnp.zeros_like(grid_states, jnp.float32),
                                jnp.full_like(grid_states, -1), grid_states, cfg)
        i2, v2, n2, c2 = compact_near_rigid_ranges(
            p, keys, pm, ncdf, cfg, budget, b1
        )
        assert int(n1) == int(n2)
        assert int(n1) > 0
        s1 = set(np.asarray(i1)[np.asarray(v1)].tolist())
        s2 = set(np.asarray(i2)[np.asarray(v2)].tolist())
        assert s1 == s2
        # coarse counts may differ (different supersets) but both bound
        # the exact set
        assert int(c2) >= int(n2)


class TestRecordSparseCDF:
    def test_record_cdf_matches_dense(self):
        """Kr>0 (record-sparse CDF, VERDICT r1 #4) must reproduce the
        dense-CDF blocked substep exactly — no (prod grid_nodes,) array
        remains in the 3D CPIC hot path."""
        from taichi_mpm_tpu.ops.blocked import sort_particles
        from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_substep
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        rng = np.random.default_rng(9)
        sim = MPM(res=(32, 32, 32), base_delta_t=2e-4, gravity=(0, -10.0, 0),
                  penalty=1e3)
        pos = rng.uniform(0.25, 0.75, size=(400, 3)).astype(np.float32)
        sim.add_particles("jelly", pos=pos, vel=(0, -0.8, 0), E=1e4, nu=0.3,
                          density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.22, half_v=0.22, axis=1),
            scripted_position=lambda t: (0.5, 0.42, 0.5),
            scripted_rotation=lambda t: (0.2 * t, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        sim._finalize()
        cfg, scene, b0 = sim.cfg, sim.rigid_scene, sim.bodies
        p0, _, _ = sort_particles(sim.particles, cfg)
        dt = cfg.base_dt

        pd, bd = p0, b0
        pr, br = p0, b0
        t = jnp.float32(0.0)
        for _ in range(3):
            (pd, bd, _), _, _ = cpic_blocked_substep(
                pd, bd, t, cfg, scene, dt, K=512, near_budget=512, b1=1024,
                Kr=0, interpret=True,
            )
            (pr, br, _), _, _ = cpic_blocked_substep(
                pr, br, t, cfg, scene, dt, K=512, near_budget=512, b1=1024,
                Kr=256, interpret=True,
            )
            from taichi_mpm_tpu.ops.blocked import sort_particles as sp

            pd, _, _ = sp(pd, cfg)
            pr, _, _ = sp(pr, cfg)
            t = t + dt
        np.testing.assert_array_equal(np.asarray(pr.x), np.asarray(pd.x))
        np.testing.assert_array_equal(
            np.asarray(pr.states), np.asarray(pd.states)
        )
        np.testing.assert_array_equal(
            np.asarray(br.vel), np.asarray(bd.vel)
        )
