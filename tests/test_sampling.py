"""Poisson-disk sampling + texture seeding + source emitter tests."""

import numpy as np

from taichi_mpm_tpu.sampling import poisson, texture


class TestTextures:
    def test_sphere_box_ring(self):
        s = texture.sphere((0.5, 0.5, 0.5), 0.1)
        assert s(np.array([[0.5, 0.5, 0.55]]))[0] == 1.0
        assert s(np.array([[0.5, 0.5, 0.65]]))[0] == 0.0
        b = texture.box((0.2, 0.2), (0.4, 0.4)) * 5
        assert b(np.array([[0.3, 0.3]]))[0] == 5.0
        r = texture.ring((0.5, 0.5), 0.05, 0.1, axis=2)
        assert r(np.array([[0.57, 0.5]]))[0] == 1.0
        assert r(np.array([[0.52, 0.5]]))[0] == 0.0

    def test_transforms(self):
        b = texture.box((0.0, 0.0), (0.1, 0.1)).translate((0.5, 0.5))
        assert b(np.array([[0.55, 0.55]]))[0] == 1.0
        assert b(np.array([[0.05, 0.05]]))[0] == 0.0
        bounded = texture.constant(1.0).bound(0, 0.4, 0.6)
        assert bounded(np.array([[0.5, 0.9]]))[0] == 1.0
        assert bounded(np.array([[0.3, 0.9]]))[0] == 0.0

    def test_mesh_texture(self):
        from taichi_mpm_tpu.rigid.mesh import box_mesh

        m = texture.mesh(box_mesh((0.1, 0.1, 0.1)), translate=(0.5, 0.5, 0.5))
        assert m(np.array([[0.5, 0.5, 0.5]]))[0] == 1.0
        assert m(np.array([[0.65, 0.5, 0.5]]))[0] == 0.0


class TestPoisson:
    def test_min_distance_respected(self):
        tex = texture.box((0.3, 0.3), (0.7, 0.7)) * 8
        pts = poisson.sample_from_periodic_data(tex, np.zeros(2), np.ones(2), 1 / 64, 2)
        r = poisson.min_distance_for_ppc(1 / 64, 8.0, 2)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, 1e9)
        assert d2.min() >= (0.999 * r) ** 2

    def test_ppc_calibration(self):
        tex = texture.box((0.25, 0.25), (0.75, 0.75)) * 6
        pts = poisson.sample_from_periodic_data(tex, np.zeros(2), np.ones(2), 1 / 64, 2)
        ppc = len(pts) * (1 / 64) ** 2 / 0.25
        assert abs(ppc - 6.0) / 6.0 < 0.1

    def test_all_inside_density(self):
        tex = texture.sphere((0.5, 0.5, 0.5), 0.08) * 4
        pts = poisson.sample_from_periodic_data(tex, np.zeros(3), np.ones(3), 1 / 32, 3)
        assert len(pts) > 10
        assert np.all(np.linalg.norm(pts - 0.5, axis=1) < 0.08)

    def test_source_emits_disjoint_layers(self):
        tex = texture.ring((0.3, 0.8), 0.0, 0.04) * 8
        adv = np.array([0.0, -0.01])
        p0 = poisson.sample_from_source(tex, np.zeros(2), np.ones(2), 1 / 64, 2, np.zeros(2), adv)
        p1 = poisson.sample_from_source(tex, np.zeros(2), np.ones(2), 1 / 64, 2, adv, adv)
        full = poisson.sample_from_periodic_data(tex, np.zeros(2), np.ones(2), 1 / 64, 2)
        assert 0 < len(p0) < len(full)
        assert 0 < len(p1) < len(full)
        # emitted points are inside the mask and near its outflow edge
        assert np.all(tex(p0) > 0)

    def test_bridson_direct(self):
        pts = poisson.bridson(np.zeros(2), np.ones(2), 0.05)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, 1e9)
        assert d2.min() >= 0.05**2 * 0.999
        assert len(pts) > 200  # reasonably dense


class TestSourceEmissionEndToEnd:
    def test_capacity_emission(self):
        from taichi_mpm_tpu.core.solver import MPM

        sim = MPM(res=(32, 32), base_delta_t=2e-4, frame_dt=2e-3, capacity=2000)
        tex0 = texture.box((0.45, 0.2), (0.55, 0.3)) * 4
        n0 = sim.add_particles("water", density=1000, density_tex=tex0)
        src = texture.ring((0.3, 0.8), 0.0, 0.05) * 4

        def frame_update(s, f):
            s.add_particles(
                "water", density=1000, density_tex=src,
                pd_source=True, vel=(0.0, -0.5), delta_t=s.frame_dt,
            )

        sim.simulate(8, frame_update=frame_update)
        n = int(np.asarray(sim.particles.active).sum())
        assert n > n0  # emission happened
        assert sim.particles.capacity == 2000

    def test_capacity_exhaustion_raises(self):
        from taichi_mpm_tpu.core.solver import MPM

        sim = MPM(res=(32, 32), capacity=16)
        sim.add_particles("water", pos=np.full((10, 2), 0.5), density=1000)
        sim.step()
        import pytest

        with pytest.raises(RuntimeError, match="capacity exhausted"):
            sim.add_particles("water", pos=np.full((10, 2), 0.6), density=1000)


class TestTextureModulatedParams:
    """Per-particle texture-modulated material params (reference
    mpm.cpp:100-109: cohesion_tex/theta_c_tex/theta_s_tex sampled at
    each seed coordinate into the particle's own param set)."""

    def test_param_slot_discovery(self):
        from taichi_mpm_tpu.materials import models as M
        import pytest

        assert M.param_slot("sand", "cohesion") == 3
        assert M.param_slot("snow", "theta_c") == 3
        assert M.param_slot("snow", "theta_s") == 4
        with pytest.raises(ValueError):
            M.param_slot("jelly", "E")  # derived, not verbatim

    def test_cohesion_tex_matches_two_uniform_batches(self):
        """A sand column seeded with a step cohesion_tex must evolve
        identically to the same positions seeded as two uniform-
        cohesion batches (mpm.cpp:100-109)."""
        from taichi_mpm_tpu.core.solver import MPM

        rng = np.random.default_rng(3)
        pos = rng.uniform(0.35, 0.65, size=(160, 3)).astype(np.float32)
        hi = pos[:, 1] > 0.5
        c_lo, c_hi = 0.004, 0.02

        def cohesion_tex(p):
            return np.where(p[:, 1] > 0.5, c_hi, c_lo)

        kw = dict(density=1000, friction_angle=35.0)

        sim_a = MPM(res=(16, 16, 16), base_delta_t=2e-4,
                    gravity=(0, -10.0, 0))
        sim_a.add_particles("sand", pos=pos, cohesion_tex=cohesion_tex,
                            **kw)
        sim_b = MPM(res=(16, 16, 16), base_delta_t=2e-4,
                    gravity=(0, -10.0, 0))
        sim_b.add_particles("sand", pos=pos[~hi], cohesion=c_lo, **kw)
        sim_b.add_particles("sand", pos=pos[hi], cohesion=c_hi, **kw)

        for _ in range(3):
            sim_a.step()
            sim_b.step()

        def sorted_state(sim):
            p = sim.particles
            act = np.asarray(p.active)
            x = np.asarray(p.x)[act]
            v = np.asarray(p.v)[act]
            par = np.asarray(p.params)[act]
            o = np.lexsort((x[:, 2], x[:, 1], x[:, 0]))
            return x[o], v[o], par[o]

        xa, va, pa = sorted_state(sim_a)
        xb, vb, pb = sorted_state(sim_b)
        assert xa.shape == xb.shape
        # the two sims differ in particle insertion order, so P2G
        # accumulation order (and its FP rounding) differs — values
        # agree to accumulation tolerance, not bitwise
        np.testing.assert_allclose(xa, xb, atol=1e-6, rtol=0)
        np.testing.assert_allclose(va, vb, atol=1e-4, rtol=0)
        np.testing.assert_allclose(pa, pb, atol=0)
        # both cohesion values present per the step texture (their
        # side-matching is pinned by pa == pb above: sim_b seeded each
        # side with its uniform value explicitly)
        assert set(np.unique(pa[:, 3]).tolist()) == {
            np.float32(c_lo), np.float32(c_hi)
        }
